"""Client records.

``EvalClient`` is the stateless eval-side record (reference
``client2.py:7-42`` ClientBase: id, train set handle, ``num_local_data_train``
driving FedAvg weights). The full training client lives in
``fl/training.py`` (reference client.py v1 with the label-flip fixture).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

PyTree = Any


@dataclass
class EvalClient:
    """Eval-only client (reference client2.py ClientBase).

    ``num_local_data_train`` drives the FedAvg ratio (server2.py:68-81);
    ``delta`` is this client's weight delta vs. the initial global model
    (start.py:163 via get_difference_between_network_weights) as a pytree.
    """

    client_id: int
    num_local_data_train: int
    delta: Optional[PyTree] = None
    train_set: Any = None
    metadata: dict = field(default_factory=dict)

    @property
    def model_weights(self) -> Optional[PyTree]:
        """Functional stand-in for client2.py's deepcopy property — pytrees
        are immutable, so no copy is needed."""
        return self.delta

    def sync_with_server(self, server) -> PyTree:
        """Return the server's current global params (client2.py:38-42's
        ``sync_with_server`` without the in-place load)."""
        return server.global_params
