"""Device-mesh construction and sharding helpers.

The workload's scale axes (SURVEY.md §2.3) are the *coalition* axis (up to
2^N stacked model variants) and the *data* axis (validation batch). The mesh
is therefore 2-D ``(coalition, data)``:

  * stacked LoRA/delta trees shard their leading axis over ``coalition``;
  * image/label batches shard their leading axis over ``data``;
  * the frozen ViT base is replicated (it is read-only and shared by every
    coalition — replicating it trades HBM for zero resharding traffic, the
    right call at 86M params × bf16 on v5e's 16GB).

XLA inserts the collectives: per-coalition correct/loss accumulators are
reductions over the sharded batch dim, which lower to ``psum`` over ``data``
riding ICI. The reference's ``nn.DataParallel(model, device_ids=[0,1])``
(start.py:283) corresponds to ``data``-only sharding; its inert
``--dist-num/--dist-rank`` flags (opts.py:22-25) map to
``jax.distributed.initialize`` for multi-host pods.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PyTree = Any

COALITION_AXIS = "coalition"
DATA_AXIS = "data"


def make_mesh(
    n_coalition: int = 1,
    n_data: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ``(coalition, data)`` mesh over the available devices.

    ``n_data`` defaults to ``len(devices) // n_coalition``. On a single chip
    this degenerates to a 1×1 mesh and all shardings become no-ops, so the
    same code path runs everywhere.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        if len(devices) % n_coalition:
            raise ValueError(
                f"{len(devices)} devices not divisible by coalition axis {n_coalition}"
            )
        n_data = len(devices) // n_coalition
    if n_coalition * n_data > len(devices):
        raise ValueError(
            f"mesh {n_coalition}x{n_data} needs more than {len(devices)} devices"
        )
    grid = np.asarray(devices[: n_coalition * n_data]).reshape(n_coalition, n_data)
    return Mesh(grid, (COALITION_AXIS, DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh) -> NamedSharding:
    """Leading batch dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_coalitions(mesh: Mesh) -> NamedSharding:
    """Leading coalition dim over the coalition axis."""
    return NamedSharding(mesh, P(COALITION_AXIS))


def put_batch(mesh: Mesh, images, labels):
    """Device-put a validation batch sharded over the data axis (one upload;
    reused for every coalition and round)."""
    s = shard_batch(mesh)
    return jax.device_put(images, s), jax.device_put(labels, s)


def put_replicated(mesh: Mesh, tree: PyTree) -> PyTree:
    s = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def put_coalition_stacked(mesh: Mesh, tree: PyTree) -> PyTree:
    s = shard_coalitions(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)
