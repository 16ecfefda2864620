"""Multi-host initialization.

The reference carries torch.distributed-style flags that are never used
(``--dist-num/--dist-rank/--master-addr/--master-port``, opts.py:22-25 —
SURVEY.md §2.3 "flags only"). Here the same flags actually drive
``jax.distributed.initialize`` for pod-slice runs, and the mesh helpers
consume the resulting global device set.

Single-host (the common case, and this container) is a no-op: ``initialize``
is skipped when world size is 1, and ``make_global_mesh`` falls back to
local devices.
"""

from __future__ import annotations

from typing import Optional

import jax

from shapley_vit_tpu.config import DistConfig
from shapley_vit_tpu.parallel.mesh import make_mesh

_initialized = False


def initialize_from_config(dist: DistConfig, num_processes: Optional[int] = None) -> bool:
    """Bring up jax.distributed from the reference flag surface.

    ``dist_num`` doubles as the process count for pod runs (the reference
    used it as the party count; cross-silo parties and hosts coincide in its
    deployment). Returns True if distributed init ran."""
    global _initialized
    world = num_processes if num_processes is not None else dist.dist_num
    if world <= 1 or _initialized:
        return False
    jax.distributed.initialize(
        coordinator_address=f"{dist.master_addr}:{dist.master_port}",
        num_processes=world,
        process_id=dist.dist_rank,
    )
    _initialized = True
    return True


def make_global_mesh(dist: DistConfig, n_coalition: int = 1):
    """(coalition, data) mesh over the global device set (all hosts after
    ``initialize_from_config``; local devices otherwise). Shardings laid out
    so the batch-reduction psum rides ICI within a slice."""
    return make_mesh(n_coalition=n_coalition, devices=jax.devices())


def process_info() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
