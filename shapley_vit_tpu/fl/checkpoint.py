"""Checkpoint / resume subsystem.

Reference behavior (SURVEY.md §5): inbound client checkpoints are torch
``.pth.tar`` files (handled by fl/ingestion.py); outbound is cent_sgd's
best-acc ``checkpoint.pt`` and learning curves; there is NO mid-Shapley
resume — the utility memo (game2.py:32-34) is RAM-only.

This module adds what the reference lacks:
  * orbax-backed save/restore of arbitrary pytrees (server state, training
    state) with atomic directory semantics;
  * a persisted, resumable coalition-utility table: a Shapley round can be
    killed and restarted without re-evaluating finished coalitions.
"""

from __future__ import annotations

import os
from typing import Any, Dict, FrozenSet, List, Optional

import numpy as np

PyTree = Any


# ---------------------------------------------------------------------------
# orbax pytree checkpoints
# ---------------------------------------------------------------------------

def save_pytree(path: str, tree: PyTree) -> None:
    """Atomic orbax save (overwrites an existing checkpoint)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)


def load_pytree(path: str, like: Optional[PyTree] = None) -> PyTree:
    """Restore a pytree; ``like`` provides structure/dtype/sharding targets."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        if like is not None:
            import jax

            targets = jax.tree.map(ocp.utils.to_shape_dtype_struct, like)
            return ckptr.restore(path, item=targets)
        return ckptr.restore(path)


# ---------------------------------------------------------------------------
# resumable utility table
# ---------------------------------------------------------------------------

def _key_to_str(key: FrozenSet[int]) -> str:
    return ",".join(map(str, sorted(key)))


def _str_to_key(s: str) -> FrozenSet[int]:
    return frozenset(int(t) for t in s.split(",") if t != "")


def save_utility_table(path: str, utility: Dict[FrozenSet[int], List[float]]) -> None:
    """Persist a Game's memo table with the atomic-rename protocol."""
    from shapley_vit_tpu.fl.ingestion import atomic_save_npz

    if not utility:
        return
    atomic_save_npz(path, {_key_to_str(k): np.asarray(v) for k, v in utility.items()})


def load_utility_table(path: str) -> Dict[FrozenSet[int], List[float]]:
    """Load a persisted table (empty dict if the file doesn't exist)."""
    if not os.path.exists(path):
        return {}
    out: Dict[FrozenSet[int], List[float]] = {}
    with np.load(path) as z:
        for name in z.files:
            out[_str_to_key(name)] = [float(v) for v in z[name]]
    return out


def resume_game(game, path: str) -> int:
    """Seed a Game's memo from a persisted table; returns #coalitions
    restored. Restored utilities are already previous-utility deltas, so
    they're injected directly into the memo (no re-evaluation)."""
    table = load_utility_table(path)
    for key, vals in table.items():
        if key not in game.utility:
            game.utility[key] = list(vals)
    return len(table)


def checkpointed_game(game, path: str, every: int = 1):
    """Wrap a Game so its memo persists after each ``precompute`` batch —
    mid-round crash recovery for long Monte-Carlo estimations."""
    orig_precompute = game.precompute
    counter = {"n": 0}

    def precompute(coalitions):
        orig_precompute(coalitions)
        counter["n"] += 1
        if counter["n"] % every == 0:
            save_utility_table(path, game.utility)

    game.precompute = precompute
    return game
