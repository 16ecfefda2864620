"""Multi-round FL orchestration with per-round Shapley valuation.

The reference's live path runs ONE Shapley round against externally-trained
checkpoints (start.py); its multi-round machinery (per-round deltas +
selection matrix + lazy reconstruction, utils_fed_shapley.py; round
selection under budget, milp.py; round-wise estimators, compared_methods.py)
is present but never wired to a driver. This module wires the full stack
in-process:

  round loop:  clients train locally (vmapped multi-client LoRA step,
               optional label-flip poisoning / DP) → server FedAvg → new
               global overlay → per-round client deltas recorded
  valuation:   MILP selects which rounds get Shapley under a budget; each
               selected round runs the configured estimator over a Game
               backed by ONE batched coalition evaluation; the lazy
               multi-round utilities come from the stacked round×client
               delta axis (shapley/fed_shapley.py).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from shapley_vit_tpu.ops import tree_math as tm
from shapley_vit_tpu.shapley import (
    Game,
    MILP_Shapley,
    call_shapley_computation_method,
    shapley_exact,
)
from shapley_vit_tpu.shapley.compared_methods import GTG, MR, TMR
from shapley_vit_tpu.utils.logging import get_logger

PyTree = object


@dataclasses.dataclass
class RoundRecord:
    """Per-round artifacts: deltas (vs. that round's starting overlay),
    participation, utilities."""

    deltas: List[Optional[PyTree]]
    selection: List[bool]
    global_overlay: PyTree
    utility: List[float]             # [acc, loss] of the post-agg global
    shapley: Optional[List[Dict[int, float]]] = None


def run_federated_rounds(
    *,
    num_rounds: int,
    clients_data: Sequence,                       # per-client (images, labels) tuples
    init_overlay: PyTree,
    train_client_fn: Callable,                    # (cid, overlay, data, round) -> new overlay
    evaluate_fn: Callable,                        # (overlay) -> [acc, loss]
    eval_coalitions_fn_factory: Callable,         # (init_overlay, stacked_deltas) -> W -> [C,2]
    num_local_data: Sequence[float],
    participation: Optional[np.ndarray] = None,   # [T, n] bool; default all
    estimator: str = "comp_contrib",
    shapley_budget: Optional[int] = None,         # k_max rounds get Shapley (MILP)
    utility_dim: int = 2,
    seed: int = 0,
    cc_stratify: str = "uniform",
    logger=None,
) -> List[RoundRecord]:
    """Run T federated rounds; Shapley-value the selected ones.

    ``estimator``: comp_contrib (live-path default) | exact | gtg | mr | tmr.
    ``cc_stratify``: comp-contrib split-point allocation
    (``cfg.shapley.cc_stratify``; see shapley/estimators.py).
    """
    logger = logger or get_logger()
    n = len(clients_data)
    rng = np.random.default_rng(seed)
    if participation is None:
        participation = np.ones((num_rounds, n), dtype=bool)

    records: List[RoundRecord] = []
    overlay = init_overlay

    # ---- FL rounds -------------------------------------------------------
    for t in range(num_rounds):
        deltas: List[Optional[PyTree]] = []
        for cid in range(n):
            if not participation[t][cid]:
                deltas.append(None)
                continue
            new_overlay = train_client_fn(cid, overlay, clients_data[cid], t)
            deltas.append(tm.tree_sub(new_overlay, overlay))
        members = [i for i in range(n) if deltas[i] is not None]
        ratio = tm.fedavg_ratio([num_local_data[i] for i in members])
        agg = tm.aggregate_deltas(tm.tree_stack([deltas[i] for i in members]), ratio)
        overlay = tm.apply_deltas(overlay, agg)
        utility = list(evaluate_fn(overlay))
        logger.info(f"round {t}: participants={members} utility={utility}")
        records.append(
            RoundRecord(
                deltas=deltas,
                selection=[deltas[i] is not None for i in range(n)],
                global_overlay=overlay,
                utility=utility,
            )
        )

    # ---- which rounds get Shapley (MILP under budget) --------------------
    sel_matrix = np.array([r.selection for r in records], dtype=float)
    if shapley_budget is not None and shapley_budget < num_rounds:
        ok, _, x = MILP_Shapley(sel_matrix, max_shapley_computation=shapley_budget).solve()
        chosen = np.nonzero(np.round(x).astype(int))[0] if ok else np.arange(num_rounds)
    else:
        chosen = np.arange(num_rounds)
    logger.info(f"Shapley rounds selected: {chosen.tolist()}")

    # ---- per-round valuation --------------------------------------------
    for t in chosen:
        rec = records[t]
        start_overlay = init_overlay if t == 0 else records[t - 1].global_overlay
        prev_utility = (
            list(evaluate_fn(start_overlay)) if t == 0 else records[t - 1].utility
        )
        stacked = tm.tree_stack([
            d if d is not None else tm.tree_zeros_like(init_overlay)
            for d in rec.deltas
        ])
        eval_fn = eval_coalitions_fn_factory(start_overlay, stacked)
        game = Game(
            eval_coalitions_fn=eval_fn,
            num_local_data=num_local_data,
            client_selection_vector=rec.selection,
            previous_utility=prev_utility,
            utility_dim=utility_dim,
            n_all=n,
        )
        if estimator == "comp_contrib":
            sv = call_shapley_computation_method(
                {},
                game,
                logger,
                rng=np.random.default_rng(seed + 1000 + t),
                stratify=cc_stratify,
            )
        elif estimator == "exact":
            sv = shapley_exact(game)
        elif estimator in ("gtg", "mr", "tmr"):
            cls = {"gtg": GTG, "mr": MR, "tmr": TMR}[estimator]
            sv = []
            for dim in range(utility_dim):
                est = (
                    cls(dim, rng=np.random.default_rng(seed + 2000 + t))
                    if estimator == "gtg" else cls(dim)
                )
                sv.append(est.compute_shapley_value(game, t))
        else:
            raise ValueError(f"unknown estimator {estimator!r}")
        rec.shapley = sv
        logger.info(f"round {t} Shapley: {sv}")

    return records
