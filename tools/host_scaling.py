"""Host-side estimator scaling probe — no accelerator needed.

Benchmark config 8 measured the LIVE large-n frontier (ViT-B on TPU,
n<=32: host share 4.1-4.3%). This tool isolates the host half at larger
n by swapping the TPU evaluator for a closed-form vectorized game
(u = ratio-weighted coalition sum + a curvature term), so it measures
everything the estimator does per round EXCEPT the accelerator evals:
permutation sampling, memo-dict traffic, batched precompute assembly,
and the vectorized comp-contrib scoring.

Usage: python tools/host_scaling.py  (host-only; prints one table row per n)

Interpretation: the host seconds here are what a round at that n must
hide under its TPU eval wall. Config 8's eval wall at n=32 was ~240 s
(1600 samples -> 3200 coalition evals at ~13 evals/s int8); host share
stays <10% as long as the row's total is under ~a tenth of that scaled
wall at the same m=50n budget.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shapley_vit_tpu.shapley import Game  # noqa: E402
from shapley_vit_tpu.shapley.estimators import (  # noqa: E402
    shapley_comp_contrib,
    shapley_monte_carlo,
)


def make_game(n: int, utility_dim: int = 2) -> Game:
    w = np.linspace(0.5, 1.5, n)

    def eval_fn(W: np.ndarray) -> np.ndarray:
        # closed-form "model": weighted membership sum + sqrt curvature,
        # one column per utility dim — all-numpy, effectively free, so the
        # probe isolates estimator host work
        base = W @ w
        out = np.stack([base, np.sqrt(1.0 + base)], axis=1)
        return out[:, :utility_dim]

    return Game(
        eval_coalitions_fn=eval_fn,
        num_local_data=[1.0] * n,
        client_selection_vector=[True] * n,
        previous_utility=[0.0] * utility_dim,
        utility_dim=utility_dim,
        n_all=n,
    )


def main():
    rows = []
    for n in (8, 16, 32, 64, 128):
        m = 50 * n
        game = make_game(n)
        rng = np.random.default_rng(0)
        t0 = time.time()
        sv, se = shapley_comp_contrib(game, m=m, rng=rng, return_se=True)
        cc_s = time.time() - t0

        game2 = make_game(n)
        rng = np.random.default_rng(0)
        t0 = time.time()
        shapley_monte_carlo(game2, m=max(1, m // n), rng=rng, return_se=True)
        mc_s = time.time() - t0

        evals = game.num_evaluations
        rows.append((n, m, cc_s, evals, mc_s))
        print(
            f"n={n:4d} m={m:5d}: comp_contrib host {cc_s:7.2f} s "
            f"({evals} distinct evals memoized), perm-MC host {mc_s:7.2f} s",
            flush=True,
        )
    print()
    print("| n | m=50n | comp-contrib host s | distinct evals | perm-MC host s |")
    print("|---|---|---|---|---|")
    for n, m, cc_s, evals, mc_s in rows:
        print(f"| {n} | {m} | {cc_s:.2f} | {evals} | {mc_s:.2f} |")


if __name__ == "__main__":
    main()
