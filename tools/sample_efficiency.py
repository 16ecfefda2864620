"""Sample-efficiency measurement for the Monte-Carlo Shapley estimators.

Pure-host (TabularGame, no model evals, no TPU): for each estimator variant
measure SV RMSE vs exact across seeds at a fixed sample budget, alongside the
distinct-coalition eval count — the quantity that costs validation passes in
production. Variance reduction here multiplies the (already compute-bound)
TPU eval throughput: fewer evals for the same SV accuracy.

Game families probe the structures FL utilities can take: additive with
idiosyncratic per-coalition noise, submodular (diminishing returns — the
typical accuracy-vs-coalition-size shape), supermodular, and a
threshold/voting blend (the adversarial case for antithetic pairing).

Usage: python tools/sample_efficiency.py [--n 8] [--m 400] [--seeds 80]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from itertools import combinations

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shapley_vit_tpu.shapley import compared_methods as cm  # noqa: E402
from shapley_vit_tpu.shapley import estimators as est  # noqa: E402
from shapley_vit_tpu.shapley.game import TabularGame  # noqa: E402


def fed_sv_estimand(table, n, utility_index=0):
    """Fed-SV's OWN estimand: the LP projection of the CONVERGED group-
    testing UD. The sampling distribution is exactly compute_shapley_value's
    (length k ~ p, subset uniform given length); a_i = E[mem_i·u] enumerates
    in closed form, UD∞_ij = Z·(a_i − a_j). Coverage of the bootstrap SE is
    judged against THIS (Fed-SV is a Shapley approximation — comparing to
    the exact SV would conflate method bias with sampling error)."""
    from itertools import combinations as _comb

    g = TabularGame(table, n)
    Z = 2 * sum(1 / k for k in range(1, n))
    p = np.array([n / (i * (n - i) * Z) for i in range(1, n)])
    p = p / p.sum()
    a = np.zeros(n)
    for length in range(1, n):
        w = p[length - 1] / cm.comb(n, length)
        for S in _comb(range(n), length):
            u = g.eval_utility(S)[utility_index]
            for i in S:
                a[i] += w * u
    u_N = g.eval_utility(tuple(range(n)))[utility_index]
    UD = (Z * (a[:, None] - a[None, :])).astype(np.float32)
    return cm.Fed_SV.solve_feasible(n, float(u_N), UD), float(u_N)


def build_table(kind: str, n: int, seed: int):
    rng = np.random.default_rng(seed)
    w = rng.uniform(0.5, 2.0, n)
    v = rng.normal(0, 0.1, (n, 2))
    quota = w.sum() * 0.5
    table = {}
    for r in range(1, n + 1):
        for c in combinations(range(n), r):
            lc = list(c)
            s = w[lc].sum()
            if kind == "vote":
                u = v[lc].sum(0) + (1.0 if s > quota else 0.0) * np.array([1.0, 0.5])
            elif kind == "supermod":
                u = np.array([s**2, 0.5 * s**2]) / w.sum() ** 2
            elif kind == "submod":
                u = np.array([np.sqrt(s), 0.3 * np.sqrt(s)])
            elif kind == "noisy_add":
                u = v[lc].sum(0) + np.random.default_rng(hash(c) % 2**32).normal(0, 0.05, 2)
            else:
                raise ValueError(kind)
            table[frozenset(c)] = u
    return table


def exact_sv(table, n):
    g = TabularGame(table, n)
    sv = est.shapley_exact(g)
    return np.array([[sv[d][i] for i in range(n)] for d in range(g.utility_dim)])


def run_variant(table, n, m, seeds, fn):
    errs, evals = [], []
    ex = exact_sv(table, n)
    for s in range(seeds):
        g = TabularGame(table, n)
        sv = fn(g, np.random.default_rng(s))
        a = np.array([[sv[d][i] for i in range(n)] for d in range(g.utility_dim)])
        errs.append(float(((a - ex) ** 2).mean()))
        evals.append(g.num_evaluations)
    return float(np.sqrt(np.mean(errs))), float(np.mean(evals))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--m", type=int, default=None, help="sample budget (default 50n)")
    ap.add_argument("--seeds", type=int, default=80)
    args = ap.parse_args()
    n = args.n
    m = args.m or 50 * n

    variants = {
        "cc_uniform": lambda g, r: est.shapley_comp_contrib(g, m, rng=r),
        "cc_balanced": lambda g, r: est.shapley_comp_contrib(g, m, rng=r, stratify="balanced"),
        "cc_neyman": lambda g, r: est.shapley_comp_contrib(g, m, rng=r, stratify="neyman"),
        "mc_plain": lambda g, r: est.shapley_monte_carlo(g, m // n * 2, rng=r),
        "mc_antithetic": lambda g, r: est.shapley_monte_carlo(
            g, m // n * 2, rng=r, antithetic=True
        ),
        # eval-budget-matched: each cc sample costs 2 evals, each owen draw
        # n+1 — draws = 2m/(n+1) submits the same raw eval count
        "owen": lambda g, r: est.shapley_owen(
            g, q_num=8, m_per_q=max(1, round(2 * m / (n + 1) / 8)), rng=r
        ),
        # kernel draws cost <= 1 eval each; 2m draws matches cc's raw budget
        "kernel": lambda g, r: est.shapley_kernel(g, m=2 * m, rng=r),
    }

    results = {}
    for kind in ["noisy_add", "submod", "supermod", "vote"]:
        table = build_table(kind, n, 0)
        results[kind] = {}
        base = {}
        for name, fn in variants.items():
            rmse, evals = run_variant(table, n, m, args.seeds, fn)
            results[kind][name] = {"rmse": round(rmse, 6), "evals": round(evals, 1)}
            fam = name.split("_")[0]
            if name in ("cc_uniform", "mc_plain") or fam not in base:
                base[fam] = rmse
            rel = rmse / base[fam]
            print(
                f"{kind:10s} {name:14s} rmse={rmse:.5f} ({rel:4.2f}x of {fam} baseline) "
                f"distinct-evals={evals:.0f}"
            )
        # ±2σ coverage of the analytic SEs (the whisker contract of
        # driver/report.plot_shapley_bar): fraction of (dim, client) cells
        # where |sv − exact| <= 2·se — near-nominal (~95%) means the
        # whiskers are honest for that estimator/game pairing
        ex = exact_sv(table, n)
        # semivalue ground truths: each MC semivalue's coverage is judged
        # against ITS OWN enumerated estimand (Banzhaf/Beta(1,4) are not the
        # Shapley value — comparing to `ex` would conflate bias with SE)
        def enumerated(fn):
            g = TabularGame(table, n)
            sv = fn(g)
            return np.array([[sv[d][i] for i in range(n)] for d in range(2)])

        ex_banzhaf = enumerated(lambda g: est.banzhaf_value(g))
        ex_beta14 = enumerated(lambda g: est.shapley_beta(g, alpha=1.0, beta=4.0))
        # budget-matched draws: each semivalue draw costs 2 evals and runs
        # per client, so m/n draws per client matches cc's 2m raw evals
        m_semi = max(4, m // n)
        se_variants = {
            "cc_uniform": (ex, lambda g, r: est.shapley_comp_contrib(
                g, m, rng=r, return_se=True
            )),
            "mc_plain": (ex, lambda g, r: est.shapley_monte_carlo(
                g, m // n * 2, rng=r, return_se=True
            )),
            "owen": (ex, lambda g, r: est.shapley_owen(
                g, q_num=8, m_per_q=max(2, round(2 * m / (n + 1) / 8)), rng=r,
                return_se=True,
            )),
            "kernel": (ex, lambda g, r: est.shapley_kernel(
                g, m=2 * m, rng=r, return_se=True
            )),
            "beta_1_4": (ex_beta14, lambda g, r: est.shapley_beta(
                g, alpha=1.0, beta=4.0, m=m_semi, rng=r, return_se=True
            )),
            "banzhaf": (ex_banzhaf, lambda g, r: est.banzhaf_value(
                g, m=m_semi, rng=r, return_se=True
            )),
        }
        for name, (truth, fn) in se_variants.items():
            cov = tot = 0
            for s in range(min(args.seeds, 40)):
                g = TabularGame(table, n)
                sv, se = fn(g, np.random.default_rng(s))
                a = np.array([[sv[d][i] for i in range(n)] for d in range(2)])
                e = np.array([[se[d][i] for i in range(n)] for d in range(2)])
                cov += int(np.sum(np.abs(a - truth) <= 2 * e))
                tot += a.size
            results[kind].setdefault(name, {})["se_coverage_2sigma"] = round(
                cov / tot, 3
            )
            print(f"{kind:10s} {name:14s} 2sigma-coverage={cov / tot:.2f}")
        # comparison-estimator uncertainty (VERDICT r4 #6): GTG's analytic
        # SE judged against the exact SV (its estimand up to the eps
        # truncation); Fed-SV's bootstrap SE judged against its OWN
        # enumerated estimand (see fed_sv_estimand). Utility dim 0 only —
        # both estimators value one utility index per instance.
        ex0 = ex[0]
        cov = tot = 0
        for s in range(min(args.seeds, 40)):
            g = TabularGame(table, n)
            gtg = cm.GTG(utility_index=0, rng=np.random.default_rng(s))
            sv, se = gtg.compute_shapley_value(g, 0, return_se=True)
            a = np.array([sv[i] for i in range(n)])
            e = np.array([se[i] for i in range(n)])
            cov += int(np.sum(np.abs(a - ex0) <= 2 * e))
            tot += n
        results[kind].setdefault("gtg", {})["se_coverage_2sigma"] = round(
            cov / tot, 3
        )
        print(f"{kind:10s} {'gtg':14s} 2sigma-coverage={cov / tot:.2f}")

        fsv_truth, _u_N = fed_sv_estimand(table, n, utility_index=0)
        cov = tot = 0
        for s in range(min(args.seeds, 40)):
            g = TabularGame(table, n)
            fsv = cm.Fed_SV(utility_index=0, rng=np.random.default_rng(s))
            sv, se = fsv.compute_shapley_value(g, 0, return_se=True, n_boot=50)
            a = np.array([sv[i] for i in range(n)])
            e = np.array([se[i] for i in range(n)])
            cov += int(np.sum(np.abs(a - fsv_truth) <= 2 * e))
            tot += n
        results[kind].setdefault("fed_sv", {})["se_coverage_2sigma"] = round(
            cov / tot, 3
        )
        print(f"{kind:10s} {'fed_sv':14s} 2sigma-coverage={cov / tot:.2f}")

        # adaptive budget: stop at the fixed-budget run's achieved accuracy.
        # Distinct-eval counts ARE the TPU cost (one vmapped validation pass
        # per distinct coalition), so this comparison transfers exactly.
        target = results[kind]["cc_uniform"]["rmse"]
        errs, evals_a, ms = [], [], []
        for s in range(min(args.seeds, 20)):
            g = TabularGame(table, n)
            sv, se, m_used = est.shapley_comp_contrib_adaptive(
                g, target_se=target, rng=np.random.default_rng(s),
                block=10 * n, max_m=300 * n,
            )
            a = np.array([[sv[d][i] for i in range(n)] for d in range(2)])
            errs.append(((a - ex) ** 2).mean())
            evals_a.append(g.num_evaluations)
            ms.append(m_used)
        results[kind]["cc_adaptive"] = {
            "rmse": round(float(np.sqrt(np.mean(errs))), 6),
            "evals": round(float(np.mean(evals_a)), 1),
            "m": round(float(np.mean(ms)), 1),
            "target_se": round(target, 6),
        }
        r = results[kind]["cc_adaptive"]
        print(
            f"{kind:10s} {'cc_adaptive':14s} rmse={r['rmse']:.5f} "
            f"(target_se={target:.4f}) distinct-evals={r['evals']:.0f} "
            f"m={r['m']:.0f} (fixed m={m})"
        )
    print(json.dumps({"n": n, "m": m, "seeds": args.seeds, "results": results}))


if __name__ == "__main__":
    main()
