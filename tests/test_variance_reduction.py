"""Opt-in variance-reduction modes of the Monte-Carlo estimators.

Beyond-reference capability (the reference samples uniformly,
utils_shapley.py:278-287): stratified/Neyman split-point allocation for
comp-contrib, antithetic permutation pairing for permutation-MC. Defaults
keep the reference sampling distribution AND this package's historical rng
stream — covered by the parity tests in test_estimators.py. Measured
sample-efficiency table: tools/sample_efficiency.py (summarized in the
estimator docstrings)."""

from itertools import combinations

import numpy as np
import pytest

from shapley_vit_tpu.shapley import estimators as est
from shapley_vit_tpu.shapley.game import TabularGame, additive_table


def _sv_array(sv, n, dim=2):
    return np.array([[sv[d][i] for i in range(n)] for d in range(dim)])


def _voting_table(n, seed=0):
    rng = np.random.default_rng(seed)
    w = rng.uniform(0.5, 2.0, n)
    v = rng.normal(0, 0.1, (n, 2))
    quota = w.sum() * 0.5
    table = {}
    for r in range(1, n + 1):
        for c in combinations(range(n), r):
            lc = list(c)
            vote = 1.0 if w[lc].sum() > quota else 0.0
            table[frozenset(c)] = v[lc].sum(0) + vote * np.array([1.0, 0.5])
    return table


def _supermod_table(n, seed=0):
    rng = np.random.default_rng(seed)
    w = rng.uniform(0.5, 2.0, n)
    table = {}
    for r in range(1, n + 1):
        for c in combinations(range(n), r):
            s = w[list(c)].sum()
            table[frozenset(c)] = np.array([s**2, 0.5 * s**2]) / w.sum() ** 2
    return table


@pytest.mark.parametrize("stratify", ["balanced", "neyman"])
def test_stratified_cc_unbiased(stratify):
    """Mean over many seeds converges to the exact SV.

    Note comp-contrib (reference arithmetic) skips empty (stratum, client)
    cells, which biases ALL modes toward zero at small m — measured max
    deviation 0.06 at m=4n even for the reference's uniform sampling. At
    m=20n the cell-miss probability is negligible: uniform 0.007,
    balanced 0.005, neyman 0.002 (stratified modes are LESS biased because
    they cannot leave a stratum short)."""
    n = 5
    table = _voting_table(n)
    exact = _sv_array(est.shapley_exact(TabularGame(table, n)), n)
    acc = np.zeros((2, n))
    K = 200
    for s in range(K):
        g = TabularGame(table, n)
        sv = est.shapley_comp_contrib(
            g, 20 * n, rng=np.random.default_rng(s), stratify=stratify
        )
        acc += _sv_array(sv, n)
    assert np.abs(acc / K - exact).max() < 0.02


def test_antithetic_mc_unbiased():
    n = 5
    table = _voting_table(n)
    exact = _sv_array(est.shapley_exact(TabularGame(table, n)), n)
    acc = np.zeros((2, n))
    K = 200
    for s in range(K):
        g = TabularGame(table, n)
        sv = est.shapley_monte_carlo(
            g, 8, rng=np.random.default_rng(s), antithetic=True
        )
        acc += _sv_array(sv, n)
    assert np.abs(acc / K - exact).max() < 0.05


def test_neyman_beats_uniform_on_heterogeneous_game():
    """The voting game concentrates variance near the quota split sizes;
    Neyman allocation measurably reduces MSE at equal sample budget
    (0.82x RMSE at n=8 m=400 in the full sweep — assert a conservative
    bound over a fixed seed set)."""
    n = 8
    table = _voting_table(n)
    exact = _sv_array(est.shapley_exact(TabularGame(table, n)), n)

    def mse(stratify):
        errs = []
        for s in range(40):
            g = TabularGame(table, n)
            sv = est.shapley_comp_contrib(
                g, 50 * n, rng=np.random.default_rng(s), stratify=stratify
            )
            errs.append(((_sv_array(sv, n) - exact) ** 2).mean())
        return np.mean(errs)

    assert mse("neyman") < mse("uniform") * 0.9


def test_antithetic_exact_on_supermodular():
    """Quadratic utility: each antithetic pair's marginal contributions
    cancel to the exact SV — variance collapses to ~0."""
    n = 6
    table = _supermod_table(n)
    exact = _sv_array(est.shapley_exact(TabularGame(table, n)), n)
    g = TabularGame(table, n)
    sv = est.shapley_monte_carlo(
        g, 4, rng=np.random.default_rng(0), antithetic=True
    )
    assert np.abs(_sv_array(sv, n) - exact).max() < 1e-9


def test_stratified_budget_and_additive_recovery():
    """All modes spend exactly m samples and recover additive-game SVs."""
    values = np.array([[0.3, 1.0], [0.1, -0.2], [0.2, 0.5], [0.05, 0.3]])
    n = 4
    table = additive_table(values)
    for stratify in ["uniform", "balanced", "neyman"]:
        g = TabularGame(table, n_all=n)
        sv = est.shapley_comp_contrib(
            g, 200, rng=np.random.default_rng(1), stratify=stratify
        )
        got = _sv_array(sv, n)
        assert np.abs(got - values.T).max() < 0.12, stratify
        # every sample evaluates S and N\S; full-coalition complement of the
        # empty set is free, so evals are bounded by the powerset size
        assert g.num_evaluations <= 2**n - 1


def test_odd_m_antithetic_and_bad_mode():
    values = np.array([[0.3, 1.0], [0.1, -0.2], [0.2, 0.5]])
    g = TabularGame(additive_table(values), n_all=3)
    sv = est.shapley_monte_carlo(g, 5, rng=np.random.default_rng(0), antithetic=True)
    assert np.isfinite(_sv_array(sv, 3)).all()
    with pytest.raises(ValueError):
        est.shapley_comp_contrib(g, 10, stratify="bogus")


def test_balanced_split_points_cover_all_strata():
    rng = np.random.default_rng(0)
    js = est._balanced_split_points(6, 20, rng)
    assert len(js) == 20
    counts = np.bincount(js, minlength=7)[1:]
    assert counts.min() >= 3 and counts.max() <= 4


def test_neyman_allocation_sums_to_budget():
    n = 6
    table = _voting_table(n)
    g = TabularGame(table, n)
    rng = np.random.default_rng(0)
    pilot = est._cc_samples_at(n, est._balanced_split_points(n, 2 * n, rng), rng)
    est._cc_evaluate(g, pilot, np.array(g.selected_clients))
    for extra in [0, 1, 7, 23]:
        js = est._neyman_extra_split_points(g, pilot, extra, n, rng)
        assert len(js) == extra
        assert all(1 <= j <= n for j in js)


def test_driver_threads_cc_stratify():
    """call_shapley_computation_method forwards the stratify mode."""
    values = np.array([[0.3, 1.0], [0.1, -0.2], [0.2, 0.5]])
    g = TabularGame(additive_table(values), n_all=3)
    sv = est.call_shapley_computation_method(
        {}, g, rng=np.random.default_rng(0), stratify="balanced"
    )
    assert np.abs(_sv_array(sv, 3) - values.T).max() < 0.1


def test_sample_efficiency_tool_smoke(capsys, monkeypatch):
    import os
    import runpy
    import sys

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools", "sample_efficiency.py",
    )
    monkeypatch.setattr(
        sys, "argv", [path, "--n", "4", "--m", "40", "--seeds", "4"]
    )
    runpy.run_path(path, run_name="__main__")
    out = capsys.readouterr().out
    assert '"results"' in out and "cc_neyman" in out


def test_comp_contrib_se_coverage():
    """±2·SE covers the exact SV at near-nominal rates (analytic SE from
    per-stratum sample variances; no extra evaluations)."""
    n = 6
    table = _voting_table(n)
    exact = _sv_array(est.shapley_exact(TabularGame(table, n)), n)
    covered = total = 0
    for s in range(60):
        g = TabularGame(table, n)
        sv, se = est.shapley_comp_contrib(
            g, 30 * n, rng=np.random.default_rng(s), return_se=True
        )
        a, e = _sv_array(sv, n), _sv_array(se, n)
        covered += int(np.sum(np.abs(a - exact) <= 2 * e))
        total += a.size
    # nominal ~95%; allow slack for the small-m variance underestimate
    assert covered / total > 0.85


def test_comp_contrib_se_shrinks_with_budget():
    n = 5
    table = _voting_table(n)

    def mean_se(m):
        ses = []
        for s in range(10):
            g = TabularGame(table, n)
            _, se = est.shapley_comp_contrib(
                g, m, rng=np.random.default_rng(s), return_se=True
            )
            ses.append(_sv_array(se, n).mean())
        return np.mean(ses)

    lo, hi = mean_se(40), mean_se(640)
    # 16x budget -> ~4x smaller SE
    assert hi < lo / 2.5


def test_se_structure_and_rng_parity():
    """return_se must not perturb the point estimate or the rng stream."""
    values = np.array([[0.3, 1.0], [0.1, -0.2], [0.2, 0.5]])
    g1 = TabularGame(additive_table(values), n_all=3)
    sv1 = est.shapley_comp_contrib(g1, 60, rng=np.random.default_rng(7))
    g2 = TabularGame(additive_table(values), n_all=3)
    sv2, se = est.shapley_comp_contrib(
        g2, 60, rng=np.random.default_rng(7), return_se=True
    )
    assert sv1 == sv2
    for d in se:
        assert set(d) == {0, 1, 2}
        assert all(v >= 0 for v in d.values())


def test_adaptive_comp_contrib_hits_target():
    n = 5
    table = _voting_table(n)
    exact = _sv_array(est.shapley_exact(TabularGame(table, n)), n)
    g = TabularGame(table, n)
    sv, se, m = est.shapley_comp_contrib_adaptive(
        g, target_se=0.05, rng=np.random.default_rng(0)
    )
    a, e = _sv_array(sv, n), _sv_array(se, n)
    assert e.max() <= 0.05
    assert m >= 4 * n
    # estimate is consistent with its own error bars vs exact
    assert np.abs(a - exact).max() < 0.05 * 4


def test_adaptive_budget_scales_with_target():
    n = 5
    table = _voting_table(n)
    g1 = TabularGame(table, n)
    _, _, m_loose = est.shapley_comp_contrib_adaptive(
        g1, target_se=0.2, rng=np.random.default_rng(1)
    )
    g2 = TabularGame(table, n)
    _, _, m_tight = est.shapley_comp_contrib_adaptive(
        g2, target_se=0.03, rng=np.random.default_rng(1)
    )
    assert m_tight > m_loose


def test_adaptive_respects_max_m_and_validates():
    values = np.array([[0.3, 1.0], [0.1, -0.2], [0.2, 0.5]])
    g = TabularGame(additive_table(values), n_all=3)
    _, _, m = est.shapley_comp_contrib_adaptive(
        g, target_se=1e-9, rng=np.random.default_rng(0), max_m=50
    )
    assert m == 50
    with pytest.raises(ValueError):
        est.shapley_comp_contrib_adaptive(g, target_se=0.0)
    with pytest.raises(ValueError):
        est.shapley_comp_contrib_adaptive(g, target_se=0.1, stratify="nope")


def test_adaptive_neyman_runs():
    n = 6
    table = _voting_table(n)
    g = TabularGame(table, n)
    sv, se, m = est.shapley_comp_contrib_adaptive(
        g, target_se=0.08, rng=np.random.default_rng(2), stratify="neyman"
    )
    assert _sv_array(se, n).max() <= 0.08
    assert np.isfinite(_sv_array(sv, n)).all()


def test_mc_se_coverage_and_antithetic_collapse():
    n = 6
    table = _voting_table(n)
    exact = _sv_array(est.shapley_exact(TabularGame(table, n)), n)
    covered = total = 0
    for s in range(40):
        g = TabularGame(table, n)
        sv, se = est.shapley_monte_carlo(
            g, 60, rng=np.random.default_rng(s), return_se=True
        )
        a, e = _sv_array(sv, n), _sv_array(se, n)
        covered += int(np.sum(np.abs(a - exact) <= 2 * e))
        total += a.size
    assert covered / total > 0.85

    # supermodular: antithetic pair means are exact -> SE ~ 0
    sm = _supermod_table(n)
    g = TabularGame(sm, n)
    sv, se = est.shapley_monte_carlo(
        g, 6, rng=np.random.default_rng(0), antithetic=True, return_se=True
    )
    assert _sv_array(se, n).max() < 1e-9


def test_mc_return_se_keeps_point_estimate():
    values = np.array([[0.3, 1.0], [0.1, -0.2], [0.2, 0.5]])
    g1 = TabularGame(additive_table(values), n_all=3)
    sv1 = est.shapley_monte_carlo(g1, 20, rng=np.random.default_rng(3))
    g2 = TabularGame(additive_table(values), n_all=3)
    sv2, se = est.shapley_monte_carlo(
        g2, 20, rng=np.random.default_rng(3), return_se=True
    )
    assert sv1 == sv2
    # additive game: marginals are constant -> SE exactly 0
    assert _sv_array(se, 3).max() < 1e-12


def test_adaptive_neyman_terminates_early():
    """Regression: pure neyman blocks assign zero samples to zero-variance
    strata (stratum n), so coverage never completed and the loop burned the
    whole max_m budget at any n >= 4. Balanced blocks until covered fixes
    it."""
    n = 5
    vals = np.abs(np.random.default_rng(1).normal(0.3, 0.1, (n, 2)))
    g = TabularGame(additive_table(vals), n_all=n)
    _, _, m = est.shapley_comp_contrib_adaptive(
        g, target_se=0.05, rng=np.random.default_rng(0), stratify="neyman"
    )
    assert m < 500 * n / 2  # was == max_m (2500) before the fix


def test_owen_se_coverage_and_shrinkage():
    """Owen ±2·SE covers the exact SV at near-nominal rates (stratified
    per-q-level sample variances; round-2 VERDICT #7), and more draws per
    level shrink the SE."""
    n = 6
    table = _voting_table(n)
    exact = _sv_array(est.shapley_exact(TabularGame(table, n)), n)
    covered = total = 0
    ses = []
    for s in range(40):
        g = TabularGame(table, n)
        sv, se = est.shapley_owen(
            g, q_num=8, m_per_q=8, rng=np.random.default_rng(s), return_se=True
        )
        a, e = _sv_array(sv, n), _sv_array(se, n)
        covered += int(np.sum(np.abs(a - exact) <= 2 * e))
        total += a.size
        ses.append(e.mean())
    assert covered / total > 0.85
    big = []
    for s in range(10):
        g = TabularGame(table, n)
        _, se = est.shapley_owen(
            g, q_num=8, m_per_q=64, rng=np.random.default_rng(s), return_se=True
        )
        big.append(_sv_array(se, n).mean())
    # 8x draws per level -> ~2.8x smaller SE
    assert np.mean(big) < np.mean(ses) / 2.0


def test_owen_se_keeps_point_estimate_and_additive_zero():
    values = np.array([[0.3, 1.0], [0.1, -0.2], [0.2, 0.5]])
    g1 = TabularGame(additive_table(values), n_all=3)
    sv1 = est.shapley_owen(g1, q_num=4, m_per_q=4, rng=np.random.default_rng(5))
    g2 = TabularGame(additive_table(values), n_all=3)
    sv2, se = est.shapley_owen(
        g2, q_num=4, m_per_q=4, rng=np.random.default_rng(5), return_se=True
    )
    assert sv1 == sv2
    # additive game: every marginal equals v_i -> per-level variance 0
    assert _sv_array(se, 3).max() < 1e-12


def test_kernel_se_coverage_and_enumeration_zero():
    """KernelSHAP sampled-mode ±2·SE (constrained-WLS sandwich covariance)
    covers the exact SV; enumeration mode is exact so its SE is zero."""
    n = 6
    table = _voting_table(n)
    g = TabularGame(table, n)
    exact = _sv_array(est.shapley_exact(g), n)
    sv_en, se_en = est.shapley_kernel(TabularGame(table, n), return_se=True)
    np.testing.assert_allclose(_sv_array(sv_en, n), exact, atol=1e-8)
    assert _sv_array(se_en, n).max() == 0.0

    covered = total = 0
    for s in range(40):
        g = TabularGame(table, n)
        sv, se = est.shapley_kernel(
            g, m=40 * n, rng=np.random.default_rng(s), return_se=True
        )
        a, e = _sv_array(sv, n), _sv_array(se, n)
        covered += int(np.sum(np.abs(a - exact) <= 2 * e))
        total += a.size
    assert covered / total > 0.80  # sandwich SEs are approximate; near-nominal


def test_antithetic_rounds_odd_m_down():
    """ADVICE r2: antithetic pairs permutations — an odd m is rounded down
    so the unpaired tail cannot miscalibrate the SE."""
    values = np.array([[0.3, 1.0], [0.1, -0.2], [0.2, 0.5]])
    g1 = TabularGame(additive_table(values), n_all=3)
    sv_odd = est.shapley_monte_carlo(
        g1, 5, rng=np.random.default_rng(7), antithetic=True
    )
    g2 = TabularGame(additive_table(values), n_all=3)
    sv_even = est.shapley_monte_carlo(
        g2, 4, rng=np.random.default_rng(7), antithetic=True
    )
    assert sv_odd == sv_even
    with pytest.raises(ValueError):
        est.shapley_monte_carlo(g1, 1, antithetic=True)


def test_kernel_enumeration_has_no_ridge_perturbation():
    """ADVICE r2: the enumeration-mode WLS must equal the exact SV without
    the sampled-mode ridge (docstring promise)."""
    n = 4
    rng = np.random.default_rng(3)
    table = {}
    for r in range(1, n + 1):
        from itertools import combinations

        for c in combinations(range(n), r):
            table[frozenset(c)] = rng.normal(size=2)
    g = TabularGame(table, n)
    exact = _sv_array(est.shapley_exact(TabularGame(table, n)), n)
    got = _sv_array(est.shapley_kernel(g), n)
    np.testing.assert_allclose(got, exact, atol=1e-10)
