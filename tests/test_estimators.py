"""Estimator tests against closed-form games (SURVEY.md §4's test strategy —
far beyond the reference, which has no tests).

Oracles:
  * additive game u(S) = Σ_{i∈S} v_i  ⇒  exact SV = v_i
  * symmetric game  ⇒  equal SV (symmetry axiom)
  * efficiency axiom: Σ_j φ_j = u(N) − u(∅)
  * dummy player: u(S∪{d}) = u(S)  ⇒  φ_d = 0
"""

import numpy as np
import pytest

from shapley_vit_tpu.shapley import (
    Game,
    TabularGame,
    call_shapley_computation_method,
    ncr,
    powerset,
    shapley_comp_contrib,
    shapley_exact,
    shapley_exact_own,
    shapley_monte_carlo,
    split_num,
    split_permutation,
    split_permutation_num,
)
from shapley_vit_tpu.shapley.game import additive_table


def sv_arrays(sv, n, dim=2):
    return np.array([[sv[i][j] for j in range(n)] for i in range(dim)])


@pytest.fixture
def additive_game():
    values = np.array([[1.0, -0.5], [2.0, 0.25], [3.0, 1.0]])
    return TabularGame(additive_table(values), n_all=3), values


def test_exact_matches_additive_closed_form(additive_game):
    game, values = additive_game
    sv = shapley_exact(game)
    np.testing.assert_allclose(sv_arrays(sv, 3), values.T, atol=1e-10)


def test_exact_own_matches_exact(additive_game):
    game, values = additive_game
    sv = shapley_exact_own(game)
    np.testing.assert_allclose(sv_arrays(sv, 3), values.T, atol=1e-10)


def test_exact_on_general_game_axioms():
    # arbitrary (non-additive) 4-player game, dim=2
    rng = np.random.default_rng(3)
    n = 4
    table = {}
    for s in powerset(range(n)):
        table[frozenset(s)] = rng.normal(size=2)
    game = TabularGame(table, n_all=n)
    sv = sv_arrays(shapley_exact(game), n)
    # efficiency: sum of SV == u(N) - u(empty)=u(N)
    grand = np.asarray(table[frozenset(range(n))])
    np.testing.assert_allclose(sv.sum(axis=1), grand, atol=1e-10)
    # cross-check both exact forms agree on a general game
    sv2 = sv_arrays(shapley_exact_own(game), n)
    np.testing.assert_allclose(sv, sv2, atol=1e-10)


def test_dummy_player_gets_zero():
    # player 2 contributes nothing to any coalition
    values = np.array([[1.0, 2.0], [4.0, -1.0], [0.0, 0.0]])
    game = TabularGame(additive_table(values), n_all=3)
    sv = sv_arrays(shapley_exact(game), 3)
    np.testing.assert_allclose(sv[:, 2], 0.0, atol=1e-12)


def test_symmetry_axiom():
    values = np.array([[2.0, 1.0], [2.0, 1.0], [5.0, 0.0]])
    game = TabularGame(additive_table(values), n_all=3)
    sv = sv_arrays(shapley_exact(game), 3)
    np.testing.assert_allclose(sv[:, 0], sv[:, 1], atol=1e-12)


def test_monte_carlo_converges_to_exact(additive_game):
    game, values = additive_game
    sv = shapley_monte_carlo(game, m=400, rng=np.random.default_rng(0))
    np.testing.assert_allclose(sv_arrays(sv, 3), values.T, atol=1e-7)
    # additive game: every permutation gives the same marginals, so even
    # small m is exact — use a general game for a real convergence check
    rng = np.random.default_rng(5)
    table = {frozenset(s): rng.normal(size=2) for s in powerset(range(3))}
    g = TabularGame(table, n_all=3)
    exact = sv_arrays(shapley_exact(g), 3)
    approx = sv_arrays(shapley_monte_carlo(g, m=3000, rng=np.random.default_rng(1)), 3)
    np.testing.assert_allclose(approx, exact, atol=0.1)


def test_comp_contrib_converges_on_additive(additive_game):
    # comp-contrib is unbiased but has finite-sample variance even on
    # additive games; seeded rng keeps this deterministic
    game, values = additive_game
    sv = shapley_comp_contrib(game, m=5000, rng=np.random.default_rng(0))
    np.testing.assert_allclose(sv_arrays(sv, 3), values.T, atol=0.05)


def test_comp_contrib_converges_on_general_game():
    rng = np.random.default_rng(11)
    table = {frozenset(s): rng.normal(size=2) for s in powerset(range(4))}
    g = TabularGame(table, n_all=4)
    exact = sv_arrays(shapley_exact(g), 4)
    est = sv_arrays(
        shapley_comp_contrib(g, m=20000, rng=np.random.default_rng(2)), 4
    )
    np.testing.assert_allclose(est, exact, atol=0.15)


def test_batched_precompute_counts_distinct_evals(additive_game):
    game, _ = additive_game
    shapley_exact(game)
    assert game.num_evaluations == 7  # 2^3 - 1 distinct coalitions, once each
    shapley_exact_own(game)  # fully memoized — no new evals
    assert game.num_evaluations == 7


def test_estimators_do_not_share_state(additive_game):
    game, values = additive_game
    sv1 = shapley_monte_carlo(game, m=50, rng=np.random.default_rng(0))
    sv2 = shapley_exact(game)
    # the reference's aliasing bug would leak sv1's sums into sv2
    np.testing.assert_allclose(sv_arrays(sv2, 3), values.T, atol=1e-10)


def test_non_selected_clients_keep_default_sv():
    values = np.array([[1.0, 0.5], [2.0, 0.5], [3.0, 0.5]])
    table = additive_table(values)
    # only clients {0, 2} participate this round
    game = TabularGame(
        {k: v for k, v in table.items() if 1 not in k},
        n_all=3,
        client_selection_vector=[True, False, True],
    )
    sv = shapley_comp_contrib(game, m=4000, rng=np.random.default_rng(0))
    assert sv[0][1] == 0.0 and sv[1][1] == 0.0
    np.testing.assert_allclose(sv[0][0], 1.0, atol=0.05)
    np.testing.assert_allclose(sv[0][2], 3.0, atol=0.05)


def test_call_shapley_computation_method_shape(additive_game, capsys):
    game, values = additive_game
    args = {}
    sv = call_shapley_computation_method(args, game, None, rng=np.random.default_rng(0))
    assert args["approximation_method"] == "comp_contrib"
    assert len(sv) == 2 and set(sv[0]) == {0, 1, 2}
    out = capsys.readouterr().out
    assert "Comp contrib" in out and "Shapley value sum" in out
    # near-efficiency on the printed sums: Σφ ≈ u(N) (finite-sample, m=150)
    np.testing.assert_allclose(
        [sum(sv[i].values()) for i in range(2)], values.sum(axis=0), atol=0.3
    )


def test_helper_parity_with_reference():
    assert ncr(5, 2) == 10 and ncr(6, 0) == 1
    ps = powerset([0, 1, 2])
    assert len(ps) == 7 and (0, 2) in ps
    # reference greedy split: big chunks first (utils_shapley.py:214-231)
    assert split_permutation(7, 3) == [[0, 1, 2], [3, 4], [5, 6]]
    np.testing.assert_array_equal(split_permutation_num(7, 3), [2, 2, 3])
    out = split_num([7, 4], 3, rng=np.random.default_rng(0))
    assert out.shape == (3, 2) and out[:, 0].sum() == 7 and out[:, 1].sum() == 4


def test_owen_recovers_additive_game():
    """Owen sampling: additive games give zero-variance marginals, so even
    a tiny budget recovers the exact SVs."""
    from shapley_vit_tpu.shapley import shapley_owen

    values = np.array([[0.3, 1.0], [0.1, -0.2], [0.2, 0.5]])
    game = TabularGame(additive_table(values), n_all=3)
    sv = shapley_owen(game, q_num=4, m_per_q=2, rng=np.random.default_rng(0))
    got = np.array([[sv[d][i] for i in range(3)] for d in range(2)])
    np.testing.assert_allclose(got, values.T, atol=1e-9)
    # every draw evaluates S + n flips, all memoized: bounded by powerset
    assert game.num_evaluations <= 7


def test_owen_converges_on_general_game():
    from itertools import combinations

    from shapley_vit_tpu.shapley import shapley_exact, shapley_owen

    rng = np.random.default_rng(3)
    n = 5
    w = rng.uniform(0.5, 2.0, n)
    quota = w.sum() * 0.5
    table = {}
    for r in range(1, n + 1):
        for c in combinations(range(n), r):
            vote = 1.0 if w[list(c)].sum() > quota else 0.0
            table[frozenset(c)] = np.array([vote, 0.3 * vote])
    exact = shapley_exact(TabularGame(table, n_all=n))
    acc = np.zeros((2, n))
    K = 40
    for s in range(K):
        g = TabularGame(table, n_all=n)
        sv = shapley_owen(g, q_num=8, m_per_q=6, rng=np.random.default_rng(s))
        acc += np.array([[sv[d][i] for i in range(n)] for d in range(2)])
    ex = np.array([[exact[d][i] for i in range(n)] for d in range(2)])
    assert np.abs(acc / K - ex).max() < 0.05


def test_kernel_shap_full_enumeration_is_exact():
    """The Shapley-kernel WLS over ALL proper coalitions equals the exact
    SV (the defining property of KernelSHAP)."""
    from itertools import combinations

    from shapley_vit_tpu.shapley import shapley_exact, shapley_kernel

    rng = np.random.default_rng(0)
    n = 5
    w = rng.uniform(0.5, 2.0, n)
    quota = w.sum() * 0.5
    table = {}
    for r in range(1, n + 1):
        for c in combinations(range(n), r):
            vote = 1.0 if w[list(c)].sum() > quota else 0.0
            table[frozenset(c)] = np.array([vote + 0.1 * len(c), 0.3 * vote])
    exact = shapley_exact(TabularGame(table, n_all=n))
    ks = shapley_kernel(TabularGame(table, n_all=n))
    for d in range(2):
        for i in range(n):
            assert abs(ks[d][i] - exact[d][i]) < 1e-8


def test_kernel_shap_sampled_and_edges():
    from shapley_vit_tpu.shapley import shapley_kernel

    values = np.array([[0.3, 1.0], [0.1, -0.2], [0.2, 0.5]])
    g = TabularGame(additive_table(values), n_all=3)
    ks = shapley_kernel(g, m=400, rng=np.random.default_rng(0))
    got = np.array([[ks[d][i] for i in range(3)] for d in range(2)])
    assert np.abs(got - values.T).max() < 0.05
    # single-client game: the whole value goes to the one client
    g1 = TabularGame({frozenset({0}): [0.7, -0.1]}, n_all=1)
    ks1 = shapley_kernel(g1)
    assert ks1[0][0] == pytest.approx(0.7) and ks1[1][0] == pytest.approx(-0.1)
    with pytest.raises(ValueError):
        shapley_kernel(TabularGame(additive_table(np.zeros((15, 2))), n_all=15))


def test_kernel_shap_large_n_size_distribution():
    """Regression (round-5 n=64 frontier run): the sampled-mode coalition-
    size distribution used ncr(n,k)·k·(n−k) in an int64 numpy array, which
    wraps NEGATIVE from n≈40 (ncr(64,32)≈1.8e18 ×k(n−k) overflows) —
    rng.choice then raised "probabilities are not non-negative". The
    distribution simplifies to 1/(k(n−k)) with no big integers; an additive
    game at n=64 must sample, solve, and stay near the known SV."""
    from shapley_vit_tpu.shapley import Game, shapley_kernel

    n = 64
    values = np.random.default_rng(5).normal(0.3, 0.05, (n, 2))
    # additive_table enumerates the powerset (2^64 entries) — evaluate the
    # additive utility lazily instead: u(S) = Σ_{i∈S} v_i. W rows are
    # FedAvg RATIOS (members sum to 1), so membership is W != 0
    g = Game(
        eval_coalitions_fn=lambda W: (np.asarray(W) != 0).astype(np.float64)
        @ values,
        num_local_data=[1.0] * n,
        client_selection_vector=[True] * n,
        previous_utility=[0.0, 0.0],
        n_all=n,
    )
    ks, se = shapley_kernel(
        g, m=40 * n, rng=np.random.default_rng(1), return_se=True
    )
    got = np.array([[ks[d][i] for i in range(n)] for d in range(2)])
    # additive game: WLS recovers per-client values (sampling noise only)
    assert np.abs(got - values.T).max() < 0.12
    assert all(v >= 0 for d in range(2) for v in se[d].values())


def test_kernel_shap_rejects_uncovered_clients():
    """Regression: an unsampled client must raise, not silently absorb the
    efficiency residual through the ridge."""
    from shapley_vit_tpu.shapley import shapley_kernel

    rng_vals = np.random.default_rng(0).normal(0.3, 0.1, (10, 2))
    g = TabularGame(additive_table(rng_vals), n_all=10)
    # a single proper coalition can never cover all 10 clients
    with pytest.raises(ValueError, match="covered no coalition"):
        shapley_kernel(g, m=1, rng=np.random.default_rng(0))


def test_beta_shapley_uniform_equals_exact():
    """Beta(1,1) position weights are uniform -> the exact Shapley value."""
    from shapley_vit_tpu.shapley.estimators import shapley_beta, shapley_exact
    from shapley_vit_tpu.shapley.game import TabularGame

    n = 5
    rng = np.random.default_rng(2)
    table = {}
    from itertools import combinations

    for r in range(1, n + 1):
        for c in combinations(range(n), r):
            table[frozenset(c)] = rng.normal(size=2)
    g = TabularGame(table, n)
    exact = shapley_exact(TabularGame(table, n))
    got = shapley_beta(g, alpha=1.0, beta=1.0)
    for d in range(2):
        for i in range(n):
            assert got[d][i] == pytest.approx(exact[d][i], abs=1e-9)


def test_beta_shapley_weights_shift_and_mc_converges():
    """beta > 1 up-weights small coalitions; the MC sampler converges to
    the enumerated value."""
    from shapley_vit_tpu.shapley.estimators import shapley_beta
    from shapley_vit_tpu.shapley.game import TabularGame, additive_table

    # additive game: EVERY semivalue returns v_i exactly (marginals const)
    vals = np.array([[0.4, 1.0], [0.1, -0.3], [0.25, 0.2], [0.05, 0.6]])
    g = TabularGame(additive_table(vals), n_all=4)
    got = shapley_beta(g, alpha=1.0, beta=8.0)
    for d in range(2):
        for i in range(4):
            assert got[d][i] == pytest.approx(vals[i][d], abs=1e-9)

    # non-additive: MC matches enumeration within sampling error
    n = 5
    rng = np.random.default_rng(5)
    from itertools import combinations

    table = {
        frozenset(c): rng.normal(size=2)
        for r in range(1, n + 1)
        for c in combinations(range(n), r)
    }
    want = shapley_beta(TabularGame(table, n), alpha=1.0, beta=4.0)
    errs = []
    for s in range(6):
        got = shapley_beta(
            TabularGame(table, n), alpha=1.0, beta=4.0, m=800,
            rng=np.random.default_rng(s),
        )
        errs.append(
            max(abs(got[d][i] - want[d][i]) for d in range(2) for i in range(n))
        )
    assert np.mean(errs) < 0.12, errs


def test_banzhaf_additive_and_mc():
    from shapley_vit_tpu.shapley.estimators import banzhaf_value
    from shapley_vit_tpu.shapley.game import TabularGame, additive_table

    vals = np.array([[0.4, 1.0], [0.1, -0.3], [0.25, 0.2]])
    g = TabularGame(additive_table(vals), n_all=3)
    got = banzhaf_value(g)
    for d in range(2):
        for i in range(3):
            assert got[d][i] == pytest.approx(vals[i][d], abs=1e-9)

    n = 5
    rng = np.random.default_rng(9)
    from itertools import combinations

    table = {
        frozenset(c): rng.normal(size=2)
        for r in range(1, n + 1)
        for c in combinations(range(n), r)
    }
    want = banzhaf_value(TabularGame(table, n))
    got = banzhaf_value(TabularGame(table, n), m=1500, rng=np.random.default_rng(1))
    err = max(abs(got[d][i] - want[d][i]) for d in range(2) for i in range(n))
    assert err < 0.15, err


def test_semivalue_mc_standard_errors_cover_truth():
    """Beta/Banzhaf MC ``return_se=True``: the analytic SEs cover each
    semivalue's own enumerated estimand at ~2sigma rates, and enumeration
    mode returns exact values with zero SE (round-3 VERDICT weak #4)."""
    from itertools import combinations

    from shapley_vit_tpu.shapley.estimators import banzhaf_value, shapley_beta
    from shapley_vit_tpu.shapley.game import TabularGame

    n = 5
    rng = np.random.default_rng(11)
    table = {
        frozenset(c): rng.normal(size=2)
        for r in range(1, n + 1)
        for c in combinations(range(n), r)
    }

    for fn, truth_fn in (
        (
            lambda g, r: shapley_beta(g, alpha=1.0, beta=4.0, m=60, rng=r, return_se=True),
            lambda g: shapley_beta(g, alpha=1.0, beta=4.0),
        ),
        (
            lambda g, r: banzhaf_value(g, m=60, rng=r, return_se=True),
            lambda g: banzhaf_value(g),
        ),
    ):
        want = truth_fn(TabularGame(table, n))
        covered = total = 0
        for s in range(20):
            sv, se = fn(TabularGame(table, n), np.random.default_rng(s))
            for d in range(2):
                for i in range(n):
                    assert se[d][i] > 0.0
                    covered += int(abs(sv[d][i] - want[d][i]) <= 2 * se[d][i])
                    total += 1
        # binomial(200, 0.95) almost never dips below 0.85
        assert covered / total >= 0.85, covered / total

    # enumeration mode: exact point estimate, SE identically zero
    sv, se = shapley_beta(TabularGame(table, n), return_se=True)
    assert all(se[d][i] == 0.0 for d in range(2) for i in range(n))
    sv, se = banzhaf_value(TabularGame(table, n), return_se=True)
    assert all(se[d][i] == 0.0 for d in range(2) for i in range(n))


def test_cc_accumulator_vectorized_matches_per_sample_loop():
    """The block-vectorized _CCAccumulator (round-3 VERDICT weak #1)
    reproduces the reference's per-sample scatter arithmetic
    (utils_shapley.py:291-301) exactly."""
    from shapley_vit_tpu.shapley.estimators import (
        _CCAccumulator,
        _cc_evaluate,
        _cc_samples,
    )
    from shapley_vit_tpu.shapley.game import TabularGame
    from itertools import combinations

    n = 9
    rng = np.random.default_rng(3)
    table = {
        frozenset(c): rng.normal(size=2)
        for r in range(1, n + 1)
        for c in combinations(range(n), r)
    }
    g = TabularGame(table, n)
    sel = np.array(g.selected_clients)
    samples = _cc_samples(n, 150, np.random.default_rng(7))
    _cc_evaluate(g, samples, sel)

    acc = _CCAccumulator(g, sel)
    # split across two blocks: incremental adds must compose
    acc.add(samples[:70])
    acc.add(samples[70:])

    # reference-shaped per-sample scatter
    utility = [np.zeros((n + 1, n)) for _ in range(2)]
    utility_sq = [np.zeros((n + 1, n)) for _ in range(2)]
    count = np.zeros((n + 1, n))
    for idxs, j in samples:
        u1 = g.eval_utility(sel[idxs[:j]])
        u2 = g.eval_utility(sel[idxs[j:]])
        cc = [u1[i] - u2[i] for i in range(2)]
        t = np.zeros(n)
        t[idxs[:j]] = 1
        count[j, :] += t
        for i in range(2):
            utility[i][j, :] += t * cc[i]
            utility_sq[i][j, :] += t * cc[i] ** 2
        t = np.zeros(n)
        t[idxs[j:]] = 1
        count[n - j, :] += t
        for i in range(2):
            utility[i][n - j, :] += t * (-cc[i])
            utility_sq[i][n - j, :] += t * cc[i] ** 2

    np.testing.assert_allclose(acc.count, count)
    for i in range(2):
        np.testing.assert_allclose(acc.utility[i], utility[i], atol=1e-12)
        np.testing.assert_allclose(acc.utility_sq[i], utility_sq[i], atol=1e-12)

    # vectorized score == reference per-cell loop
    sv, se = acc.score(with_se=True)
    sv_o = [np.zeros(n) for _ in range(2)]
    var_o = [np.zeros(n) for _ in range(2)]
    for i in range(n + 1):
        for j in range(n):
            for k in range(2):
                if count[i][j] != 0:
                    mean = utility[k][i][j] / count[i][j]
                    sv_o[k][j] += mean
                    if count[i][j] >= 2:
                        c = count[i][j]
                        s2 = (utility_sq[k][i][j] / c - mean**2) * c / (c - 1)
                        var_o[k][j] += max(s2, 0.0) / c
    for i in range(2):
        np.testing.assert_allclose(sv[i], sv_o[i] / n, atol=1e-12)
        np.testing.assert_allclose(se[i], np.sqrt(var_o[i]) / n, atol=1e-12)
