"""Tests for the comparison estimators, MILP round selection, and the
multi-round lazy-utility layer — all against closed-form games."""

import numpy as np
import pytest

from shapley_vit_tpu.shapley import (
    TabularGame,
    powerset,
    shapley_exact,
)
from shapley_vit_tpu.shapley import compared_methods as cm
from shapley_vit_tpu.shapley import fed_shapley as fs
from shapley_vit_tpu.shapley import milp as milp_mod
from shapley_vit_tpu.shapley.game import additive_table


def sv_arr(sv_dict, n):
    return np.array([sv_dict[i] for i in range(n)])


@pytest.fixture
def additive4():
    values = np.array([[1.0, 0.2], [2.0, -0.1], [0.5, 0.4], [3.0, 0.0]])
    return TabularGame(additive_table(values), n_all=4), values


def test_shapley_value_closed_form_matches_exact(additive4):
    game, values = additive4
    sets = list(powerset(range(4)))
    game.precompute(sets)
    util = {S: game.eval_utility(S)[0] for S in sets}
    util[()] = 0.0
    sv = cm.shapley_value(util, game)
    np.testing.assert_allclose(sv_arr(sv, 4), values[:, 0], atol=1e-10)


def test_mr_matches_exact(additive4):
    game, values = additive4
    mr = cm.MR(utility_index=0)
    sv = mr.compute_shapley_value(game, t=0)
    np.testing.assert_allclose(sv_arr(sv, 4), values[:, 0], atol=1e-10)
    assert mr.Ut[0]  # utility table stored


def test_tmr_truncates_flat_rounds():
    # grand-coalition utility ~ 0 -> all-zero SV without evaluating the powerset
    values = np.array([[0.001, 0.0], [0.002, 0.0], [-0.001, 0.0]])
    game = TabularGame(additive_table(values), n_all=3)
    tmr = cm.TMR(utility_index=0)
    sv = tmr.compute_shapley_value(game, t=0)
    assert all(v == 0.0 for v in sv.values())
    assert game.num_evaluations <= 2  # only S_all (+memo); no powerset sweep


def test_tmr_matches_exact_when_not_truncated(additive4):
    game, values = additive4
    tmr = cm.TMR(utility_index=1)
    sv = tmr.compute_shapley_value(game, t=0)
    np.testing.assert_allclose(sv_arr(sv, 4), values[:, 1], atol=1e-10)


def test_gtg_converges_on_additive(additive4):
    game, values = additive4
    gtg = cm.GTG(utility_index=0, rng=np.random.default_rng(0))
    sv = gtg.compute_shapley_value(game, t=0)
    # truncated MC: loose tolerance, but ordering should hold
    arr = sv_arr(sv, 4)
    assert np.argmax(arr) == np.argmax(values[:, 0])
    np.testing.assert_allclose(arr, values[:, 0], atol=0.5)
    np.testing.assert_allclose(arr.sum(), values[:, 0].sum(), atol=0.2)


def test_gtg_round_truncation():
    values = np.zeros((3, 2))
    game = TabularGame(additive_table(values), n_all=3)
    gtg = cm.GTG(utility_index=0, rng=np.random.default_rng(0))
    sv = gtg.compute_shapley_value(game, t=0)
    assert all(v == 0.0 for v in sv.values())


def test_fed_sv_group_testing_feasible(additive4):
    game, values = additive4
    # shift utilities so SV components exceed the 0.05 lower bound
    fsv = cm.Fed_SV(utility_index=0, rng=np.random.default_rng(0))
    fsv.CONVERGE_MIN_K = 50
    sv = fsv.compute_shapley_value(game, t=0)
    arr = sv_arr(sv, 4)
    # efficiency is a hard LP constraint: Σx == u(N)
    np.testing.assert_allclose(arr.sum(), values[:, 0].sum(), atol=1e-6)
    assert (arr >= 0.05 - 1e-9).all()
    # group testing approximates pairwise differences: ordering of extremes
    assert arr[3] == arr.max()


def test_solve_feasible_lp_directly():
    # known differences: x = [1, 2, 4], u_N = 7
    x_true = np.array([1.0, 2.0, 4.0])
    UD = x_true[:, None] - x_true[None, :]
    x = cm.Fed_SV.solve_feasible(3, 7.0, UD)
    np.testing.assert_allclose(np.sort(x), x_true, atol=0.1)


def test_solve_feasible_small_uN_many_agents():
    """The reference's hardcoded x_i>=0.05 bound is infeasible for
    u_N < 0.05*N (would loop forever); ours shrinks the bound."""
    n = 16
    x_true = np.linspace(-0.02, 0.05, n)
    u_N = float(x_true.sum())  # ~0.24 << 0.05*16
    UD = x_true[:, None] - x_true[None, :]
    x = cm.Fed_SV.solve_feasible(n, u_N, UD)
    assert np.isfinite(x).all()
    np.testing.assert_allclose(x.sum(), u_N, atol=1e-6)
    np.testing.assert_allclose(np.sort(x), np.sort(x_true), atol=0.05)


def test_solve_feasible_property_random_ud():
    """Property test (round-2 VERDICT #8): for random antisymmetric UD and
    u_N spanning large-negative / ~0 / large-positive, solve_feasible must
    return EITHER a point feasible under the relaxed constraints (Σx = u_N,
    x >= lb) OR exactly the closed-form least-squares fallback — and the
    lb shrink must never make Σ lb > u_N (which would be LP-infeasible
    regardless of ε, the reference's forever-loop bug)."""
    rng = np.random.default_rng(0)
    for n in (3, 5, 9):
        for u_scale in (-50.0, -1.0, -1e-3, 0.0, 1e-3, 1.0, 50.0):
            raw = rng.normal(size=(n, n))
            UD = raw - raw.T  # antisymmetric, like the group-testing UD
            u_N = float(u_scale * (1 + rng.random()))
            x = cm.Fed_SV.solve_feasible(n, u_N, UD)
            assert x.shape == (n,) and np.isfinite(x).all()

            # the lb the implementation uses must keep Σlb <= u_N
            lb = 0.05
            if lb * n > u_N:
                lb = min(0.05, u_N / n - abs(u_N) * 0.5 - 1e-6)
            assert lb * n <= u_N + 1e-9, (n, u_N, lb)

            fallback = (u_N + UD.sum(axis=1)) / n
            is_lp_point = (
                abs(float(x.sum()) - u_N) <= 1e-6 and (x >= lb - 1e-8).all()
            )
            assert is_lp_point or np.allclose(x, fallback), (n, u_N, x)
            # antisymmetric UD ⇒ the fallback also satisfies efficiency, so
            # EVERY return path preserves Σx = u_N
            np.testing.assert_allclose(float(x.sum()), u_N, atol=1e-6)


def test_comfedsv_roundtrip(additive4):
    game, values = additive4
    all_subsets = fs.all_subsets_enumeration(4)
    utilities, mask = cm.call_comfedsv(game, all_subsets)
    assert mask.sum() == len(all_subsets)  # all clients participate
    args = {"rounds": 1, "num_clients": 4}
    sv_rounds, times = cm.comfedsv(args, [utilities[0]], all_subsets)
    np.testing.assert_allclose(sv_arr(sv_rounds[0], 4), values[:, 0], atol=1e-10)


def counted_game(n_all, values):
    """TabularGame whose eval_coalitions_fn counts invocations (each call =
    one batched TPU pass in production)."""
    game = TabularGame(additive_table(values), n_all=n_all)
    calls = []
    inner = game.eval_coalitions_fn

    def counting(W):
        calls.append(W.shape[0])
        return inner(W)

    game.eval_coalitions_fn = counting
    return game, calls


def test_gtg_batches_prefix_evals():
    """GTG(batch_prefixes=True) must evaluate each convergence round's
    prefix coalitions in ONE evaluator call, not stream them."""
    values = np.array([[1.0, 0.2], [2.0, -0.1], [0.5, 0.4], [3.0, 0.0]])
    game, calls = counted_game(4, values)
    gtg = cm.GTG(utility_index=0, rng=np.random.default_rng(0), batch_prefixes=True)
    sv = gtg.compute_shapley_value(game, t=0)
    np.testing.assert_allclose(sv_arr(sv, 4), values[:, 0], atol=0.5)
    # n=4 -> 15 distinct coalitions; everything lands within the first
    # convergence round's single precompute (+2 for S_0-adjacent/S_all)
    assert game.num_evaluations >= 10
    assert len(calls) <= 4, f"GTG made {len(calls)} evaluator calls: {calls}"


def test_fed_sv_batches_subset_draws():
    """Fed-SV must precompute its sampled subsets in blocks, not per-draw."""
    values = np.array([[1.0, 0.2], [2.0, -0.1], [0.5, 0.4], [3.0, 0.0]])
    game, calls = counted_game(4, values)
    fsv = cm.Fed_SV(utility_index=0, rng=np.random.default_rng(0))
    fsv.CONVERGE_MIN_K = 50
    sv = fsv.compute_shapley_value(game, t=0)
    np.testing.assert_allclose(sv_arr(sv, 4).sum(), values[:, 0].sum(), atol=1e-6)
    # >= 50 draws but at most a handful of batched evaluator calls
    assert len(calls) <= 6, f"Fed_SV made {len(calls)} evaluator calls: {calls}"


def test_fed_sv_multi_round_pending_carryover():
    """Prefetched-but-unconsumed draws must carry into the next round so the
    rng stream matches a sequential implementation across rounds."""
    values = np.array([[1.0, 0.2], [2.0, -0.1], [0.5, 0.4], [3.0, 0.0]])
    game, _ = counted_game(4, values)
    fsv = cm.Fed_SV(utility_index=0, rng=np.random.default_rng(0))
    fsv.CONVERGE_MIN_K = 30
    fsv.compute_shapley_value(game, t=0)
    pending_after_r0 = list(fsv._pending)
    game2, _ = counted_game(4, values)
    sv1 = fsv.compute_shapley_value(game2, t=1)
    assert set(sv1) == {0, 1, 2, 3}
    if pending_after_r0:
        # round 1 consumed the carried-over draws first
        assert fsv._pending != pending_after_r0


# ---------------------------------------------------------------------------
# MILP
# ---------------------------------------------------------------------------

SEL = np.array(
    [
        [1, 1, 0, 0],
        [0, 1, 1, 0],
        [0, 0, 1, 1],
        [1, 0, 0, 1],
        [1, 1, 1, 1],
    ]
)


def test_milp_shapley_budget_respected():
    ok, fun, x = milp_mod.MILP_Shapley(SEL, max_shapley_computation=2).solve()
    assert ok
    assert x.sum() <= 2 + 1e-9 and x.sum() >= 1
    assert set(np.round(x).astype(int)) <= {0, 1}


def test_milp_shapley_prefers_high_participation():
    ok, _, x = milp_mod.MILP_Shapley(SEL, max_shapley_computation=1, gamma=0.0).solve()
    assert ok
    # round 4 (all clients) carries the highest client weight
    assert np.argmax(x) == 4


def test_milp_two_sided_solves():
    ok, fun, x = milp_mod.MILP_Shapley_Two_Sided(SEL, max_shapley_computation=3).solve()
    assert ok and x.sum() <= 3 + 1e-9


def test_milp_two_sided_approx_solves():
    ok, fun, x = milp_mod.MILP_Shapley_Two_Sided_Approx(SEL, max_shapley_computation=2).solve()
    assert ok and x.sum() <= 2 + 1e-9


def test_milp_prev_coverage_and_binary_search():
    ok, fun, x = milp_mod.MILP_Shapley_prev(SEL, min_shapley_computation=1).solve()
    assert ok
    chosen = np.round(x).astype(bool)
    # every client covered at least once by the chosen rounds
    assert (SEL[chosen].sum(axis=0) >= 1).all()

    best = milp_mod.binary_search(SEL)
    assert best is not None
    chosen = np.round(best).astype(bool)
    assert (SEL[chosen].sum(axis=0) >= 1).all()


# ---------------------------------------------------------------------------
# fed_shapley multi-round
# ---------------------------------------------------------------------------

def test_compute_shapley_corrected_matches_exact(additive4):
    game, values = additive4
    sets = list(powerset(range(4)))
    game.precompute(sets)
    util = {S: game.eval_utility(S)[0] for S in sets}
    sv = fs.compute_shapley_corrected(util, list(range(4)))
    np.testing.assert_allclose(sv_arr(sv, 4), values[:, 0], atol=1e-10)


def test_compute_utilities_lazy_two_rounds():
    """Two rounds of additive deltas: utility of S = Σ_rounds Σ_{j∈S∩p_r} v_rj
    with FedAvg ratios folded in. Equal data sizes + singleton checks."""
    n = 3
    v = np.array([[0.1, 0.2, 0.3], [0.05, 0.0, -0.1]])  # per-round per-client value
    sel = [[True, True, True], [True, False, True]]
    all_subsets = fs.all_subsets_enumeration(n)

    def eval_fn(W):
        # linear utility in the stacked (round*client) weights
        flat_v = v.reshape(-1)
        out = W @ flat_v
        return np.stack([out, -out], axis=1)

    deltas = [[object()] * n, [object() if sel[1][j] else None for j in range(n)]]
    utilities, utilities_dict = fs.compute_utilities_lazy(
        num_clients=n,
        previous_utility=[0.0, 0.0],
        client_deltas_all_rounds=deltas,
        client_selection_matrix=sel,
        num_local_data=[1.0, 1.0, 1.0],
        eval_coalitions_fn=eval_fn,
        all_subsets=all_subsets,
        utility_dim=2,
        current_round=1,
    )
    # singleton {0}: round0 ratio 1 -> 0.1; round1 participating -> +0.05
    np.testing.assert_allclose(utilities_dict[0][(0,)], 0.15, atol=1e-7)
    # singleton {1}: round1 not participating -> only 0.2
    np.testing.assert_allclose(utilities_dict[0][(1,)], 0.2, atol=1e-7)
    # pair {0,1}: round0 avg(0.1,0.2)=0.15; round1 only client0 ratio 1 -> +0.05
    np.testing.assert_allclose(utilities_dict[0][(0, 1)], 0.2, atol=1e-7)
    # include_from_round=1 drops round 0
    utilities2, ud2 = fs.compute_utilities_lazy(
        num_clients=n, previous_utility=[0.0, 0.0],
        client_deltas_all_rounds=deltas, client_selection_matrix=sel,
        num_local_data=[1.0, 1.0, 1.0], eval_coalitions_fn=eval_fn,
        all_subsets=all_subsets, utility_dim=2, current_round=1,
        include_from_round=1,
    )
    np.testing.assert_allclose(ud2[0][(0,)], 0.05, atol=1e-7)
    np.testing.assert_allclose(ud2[0][(1,)], 0.0, atol=1e-7)


def test_optimal_subset_selection():
    acc = {(0,): 0.1, (1,): 0.3, (0, 1): 0.5}
    loss = {(0,): 0.5, (1,): 0.2, (0, 1): 0.1}
    assert fs.get_optimal_subset(loss) == (0, 1)  # min loss
    best = fs.get_optimal_subset_multi_objectives([[acc], [loss]])
    assert best == (0, 1)  # max acc + min loss
    d = fs.get_selection_dict(4, [1, 3])
    assert d == {0: False, 1: True, 2: False, 3: True}


def test_gtg_modes_produce_identical_sv():
    """Streaming (default) and batch_prefixes GTG share the rng stream and
    truncation bookkeeping -> identical SVs."""
    values = np.array([[1.0, 0.2], [2.0, -0.1], [0.5, 0.4], [3.0, 0.0]])
    svs = []
    for batch in (False, True):
        game = TabularGame(additive_table(values), n_all=4)
        gtg = cm.GTG(utility_index=0, rng=np.random.default_rng(7),
                     batch_prefixes=batch)
        svs.append(sv_arr(gtg.compute_shapley_value(game, t=0), 4))
    np.testing.assert_allclose(svs[0], svs[1], atol=1e-12)


def test_gtg_incremental_convergence_matches_full_cumsum(additive4):
    """The O(last_k·N) incremental convergence accumulator must agree with
    the reference's full-cumsum recompute at every state, and the final SV
    must equal the running mean of the records."""
    game, values = additive4
    gtg = cm.GTG(utility_index=0, rng=np.random.default_rng(3))
    sv = gtg.compute_shapley_value(game, t=0)
    recs = np.asarray(gtg.Contribution_records)
    # final SV == mean of records (what the full cumsum's last row is)
    np.testing.assert_allclose(
        sv_arr(sv, 4), recs.mean(axis=0), atol=1e-12
    )
    # the trailing running means kept incrementally == recomputed cumsum tail
    full = np.cumsum(recs, 0) / np.arange(1, len(recs) + 1).reshape(-1, 1)
    np.testing.assert_allclose(
        np.asarray(gtg._mean_history), full[-len(gtg._mean_history):],
        atol=1e-10,
    )
    # the convergence decision agrees between the incremental path and the
    # reference fallback (which runs when _mean_history is absent)
    want = gtg.isnotconverge(len(recs))
    del gtg._mean_history
    assert gtg.isnotconverge(len(recs)) == want


def test_gtg_return_se_zero_on_additive(additive4):
    """On an additive game every permutation's marginal for client i is
    exactly v_i, so the analytic SE must be ~0; (sv, se) API shape."""
    game, values = additive4
    gtg = cm.GTG(utility_index=0, rng=np.random.default_rng(0))
    sv, se = gtg.compute_shapley_value(game, t=0, return_se=True)
    assert set(se) == {0, 1, 2, 3}
    assert all(v >= 0.0 for v in se.values())
    # additive ⇒ zero variance across permutations... except where GTG's
    # truncation freezes a tail (bounded by eps); allow that slack
    assert max(se.values()) <= gtg.eps
    assert gtg.SE_t[0] == se


def test_gtg_return_se_on_truncated_round():
    values = np.zeros((3, 2))
    game = TabularGame(additive_table(values), n_all=3)
    gtg = cm.GTG(utility_index=0, rng=np.random.default_rng(0))
    sv, se = gtg.compute_shapley_value(game, t=0, return_se=True)
    assert all(v == 0.0 for v in sv.values())
    assert all(v == 0.0 for v in se.values())


def test_fed_sv_bootstrap_se(additive4):
    """Bootstrap-over-draws SE: finite, nonnegative, efficiency preserved on
    the point estimate, and reproducible under the same rng."""
    game, values = additive4
    fsv = cm.Fed_SV(utility_index=0, rng=np.random.default_rng(0))
    fsv.CONVERGE_MIN_K = 50
    sv, se = fsv.compute_shapley_value(game, t=0, return_se=True, n_boot=20)
    arr = sv_arr(sv, 4)
    np.testing.assert_allclose(arr.sum(), values[:, 0].sum(), atol=1e-6)
    se_arr = sv_arr(se, 4)
    assert np.isfinite(se_arr).all() and (se_arr >= 0).all()
    # group-testing draws are genuinely noisy -> some spread must register
    assert se_arr.max() > 0
    assert fsv.SE_t[0] == se

    fsv2 = cm.Fed_SV(utility_index=0, rng=np.random.default_rng(0))
    fsv2.CONVERGE_MIN_K = 50
    sv2, se2 = fsv2.compute_shapley_value(game, t=0, return_se=True, n_boot=20)
    assert sv == sv2 and se == se2


def test_fed_sv_bounded_convergence_window(additive4):
    """The UD-snapshot window is a maxlen deque (the reference kept EVERY
    N×N copy); the MIN_K gate rides on the draw counter instead of len()."""
    from collections import deque

    game, values = additive4
    fsv = cm.Fed_SV(utility_index=0, rng=np.random.default_rng(0))
    UD = np.zeros((4, 4))
    win = deque(maxlen=fsv.last_k + 1)
    for _ in range(3):
        win.append(UD.copy())
    # below MIN_K by count -> not converged even with identical snapshots
    assert fsv.isnotconverge_Group(win, UD, k=5)
    # above MIN_K by count but window not yet filled -> still not converged
    assert fsv.isnotconverge_Group(win, UD, k=fsv.CONVERGE_MIN_K + 1)
    for _ in range(fsv.last_k):
        win.append(UD.copy())
    # full window of identical snapshots + enough draws -> converged
    assert not fsv.isnotconverge_Group(win, UD, k=fsv.CONVERGE_MIN_K + 1)
    # len()-based fallback (no k): reference semantics preserved
    assert fsv.isnotconverge_Group(win, UD)
