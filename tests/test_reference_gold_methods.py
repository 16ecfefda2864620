"""Gold parity oracles for the comparison estimators and MILP selection:
execute the REFERENCE'S OWN code (`/root/reference`) against ours.

`tests/test_reference_gold.py` proves the live path (game + exact +
comp-contrib through `start()`) against the reference's own code. This
module extends the executed-oracle coverage to every other estimator family
the reference ships, on a shared tabulated game (zero model evals — the
algorithms are host math, so the oracle is cheap):

  * `MR` / `TMR` (compared_methods.py:354-432) — deterministic, exact match;
  * `GTG` (compared_methods.py:251-346) — the global `np.random` stream is
    pinned and mirrored into our explicit-rng GTG; identical draws, identical
    truncation bookkeeping, identical convergence stop → identical SVs (both
    streaming and `batch_prefixes` modes);
  * `Fed_SV` (compared_methods.py:106-243) — draws mirrored the same way at
    a fixed draw count; the reference's group-testing UD update indexes
    membership of clients ``i+1``/``j+1`` (`S.count(i+1)`,
    compared_methods.py:~175) — an off-by-one we deliberately fixed
    (PARITY.md), so the executed-oracle assertion is the documented shift:
    ``ref_UD[:-1, :-1] == our_UD[1:, 1:]`` (client 0 never influences the
    reference's UD; its phantom client N always counts 0);
  * `shapley_monte_carlo` (utils_shapley.py:248-269) — the reference
    repeatedly in-place shuffles ONE index list; a replay rng reproduces that
    exact permutation sequence for our estimator;
  * `comfedsv` / `call_comfedsv` / `roundly_mask` (compared_methods.py:17-75)
    — deterministic, exact match;
  * `MILP_Shapley` / `_Two_Sided` / `_Two_Sided_Approx` (milp.py:8-305) and
    `MILP_Shapley_prev` + `binary_search`
    (_test_milp_formulation.py:7-161) — same selection matrices, same
    optimum (objective equality; selection equality where the optimum is
    unique by construction);
  * the multi-round module's host scorers and selection helpers
    (utils_fed_shapley.py:29-91, 253-331) — exact match for
    `compute_shapley_value_from_matrix` / `roundly_mask` /
    `get_selection_dict` / both `get_optimal_subset*`; the
    baseline/groundtruth scorers match modulo the reference's documented
    missing empty-set marginal (its `powerset` excludes ∅,
    utils_shapley.py:143, so the `u({i}) − u(∅)` term never enters — ours
    adds it and satisfies efficiency); the per-round scorers
    (utils_fed_shapley.py:214/227) are executed to prove they raise
    `NameError` on the undefined `compute_shapley_corrected` the reference
    never defines — our implementation of the documented intent is
    cross-checked against the corrected closed form.

Environment shims (the reference code runs UNMODIFIED): `torchvision` and
`wolframclient` are stubbed (neither is in this image; wolframclient is only
TOUCHED at Fed_SV.solveFeasible, which we intercept to capture UD — the
sampling/UD loop under test never reaches Wolfram), `np.math` is restored,
and `/root/reference/shapleyserver` joins sys.path so the reference's
v1-style absolute imports (`from fed_client_contribution...`,
compared_methods.py:9) resolve.
"""

import math
import os
import sys
import types
from itertools import combinations

import numpy as np
import pytest

from shapley_vit_tpu.shapley import compared_methods as our_cm
from shapley_vit_tpu.shapley import estimators as our_est
from shapley_vit_tpu.shapley import fed_shapley as our_fs
from shapley_vit_tpu.shapley import milp as our_milp
from shapley_vit_tpu.shapley.game import TabularGame

pytestmark = pytest.mark.slow

REFERENCE_ROOT = "/root/reference"

_N = 5
_DIM = 2
_GTG_SEED = 424242
_FSV_SEED = 171717
_MC_SEED = 313131


# ---------------------------------------------------------------------------
# reference import (stubs: torchvision, wolframclient; np.math restored)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ref():
    if not os.path.isdir(os.path.join(REFERENCE_ROOT, "shapleyserver")):
        pytest.skip("reference tree not available")
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.datasets = types.ModuleType("torchvision.datasets")
        tv.transforms = types.ModuleType("torchvision.transforms")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.datasets"] = tv.datasets
        sys.modules["torchvision.transforms"] = tv.transforms
    if "wolframclient" not in sys.modules:
        wc = types.ModuleType("wolframclient")
        lang = types.ModuleType("wolframclient.language")
        lang.wlexpr = lambda expr: expr
        ev = types.ModuleType("wolframclient.evaluation")

        class _NoWolfram:
            def __init__(self, *a, **k):
                raise RuntimeError("wolframclient stub: no kernel in image")

        ev.WolframLanguageSession = _NoWolfram
        ev.SecuredAuthenticationKey = _NoWolfram
        ev.WolframCloudSession = _NoWolfram
        wc.language = lang
        wc.evaluation = ev
        sys.modules["wolframclient"] = wc
        sys.modules["wolframclient.language"] = lang
        sys.modules["wolframclient.evaluation"] = ev
    for p in (REFERENCE_ROOT, os.path.join(REFERENCE_ROOT, "shapleyserver")):
        if p not in sys.path:
            sys.path.insert(0, p)
    if not hasattr(np, "math"):
        np.math = math

    from shapleyserver.fed_client_contribution import (
        _test_milp_formulation as ref_milp_prev,
    )
    from shapleyserver.fed_client_contribution import compared_methods as ref_cm
    from shapleyserver.fed_client_contribution import milp as ref_milp
    from shapleyserver.fed_client_contribution import utils_shapley as ref_us

    return types.SimpleNamespace(
        cm=ref_cm, milp=ref_milp, milp_prev=ref_milp_prev, us=ref_us
    )


# ---------------------------------------------------------------------------
# shared fixtures: one utility table driving both sides
# ---------------------------------------------------------------------------

def _make_table(n=_N, dim=_DIM, seed=7, scale=1.0):
    """Reproducible non-additive game: per-client values + pairwise
    interactions + per-coalition noise, one independent draw per dim."""
    rng = np.random.default_rng(seed)
    v = rng.normal(0.3, 0.2, size=(dim, n))
    pair = rng.normal(0.0, 0.08, size=(dim, n, n))
    table = {frozenset(): [0.0] * dim}
    for r in range(1, n + 1):
        for c in combinations(range(n), r):
            row = []
            for d in range(dim):
                u = float(sum(v[d][i] for i in c))
                u += float(
                    sum(pair[d][i][j] for i in c for j in c if i < j)
                )
                u += float(rng.normal(0.0, 0.01))
                row.append(u * scale)
            table[frozenset(c)] = row
    return table


class _RefTabularGame:
    """The minimal game surface the reference estimators consume
    (selected_clients / _n_all / n / utility_dim / eval_utility /
    default_shapley_value), over the SAME table our TabularGame reads."""

    def __init__(self, table, n=_N, dim=_DIM):
        self._table = {frozenset(k): list(v) for k, v in table.items()}
        self.selected_clients = list(range(n))  # ref MC shuffles in place
        self._n_all = n
        self.n = n
        self.utility_dim = dim

    @property
    def default_shapley_value(self):
        return [
            {i: 0.0 for i in range(self._n_all)} for _ in range(self.utility_dim)
        ]

    def eval_utility(self, coalition):
        key = frozenset(int(i) for i in coalition)
        if not key:
            return [0.0] * self.utility_dim
        return list(self._table[key])


class _LegacyRng:
    """np.random.Generator-shaped facade over a seeded legacy RandomState:
    seeding the GLOBAL `np.random.seed(s)` for the reference and handing our
    estimator `_LegacyRng(s)` consumes the identical MT19937 stream (the
    reference draws via the global `np.random.permutation`/`choice`,
    compared_methods.py:~300/~144)."""

    def __init__(self, seed):
        self.rs = np.random.RandomState(seed)

    def permutation(self, x):
        return self.rs.permutation(x)

    def choice(self, a, size=None, replace=True, p=None):
        return self.rs.choice(a, size=size, replace=replace, p=p)

    def integers(self, *a, **k):
        return self.rs.randint(*a, **k)


class _ShuffleReplayRng:
    """Replays the reference MC's draw semantics: `shapley_monte_carlo`
    in-place shuffles ONE persistent index list per permutation
    (utils_shapley.py:257), so permutation t is a shuffle OF permutation
    t-1 — not of the original order."""

    def __init__(self, seed, n):
        self.rs = np.random.RandomState(seed)
        self._state = np.arange(n)

    def permutation(self, x):
        self.rs.shuffle(self._state)
        return self._state.copy()


def _games(table, n=_N, dim=_DIM):
    return _RefTabularGame(table, n, dim), TabularGame(table, n_all=n, utility_dim=dim)


def _sv_close(ours, theirs, atol=1e-12):
    assert set(ours) == set(theirs)
    for k in ours:
        np.testing.assert_allclose(ours[k], theirs[k], atol=atol)


# ---------------------------------------------------------------------------
# MR / TMR — deterministic
# ---------------------------------------------------------------------------

def test_mr_tmr_match_reference_own_code(ref):
    table = _make_table()
    for dim_idx in range(_DIM):
        ref_game, our_game = _games(table)
        ref_sv = ref.cm.MR(dim_idx).compute_shapley_value(ref_game, t=0)
        our_sv = our_cm.MR(dim_idx).compute_shapley_value(our_game, t=0)
        _sv_close(our_sv, ref_sv)

        ref_game, our_game = _games(table)
        ref_sv = ref.cm.TMR(dim_idx).compute_shapley_value(ref_game, t=0)
        our_sv = our_cm.TMR(dim_idx).compute_shapley_value(our_game, t=0)
        _sv_close(our_sv, ref_sv)


def test_tmr_round_truncation_matches_reference(ref):
    # scale the whole game inside the 0.01 truncation window: both sides must
    # return the all-zeros round (compared_methods.py:418-421)
    table = _make_table(scale=1e-3)
    ref_game, our_game = _games(table)
    ref_sv = ref.cm.TMR(0).compute_shapley_value(ref_game, t=0)
    our_sv = our_cm.TMR(0).compute_shapley_value(our_game, t=0)
    assert all(v == 0 for v in ref_sv.values())
    _sv_close(our_sv, ref_sv)


# ---------------------------------------------------------------------------
# GTG — mirrored global-np.random stream
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("batch_prefixes", [False, True])
def test_gtg_matches_reference_own_code(ref, batch_prefixes):
    table = _make_table()
    ref_game, our_game = _games(table)

    np.random.seed(_GTG_SEED)
    ref_sv = ref.cm.GTG(utility_index=0).compute_shapley_value(ref_game, t=0)

    ours = our_cm.GTG(
        utility_index=0,
        rng=_LegacyRng(_GTG_SEED),
        batch_prefixes=batch_prefixes,
    )
    our_sv = ours.compute_shapley_value(our_game, t=0)
    _sv_close(our_sv, ref_sv, atol=1e-12)
    # identical draws + identical truncation implies the convergence stop
    # matched too: same number of contribution records
    assert len(ours.Contribution_records) % _N == 0


def test_gtg_round_truncation_matches_reference(ref):
    table = _make_table(scale=1e-3)
    ref_game, our_game = _games(table)
    np.random.seed(_GTG_SEED)
    ref_sv = ref.cm.GTG(utility_index=0).compute_shapley_value(ref_game, t=0)
    our_sv = our_cm.GTG(utility_index=0, rng=_LegacyRng(_GTG_SEED)).compute_shapley_value(
        our_game, t=0
    )
    assert all(v == 0 for v in ref_sv.values())
    _sv_close(our_sv, ref_sv)


# ---------------------------------------------------------------------------
# Fed_SV — mirrored draws; UD equal modulo the documented off-by-one
# ---------------------------------------------------------------------------

def test_fed_sv_ud_matches_reference_modulo_documented_off_by_one(ref):
    K = 120  # fixed draw count on both sides (convergence checks disabled)
    table = _make_table()
    ref_game, our_game = _games(table)

    captured = {}

    ref_fsv = ref.cm.Fed_SV(utility_index=0)
    ref_fsv.CONVERGE_MIN_K = K
    ref_fsv.isnotconverge_Group = lambda last_uds, UD: False

    def _ref_capture(N, u_N, UD):
        captured["ref_ud"] = np.array(UD, copy=True)
        captured["ref_u_N"] = u_N
        return [0.0] * N

    ref_fsv.solveFeasible = _ref_capture
    np.random.seed(_FSV_SEED)
    ref_fsv.compute_shapley_value(ref_game, t=0)

    our_fsv = our_cm.Fed_SV(utility_index=0, rng=_LegacyRng(_FSV_SEED))
    our_fsv.CONVERGE_MIN_K = K
    our_fsv.isnotconverge_Group = lambda last_uds, UD, k=None: False

    def _our_capture(N, u_N, UD):
        captured["our_ud"] = np.array(UD, copy=True)
        captured["our_u_N"] = u_N
        return np.zeros(N)

    our_fsv.solve_feasible = _our_capture
    our_fsv.compute_shapley_value(our_game, t=0)

    assert captured["ref_u_N"] == captured["our_u_N"]
    ref_ud, our_ud = captured["ref_ud"], captured["our_ud"]
    # the reference indexes membership of client i+1 (S.count(i+1),
    # compared_methods.py:~175): its UD[i, j] is our UD[i+1, j+1]; its last
    # row/col track a phantom client N that is never a member
    np.testing.assert_allclose(ref_ud[:-1, :-1], our_ud[1:, 1:], atol=2e-5)
    # phantom row: ref_UD[N-1, j] = Z·(0 − a_{j+1}) = −our_UD-row equivalent;
    # verified through the first real column: ref[N-1, 0] == −ref[0, N-1]
    np.testing.assert_allclose(ref_ud[-1, :-1], -ref_ud[:-1, -1], atol=2e-5)


# ---------------------------------------------------------------------------
# permutation Monte-Carlo — replayed in-place shuffle stream
# ---------------------------------------------------------------------------

def test_perm_mc_matches_reference_own_code(ref):
    m = 40
    table = _make_table()
    ref_game, our_game = _games(table)

    real_rs = np.random.RandomState
    np.random.RandomState = lambda seed=None: real_rs(_MC_SEED)
    try:
        ref_sv = ref.us.shapley_monte_carlo(ref_game, m)
    finally:
        np.random.RandomState = real_rs

    our_sv = our_est.shapley_monte_carlo(
        our_game, m, rng=_ShuffleReplayRng(_MC_SEED, _N)
    )
    for d in range(_DIM):
        _sv_close(our_sv[d], ref_sv[d], atol=1e-12)


# ---------------------------------------------------------------------------
# ComFedSV — deterministic
# ---------------------------------------------------------------------------

def test_comfedsv_matches_reference_own_code(ref):
    T = 4
    all_subsets = ref.us.powerset(range(_N))  # {tuple: idx}, the ref's own enum
    rng = np.random.default_rng(11)
    utility_matrix = [rng.normal(size=len(all_subsets)) for _ in range(T)]
    args = types.SimpleNamespace(rounds=T, num_clients=_N)

    ref_sv, _ = ref.cm.comfedsv(args, utility_matrix, all_subsets)
    our_sv, _ = our_cm.comfedsv(args, utility_matrix, all_subsets)
    assert len(ref_sv) == len(our_sv) == T
    for t in range(T):
        _sv_close(our_sv[t], ref_sv[t])


def test_call_comfedsv_matches_reference_own_code(ref):
    table = _make_table()
    ref_game, our_game = _games(table)
    all_subsets = ref.us.powerset(range(_N))

    ref_utils, ref_mask = ref.cm.call_comfedsv(ref_game, all_subsets, None)
    our_utils, our_mask = our_cm.call_comfedsv(our_game, all_subsets)
    np.testing.assert_array_equal(ref_mask, our_mask)
    for d in range(_DIM):
        np.testing.assert_allclose(our_utils[d], ref_utils[d], atol=1e-12)


# ---------------------------------------------------------------------------
# MILP round selection — same matrices, same optimum
# ---------------------------------------------------------------------------

def _selection_matrix(T=12, N=5, seed=3):
    rng = np.random.default_rng(seed)
    while True:
        m = (rng.random((T, N)) < 0.5).astype(float)
        if (m.sum(axis=0) > 0).all() and (m.sum(axis=1) > 0).all():
            return m


def test_milp_shapley_matches_reference_own_code(ref):
    mat = _selection_matrix()
    w = np.random.default_rng(5).random(mat.shape[0])
    w = w / w.sum()  # random weights -> unique optimum (top-k_max rounds)
    for k_max in (3, 6):
        ro, rf, rx = ref.milp.MILP_Shapley(
            mat, max_shapley_computation=k_max, gamma=0.4, weight_epochs=w
        ).solve()
        oo, of, ox = our_milp.MILP_Shapley(
            mat, max_shapley_computation=k_max, gamma=0.4, weight_epochs=w
        ).solve()
        assert ro and oo
        np.testing.assert_allclose(of, rf, atol=1e-9)
        np.testing.assert_allclose(ox, rx, atol=1e-9)


def test_milp_two_sided_variants_match_reference_objective(ref):
    mat = _selection_matrix(seed=9)
    for RefCls, OurCls in (
        (ref.milp.MILP_Shapley_Two_Sided, our_milp.MILP_Shapley_Two_Sided),
        (
            ref.milp.MILP_Shapley_Two_Sided_Approx,
            our_milp.MILP_Shapley_Two_Sided_Approx,
        ),
    ):
        ro, rf, rx = RefCls(mat, max_shapley_computation=4, gamma=0.5).solve()
        oo, of, ox = OurCls(mat, max_shapley_computation=4, gamma=0.5).solve()
        assert ro and oo
        np.testing.assert_allclose(of, rf, atol=1e-9)


def test_milp_prev_and_binary_search_match_reference(ref):
    mat = _selection_matrix(T=10, N=4, seed=21)
    for k in (1, 2):
        ro, rf, rx = ref.milp_prev.MILP_Shapley_prev(mat, k).solve()
        oo, of, ox = our_milp.MILP_Shapley_prev(mat, k).solve()
        assert ro == oo
        if ro:
            np.testing.assert_allclose(of, rf, atol=1e-9)

    ref_x = ref.milp_prev.binary_search(mat)
    our_x = our_milp.binary_search(mat)
    assert (ref_x is None) == (our_x is None)
    if ref_x is not None:
        # equal best feasible coverage and equal round budget (the solution
        # vector itself may differ between equally-optimal vertices)
        ref_cov = (np.asarray(ref_x) @ mat).min()
        our_cov = (np.asarray(our_x) @ mat).min()
        assert ref_cov == our_cov
        assert np.asarray(ref_x).sum() == pytest.approx(np.asarray(our_x).sum())


# ---------------------------------------------------------------------------
# multi-round module (utils_fed_shapley) — host scorers + selection helpers
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ref_fed(ref):
    """The reference's multi-round module (imports federated_learning.utils
    → torch/sklearn/matplotlib, all present; torchvision stubbed by `ref`)."""
    from shapleyserver.fed_client_contribution import utils_fed_shapley as ufs

    return ufs


def _utility_dict(n, seed=23):
    """{sorted tuple: float} over the reference's own (∅-free) enumeration."""
    rng = np.random.default_rng(seed)
    return {s: float(rng.normal()) for s in our_est.powerset(range(n))}


def test_fed_baseline_scorer_matches_reference_plus_empty_marginal(ref, ref_fed):
    """compute_shapley_value_baseline (utils_fed_shapley.py:29-41): the
    reference's inner sum runs over NON-empty subsets only (powerset drops ∅,
    utils_shapley.py:143), silently omitting every client's
    `u({i}) − u(∅)` marginal. Ours adds it (u(∅)=0 by the delta-utility
    convention), so ours == reference + u({i})/N — and ours, not the
    reference, satisfies efficiency (Σφ = u(grand))."""
    n = _N
    ud = _utility_dict(n)
    args = types.SimpleNamespace(num_clients=n, num_users=n)

    # all clients participate
    ref_sv = ref_fed.compute_shapley_value_baseline(args, ud, list(range(n)))
    our_sv = our_fs.compute_shapley_value_baseline(n, ud, list(range(n)))
    correction = np.array([ud[(i,)] / n for i in range(n)])
    np.testing.assert_allclose(our_sv, ref_sv + correction, atol=1e-12)
    np.testing.assert_allclose(our_sv.sum(), ud[tuple(range(n))], atol=1e-12)
    assert abs(ref_sv.sum() - ud[tuple(range(n))]) > 1e-6  # ref breaks efficiency

    # groundtruth is the same formula over range(num_users)
    ref_gt = ref_fed.compute_shapley_value_groundtruth(args, ud)
    np.testing.assert_allclose(ref_gt, ref_sv, atol=1e-12)

    # participating subset: correction applies only to members, scaled 1/|S|
    idxs = [0, 2, 3]
    ref_sub = ref_fed.compute_shapley_value_baseline(args, ud, idxs)
    our_sub = our_fs.compute_shapley_value_baseline(n, ud, idxs)
    corr = np.zeros(n)
    for i in idxs:
        corr[i] = ud[(i,)] / len(idxs)
    np.testing.assert_allclose(our_sub, ref_sub + corr, atol=1e-12)


def test_fed_matrix_sv_matches_reference_own_code(ref, ref_fed):
    """compute_shapley_value_from_matrix (utils_fed_shapley.py:71-90) —
    deterministic, exact match (both sides mirror the reference's ∅-free
    subset walk; ComFedSV's completed matrix carries no empty column)."""
    T, n = 3, _N
    all_subsets = ref.us.powerset(range(n))
    rng = np.random.default_rng(31)
    mat = rng.normal(size=(T, len(all_subsets)))
    args = types.SimpleNamespace(epochs=T, num_users=n)

    ref_sv = ref_fed.compute_shapley_value_from_matrix(args, mat, all_subsets)
    our_sv = our_fs.compute_shapley_value_from_matrix(T, n, mat, all_subsets)
    np.testing.assert_allclose(our_sv, ref_sv, atol=1e-12)


def test_fed_roundly_mask_matches_reference_own_code(ref, ref_fed):
    """roundly_mask (utils_fed_shapley.py:61-67; identical twin at
    compared_methods.py:64-70 — ours lives in compared_methods and is
    re-exported)."""
    all_subsets = ref.us.powerset(range(_N))
    for idxs in ([0, 1], [1, 3, 4], list(range(_N))):
        ref_mask = ref_fed.roundly_mask(idxs, all_subsets)
        our_mask = our_fs.roundly_mask(idxs, all_subsets)
        np.testing.assert_array_equal(our_mask, ref_mask)


def test_reference_per_round_scorers_are_dead_ours_implement_intent(ref_fed):
    """The reference's per-round scorers call `compute_shapley_corrected`
    which is DEFINED NOWHERE in its tree (utils_fed_shapley.py:214/227/239
    — executing them proves the module is dead code). Ours implements the
    documented intent; cross-checked against the corrected closed form
    (the baseline scorer over the participating set)."""
    n = _N
    ud = _utility_dict(n, seed=47)
    args = types.SimpleNamespace(rounds=1, num_clients=n)

    with pytest.raises(NameError):
        ref_fed.compute_shapley_value_lazy_approach(args, [ud])
    with pytest.raises(NameError):
        ref_fed.compute_shapley_value_for_participating_clients(
            args, [ud], np.ones((1, n)), False
        )

    per_round = our_fs.compute_shapley_value_lazy_approach(n, [ud])
    closed = our_fs.compute_shapley_value_baseline(n, ud, list(range(n)))
    assert len(per_round) == 1
    for i in range(n):
        np.testing.assert_allclose(per_round[0][i], closed[i], atol=1e-12)

    # participating-subset path: mask row restricts the formula's support
    idxs = [1, 2, 4]
    mask = np.zeros((1, n))
    mask[0, idxs] = 1
    sub_ud = {s: u for s, u in ud.items() if set(s) <= set(idxs)}
    per_round = our_fs.compute_shapley_value_for_participating_clients(
        1, n, [sub_ud], mask, shapley_non_participating_clients=False
    )
    closed = our_fs.compute_shapley_value_baseline(n, sub_ud, idxs)
    assert set(per_round[0]) == set(idxs)
    for i in idxs:
        np.testing.assert_allclose(per_round[0][i], closed[i], atol=1e-12)


class _StubClient:
    """Minimal client surface get_optimal_subset* touches: deepcopy +
    sync_with_server (utils_fed_shapley.py:271-276)."""

    def __init__(self, cid):
        self.cid = cid
        self.synced = False

    def sync_with_server(self, server):
        self.synced = True


def test_get_selection_dict_and_optimal_subset_match_reference(ref_fed):
    """get_selection_dict (utils_fed_shapley.py:253-259) and
    get_optimal_subset (262-278; selection core = min-utility key — the
    loss-delta dims are lower-is-better)."""
    n = _N
    assert ref_fed.get_selection_dict(n, [1, 3]) == our_fs.get_selection_dict(
        n, [1, 3]
    )

    ud = _utility_dict(n, seed=55)
    clients = [_StubClient(i) for i in range(n)]
    server = object()
    ref_sel, ref_key = ref_fed.get_optimal_subset(server, clients, ud, [0, 1, 2])
    our_key = our_fs.get_optimal_subset(ud)
    assert our_key == ref_key
    assert [c.cid for c in ref_sel] == list(ref_key)


def test_get_optimal_subset_multi_objectives_matches_reference(ref_fed):
    """get_optimal_subset_multi_objectives (utils_fed_shapley.py:281-331):
    last-round acc/loss dicts, min-max normalized, acc − loss, argmax key.
    Exercises both the generic branch and the degenerate max==min branch."""
    n = _N
    acc = _utility_dict(n, seed=61)
    loss = _utility_dict(n, seed=62)
    clients = [_StubClient(i) for i in range(n)]
    server = object()

    udl = [[acc], [loss]]  # [dim][round]{subset: u} — last round scored
    ref_sel, ref_key = ref_fed.get_optimal_subset_multi_objectives(
        server, clients, udl, [0, 1]
    )
    our_key = our_fs.get_optimal_subset_multi_objectives(udl)
    assert our_key == ref_key
    assert [c.cid for c in ref_sel] == list(ref_key)

    # degenerate acc dim (all equal): both sides take the +1 branch and the
    # decision falls to the loss dim alone
    flat_acc = {s: 0.5 for s in acc}
    udl = [[flat_acc], [loss]]
    _, ref_key = ref_fed.get_optimal_subset_multi_objectives(
        server, clients, udl, [0, 1]
    )
    assert our_fs.get_optimal_subset_multi_objectives(udl) == ref_key
