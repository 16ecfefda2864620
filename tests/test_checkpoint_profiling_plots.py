"""Tests: orbax pytree checkpoints, resumable utility tables, profiling
spans, plot helpers, and the cent_sgd baseline end-to-end."""

import os

import numpy as np
import pytest

from shapley_vit_tpu.fl import checkpoint as ckpt
from shapley_vit_tpu.shapley import TabularGame, shapley_exact
from shapley_vit_tpu.shapley.game import additive_table
from shapley_vit_tpu.utils.profiling import StepTimer, trace
from shapley_vit_tpu.utils import plots


def test_orbax_pytree_roundtrip(tmp_path, rng):
    tree = {"a": rng.normal(size=(4, 3)).astype(np.float32),
            "nested": {"b": np.arange(5)}}
    path = str(tmp_path / "ckpt")
    ckpt.save_pytree(path, tree)
    back = ckpt.load_pytree(path)
    np.testing.assert_allclose(back["a"], tree["a"])
    np.testing.assert_array_equal(back["nested"]["b"], tree["nested"]["b"])
    # overwrite works (force=True)
    ckpt.save_pytree(path, {"a": np.zeros(2)})
    assert ckpt.load_pytree(path)["a"].shape == (2,)


def test_utility_table_roundtrip(tmp_path):
    table = {frozenset({0, 2}): [0.1, -0.5], frozenset({1}): [0.0, 1.0]}
    path = str(tmp_path / "util.npz")
    ckpt.save_utility_table(path, table)
    back, fp = ckpt.load_utility_table(path)
    assert fp is None
    assert back.keys() == table.keys()
    np.testing.assert_allclose(back[frozenset({0, 2})], [0.1, -0.5])
    # missing file -> empty
    assert ckpt.load_utility_table(str(tmp_path / "nope.npz")) == ({}, None)


def test_resume_game_skips_reevaluation(tmp_path):
    values = np.array([[1.0, 0.0], [2.0, 0.5], [3.0, -1.0]])
    game1 = TabularGame(additive_table(values), n_all=3)
    path = str(tmp_path / "util.npz")
    ckpt.checkpointed_game(game1, path)
    sv1 = shapley_exact(game1)
    assert game1.num_evaluations == 7
    # small rounds live in the append log until the consolidation
    # threshold; either file is durable state
    assert os.path.exists(path) or os.path.exists(path + ".log")

    # fresh game resumed from disk: zero evaluations needed
    game2 = TabularGame(additive_table(values), n_all=3)
    restored = ckpt.resume_game(game2, path)
    assert restored == 7
    sv2 = shapley_exact(game2)
    assert game2.num_evaluations == 0
    for d in range(2):
        for c in range(3):
            assert sv1[d][c] == pytest.approx(sv2[d][c])


def test_step_timer_spans_and_throughput():
    t = StepTimer()
    for _ in range(3):
        with t.span("work"):
            sum(range(1000))
    t.count("items", 30)
    s = t.summary()
    assert s["work"]["count"] == 3 and s["work"]["total_s"] > 0
    assert s["items"]["count"] == 30
    assert t.throughput("work", 300) > 0


def test_trace_noop_without_dir():
    with trace(None):
        pass  # must not raise or start a profiler


def test_plot_series_and_bands(tmp_path, rng):
    import pandas as pd

    p1 = str(tmp_path / "s.png")
    plots.plot_series([0.1, 0.5, 0.7], title="acc", save=True, save_path=p1)
    assert os.path.getsize(p1) > 0

    p2 = str(tmp_path / "m.png")
    plots.plot_series_mul([[0.1, 0.2], [0.3, 0.4]], save=True, save_path=p2)
    assert os.path.getsize(p2) > 0

    np.testing.assert_array_equal(
        plots.monotone_curve([0.1, 0.3, 0.2, 0.5]), [0.1, 0.3, 0.3, 0.5]
    )

    df = pd.DataFrame({
        "epoch": [0, 0, 1, 1] * 2,
        "acc": rng.random(8),
        "method": ["a"] * 4 + ["b"] * 4,
    })
    agg = plots.mean_std_df(df, ["method", "epoch"], ["acc"])
    assert "acc_mean" in agg.columns and "acc_std" in agg.columns
    p3 = str(tmp_path / "band.png")
    plots.nice_plot(df, "epoch", "acc", group_by="method", save_path=p3)
    assert os.path.getsize(p3) > 0
    p4 = str(tmp_path / "bar.png")
    plots.nice_bar(df, "epoch", "acc", group_by="method", save_path=p4)
    assert os.path.getsize(p4) > 0
    p5 = str(tmp_path / "multi.png")
    df2 = pd.DataFrame({"epoch": [0, 1, 0, 1], "acc": rng.random(4), "auc": rng.random(4)})
    plots.nice_plot_multi_columns(df2, "epoch", ["acc", "auc"], save_path=p5)
    assert os.path.getsize(p5) > 0


def test_client_histogram(tmp_path, rng):
    labels = rng.integers(0, 4, 100)
    idcs = {0: list(range(50)), 1: list(range(50, 100))}
    p = str(tmp_path / "hist.png")
    plots.plot_client_histogram(labels, idcs, 4, save_path=p)
    assert os.path.getsize(p) > 0


def test_cent_sgd_end_to_end(tmp_path):
    """Mini cent_sgd run: MLP on synthetic mnist, 1 experiment, 2 epochs."""
    from shapley_vit_tpu.driver import cent_sgd

    args = cent_sgd.argparser().parse_args([
        "--dataset", "mnist", "--model", "MLP", "--num_exp", "1",
        "--epoch_train", "2", "--batch_train", "64", "--lr", "0.05",
        "--save_root", str(tmp_path / "result"), "--save_curves",
    ])
    args = cent_sgd.set_path(args)
    summary = cent_sgd.main(args)
    assert 0.0 <= summary["acc_mean"] <= 1.0
    out = args.save_path
    assert os.path.exists(os.path.join(out, "summary.json"))
    assert os.path.exists(os.path.join(out, "curves.npz"))
    assert os.path.exists(os.path.join(out, "checkpoint_exp0.npz"))
    assert os.path.exists(os.path.join(out, "acc.png"))
    # exp_seq.txt bookkeeping increments (cent_sgd.py:46-63)
    with open(os.path.join(str(tmp_path / "result"), "exp_seq.txt")) as f:
        assert f.read() == "0"
    args2 = cent_sgd.set_path(cent_sgd.argparser().parse_args(
        ["--save_root", str(tmp_path / "result")]
    ))
    assert args2.exp_seq == "1"


def test_nice_plot_backend_gating():
    """plotly is absent in this image: backend='auto' must fall back to
    matplotlib, backend='plotly' must raise, 'matplotlib' always works."""
    import pandas as pd
    import pytest as _pytest

    from shapley_vit_tpu.utils import plots

    df = pd.DataFrame(
        {"epoch": [0, 0, 1, 1], "acc": [0.1, 0.2, 0.3, 0.4], "run": [0, 1, 0, 1]}
    )
    has_plotly = plots._plotly() is not None
    fig = plots.nice_plot(df, "epoch", "acc", backend="auto")
    assert fig is not None
    fig2 = plots.nice_plot(df, "epoch", "acc", backend="matplotlib")
    assert type(fig2).__module__.startswith("matplotlib")
    if not has_plotly:
        with _pytest.raises(ImportError):
            plots.nice_plot(df, "epoch", "acc", backend="plotly")


def test_plotly_error_band_figure_with_stub(monkeypatch):
    """Exercise the plotly figure-building logic with a stub go module (no
    plotly in this image): per group one mean trace + one band trace, band
    suppressed when std is all-NaN."""
    import pandas as pd

    from shapley_vit_tpu.utils import plots

    class StubScatter:
        def __init__(self, **kw):
            self.kw = kw

    class StubFigure:
        def __init__(self):
            self.traces = []
            self.layout = {}

        def add_trace(self, t):
            self.traces.append(t)

        def update_layout(self, **kw):
            self.layout.update(kw)

    class StubGo:
        Scatter = StubScatter
        Figure = StubFigure

    # two seeds per (group, epoch) so the per-group std is defined
    df = pd.DataFrame(
        {
            "epoch": [0, 0, 1, 1] * 2,
            "acc": [0.1, 0.15, 0.3, 0.35, 0.2, 0.25, 0.4, 0.45],
            "run": ["a"] * 4 + ["b"] * 4,
        }
    )
    monkeypatch.setattr(plots, "_plotly", lambda: StubGo)
    fig = plots.nice_plot(df, "epoch", "acc", group_by="run", backend="plotly")
    # two groups x (mean + band) = 4 traces
    assert len(fig.traces) == 4
    assert fig.layout["xaxis_title"] == "epoch"
    band = fig.traces[1].kw
    assert band["fill"] == "toself" and band["showlegend"] is False

    fig2 = plots.nice_plot(df, "epoch", "acc", group_by="run",
                           error_band=False, backend="plotly")
    assert len(fig2.traces) == 2  # bands suppressed


def test_resume_game_rejects_stale_fingerprint(tmp_path):
    """A table stamped for different round inputs must be ignored — mixing
    stale and fresh utilities would corrupt the round's Shapley values."""
    values = np.array([[1.0, 0.0], [2.0, 0.5], [3.0, -1.0]])
    game1 = TabularGame(additive_table(values), n_all=3)
    path = str(tmp_path / "util.npz")
    ckpt.checkpointed_game(game1, path, fingerprint="inputs-v1")
    shapley_exact(game1)

    # same fingerprint -> resumes
    game2 = TabularGame(additive_table(values), n_all=3)
    assert ckpt.resume_game(game2, path, fingerprint="inputs-v1") == 7
    # different fingerprint -> rejected, no memo seeding
    game3 = TabularGame(additive_table(values), n_all=3)
    assert ckpt.resume_game(game3, path, fingerprint="inputs-v2") == 0
    assert game3.utility == {}
    # caller without a fingerprint accepts any table (legacy/hand-staged)
    game4 = TabularGame(additive_table(values), n_all=3)
    assert ckpt.resume_game(game4, path) == 7


def test_fingerprint_inputs_sensitivity():
    import jax

    t1 = {"a": np.ones((4, 4), np.float32)}
    t2 = {"a": np.ones((4, 4), np.float32)}
    assert ckpt.fingerprint_inputs(t1) == ckpt.fingerprint_inputs(t2)
    t2["a"] = t2["a"].copy()
    t2["a"][0, 0] = 2.0
    assert ckpt.fingerprint_inputs(t1) != ckpt.fingerprint_inputs(t2)
    assert ckpt.fingerprint_inputs(t1, extra=(1,)) != ckpt.fingerprint_inputs(
        t1, extra=(2,)
    )
    # big leaves: head/tail/sum sampling still catches interior edits
    big = {"w": np.zeros((600, 600), np.float32)}
    fp0 = ckpt.fingerprint_inputs(big)
    big["w"][300, 300] = 1e-3
    assert ckpt.fingerprint_inputs(big) != fp0


def test_fingerprint_detects_row_permutation():
    """A head+tail+total-sum digest collides when client rows of a stacked
    delta leaf are permuted (the exact staleness scenario the fingerprint
    guards); the strided-sample + per-row-sum digest must not."""
    a = np.random.default_rng(0).normal(size=(4, 2048)).astype(np.float32)
    assert a.nbytes > 8192  # exercises the big-leaf path
    b = a.copy()
    b[[1, 2]] = b[[2, 1]]
    assert ckpt.fingerprint_inputs({"w": a}) != ckpt.fingerprint_inputs({"w": b})
    # and identical content still matches
    assert ckpt.fingerprint_inputs({"w": a}) == ckpt.fingerprint_inputs(
        {"w": a.copy()}
    )


def test_checkpointed_game_persists_per_block(tmp_path):
    """A crash INSIDE the round's single batched precompute (where all the
    wall-clock is) must still leave the finished blocks on disk."""
    from shapley_vit_tpu.shapley.game import Game

    calls = {"n": 0}

    def crashing_eval(W):
        calls["n"] += W.shape[0]
        if calls["n"] > 4:
            raise RuntimeError("simulated mid-round crash")
        return np.tile(W.sum(axis=1, keepdims=True), (1, 2))

    game = Game(
        eval_coalitions_fn=crashing_eval,
        num_local_data=[1.0] * 5,
        client_selection_vector=[True] * 5,
        previous_utility=[0.0, 0.0],
    )
    path = str(tmp_path / "util.npz")
    ckpt.checkpointed_game(game, path, block=2)
    coalitions = [[0], [1], [2], [3], [4], [0, 1]]
    with pytest.raises(RuntimeError):
        game.precompute(coalitions)

    # two completed 2-coalition blocks were persisted before the crash
    table, _ = ckpt.load_utility_table(path)
    assert len(table) == 4

    game2 = Game(
        eval_coalitions_fn=lambda W: np.tile(W.sum(axis=1, keepdims=True), (1, 2)),
        num_local_data=[1.0] * 5,
        client_selection_vector=[True] * 5,
        previous_utility=[0.0, 0.0],
    )
    assert ckpt.resume_game(game2, path) == 4
    game2.precompute(coalitions)
    assert game2.num_evaluations == 2  # only the lost block re-evaluates


def test_utility_log_append_and_replay(tmp_path):
    """Block records append O(block) and replay through load_utility_table;
    a torn tail record (crash mid-append) drops silently."""
    path = str(tmp_path / "u.npz")
    ckpt.append_utility_log(path, {frozenset({0}): [1.0, 0.0]}, fingerprint="fp")
    ckpt.append_utility_log(path, {frozenset({1}): [2.0, 0.5]}, fingerprint="fp")
    table, fp = ckpt.load_utility_table(path, fingerprint="fp")
    assert table == {frozenset({0}): [1.0, 0.0], frozenset({1}): [2.0, 0.5]}
    assert fp == "fp"

    # torn tail: truncate the last record mid-payload
    log = path + ".log"
    size = os.path.getsize(log)
    ckpt.append_utility_log(path, {frozenset({2}): [3.0, 1.0]}, fingerprint="fp")
    with open(log, "r+b") as f:
        f.truncate(size + 10)
    table, _ = ckpt.load_utility_table(path, fingerprint="fp")
    assert frozenset({2}) not in table and len(table) == 2


def test_utility_log_rejects_mismatched_fingerprint(tmp_path):
    path = str(tmp_path / "u.npz")
    ckpt.append_utility_log(path, {frozenset({0}): [1.0]}, fingerprint="old")
    ckpt.append_utility_log(path, {frozenset({1}): [2.0]}, fingerprint="new")
    table, _ = ckpt.load_utility_table(path, fingerprint="new")
    assert table == {frozenset({1}): [2.0]}
    # stale consolidated npz + fresh log records: only the fresh survive
    ckpt.save_utility_table(path, {frozenset({5}): [9.0]}, fingerprint="old")
    table, _ = ckpt.load_utility_table(path, fingerprint="new")
    assert table == {frozenset({1}): [2.0]}


def test_checkpointed_game_consolidates_amortized(tmp_path):
    """Per-block persistence must NOT rewrite the whole table each block
    (profiled: 89% of n=64 host wall): blocks append to the log, and the
    npz is consolidated only when the log reaches the table's size."""
    from shapley_vit_tpu.shapley.game import Game

    writes = {"n": 0}
    orig = ckpt.save_utility_table

    def counting_save(*a, **k):
        writes["n"] += 1
        return orig(*a, **k)

    n = 10
    game = Game(
        eval_coalitions_fn=lambda W: np.tile(W.sum(1, keepdims=True), (1, 2)),
        num_local_data=[1.0] * n,
        client_selection_vector=[True] * n,
        previous_utility=[0.0, 0.0],
    )
    path = str(tmp_path / "u.npz")
    import unittest.mock as mock

    with mock.patch.object(ckpt, "save_utility_table", counting_save):
        ckpt.checkpointed_game(game, path, block=2, fingerprint="fp")
        coalitions = [[i] for i in range(n)] + [[i, (i + 1) % n] for i in range(n)]
        game.precompute(coalitions)
    # 10 blocks -> 10 log appends, zero O(table) rewrites below threshold
    assert writes["n"] == 0
    assert os.path.exists(path + ".log") and not os.path.exists(path)

    # resume sees every block despite no consolidation
    game2 = Game(
        eval_coalitions_fn=lambda W: (_ for _ in ()).throw(AssertionError),
        num_local_data=[1.0] * n,
        client_selection_vector=[True] * n,
        previous_utility=[0.0, 0.0],
    )
    assert ckpt.resume_game(game2, path, fingerprint="fp") == len(coalitions)


def test_checkpointed_game_consolidates_stale_log_on_first_save(tmp_path):
    """A pre-existing log (prior crash) folds into one consolidated npz on
    the wrapper's first save, and the log restarts clean."""
    from shapley_vit_tpu.shapley.game import Game

    path = str(tmp_path / "u.npz")
    ckpt.append_utility_log(path, {frozenset({7}): [7.0, 0.0]}, fingerprint="fp")

    game = Game(
        eval_coalitions_fn=lambda W: np.tile(W.sum(1, keepdims=True), (1, 2)),
        num_local_data=[1.0] * 8,
        client_selection_vector=[True] * 8,
        previous_utility=[0.0, 0.0],
    )
    assert ckpt.resume_game(game, path, fingerprint="fp") == 1
    ckpt.checkpointed_game(game, path, block=2, fingerprint="fp")
    game.precompute([[0], [1], [2]])
    table, fp = ckpt.load_utility_table(path, fingerprint="fp")
    # npz now holds the resumed entry + all new ones; nothing lost
    assert frozenset({7}) in table and len(table) == 4
    assert os.path.exists(path)


def test_fingerprint_files_sensitivity(tmp_path):
    """serve()'s zero-device-traffic round fingerprint: any change to a
    checkpoint file, client ordering, straggler set, or the extra (FedAvg
    weights / prev_utility baseline) must change the digest."""
    from shapley_vit_tpu.fl import checkpoint as ckpt

    p1, p2 = str(tmp_path / "c1.npz"), str(tmp_path / "c2.npz")
    for p, seed in ((p1, 1), (p2, 2)):
        with open(p, "wb") as f:
            f.write(bytes([seed]) * 4096)
    extra = ([10.0, 20.0], [True, True], ["0.5", "1.25"])

    base = ckpt.fingerprint_files([p1, p2], extra=extra)
    assert base == ckpt.fingerprint_files([p1, p2], extra=extra)  # stable
    # permuted client files (two clients' checkpoints land in each other's
    # directories) -> different
    assert base != ckpt.fingerprint_files([p2, p1], extra=extra)
    # straggler (absent file) -> different
    assert base != ckpt.fingerprint_files([p1, None], extra=extra)
    assert base != ckpt.fingerprint_files([p1, str(tmp_path / "nope.npz")], extra=extra)
    # re-uploaded (changed) checkpoint -> different
    with open(p2, "ab") as f:
        f.write(b"x")
    assert base != ckpt.fingerprint_files([p1, p2], extra=extra)
    # changed baseline/weights ride through extra
    extra2 = ([10.0, 20.0], [True, True], ["0.5", "1.2500001"])
    with open(p2, "rb+") as f:
        pass
    assert ckpt.fingerprint_files([p1], extra=extra) != ckpt.fingerprint_files(
        [p1], extra=extra2
    )


def test_overlay_digest_identifies_overlay(rng):
    """overlay_digest: restart-stable (same values -> same digest, whether
    numpy or device arrays), sensitive to an overlay advance (any-leaf
    change), cheap (fetches a bounded sample, not the tree). Closes the
    round-3 advice staleness hole where overlay dependence rode only on
    prev_utility's 12-digit formatting."""
    import jax
    import jax.numpy as jnp

    overlay = {
        "q": {"A": rng.normal(size=(64, 8)).astype(np.float32),
              "B": rng.normal(size=(8, 64)).astype(np.float32)},
        "head": {"w": rng.normal(size=(32, 4)).astype(np.float32),
                 "b": np.zeros(4, np.float32)},
    }
    d0 = ckpt.overlay_digest(overlay)
    assert d0 == ckpt.overlay_digest(overlay)  # deterministic
    on_device = jax.tree.map(jnp.asarray, overlay)
    assert d0 == ckpt.overlay_digest(on_device)  # host/device agree
    # an aggregated-delta advance perturbs every leaf a little
    advanced = jax.tree.map(lambda l: l + 1e-3, overlay)
    assert d0 != ckpt.overlay_digest(advanced)
    # even a single-leaf change (e.g. only the head trained) is caught
    head_only = {**overlay, "head": {"w": overlay["head"]["w"],
                                     "b": overlay["head"]["b"] + 1e-3}}
    assert d0 != ckpt.overlay_digest(head_only)
    # bf16 leaves digest without error (TPU overlays are bf16)
    bf16 = jax.tree.map(lambda l: jnp.asarray(l, jnp.bfloat16), overlay)
    assert ckpt.overlay_digest(bf16) == ckpt.overlay_digest(bf16)
    assert ckpt.overlay_digest(bf16) != d0
