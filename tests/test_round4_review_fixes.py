"""Regression tests for the round-4 review findings (second batch):
DP noise-stream replay on optimizer re-init, unreachable DP/label-flip CLI
knobs, native preloader partial-read/TOCTOU contract, artifact-worker
failed-future retention, and the SV-trajectory client set.
"""

import ctypes
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from shapley_vit_tpu.config import Config
from shapley_vit_tpu.fl import training as tr


def _dp_opt(seed=0):
    return optax.chain(
        optax.contrib.differentially_private_aggregate(
            l2_norm_clip=1.0, noise_multiplier=2.0, key=jax.random.key(seed)
        ),
        optax.sgd(0.1),
    )


def test_dp_reinit_replays_noise_and_refresh_fixes_it():
    """opt.init restores the DP key to its seed: two inits yield the SAME
    noise on identical grads (the replay an observer can difference away —
    the round-4 privacy finding); refresh_dp_noise_key gives the re-init a
    fresh stream."""
    params = {"w": jnp.zeros(3)}
    per_ex_grads = {"w": jnp.ones((4, 3))}
    opt = _dp_opt()

    u1, _ = opt.update(per_ex_grads, opt.init(params), params)
    u2, _ = opt.update(per_ex_grads, opt.init(params), params)
    # identical: this is the bug refresh_dp_noise_key exists to break
    np.testing.assert_array_equal(np.asarray(u1["w"]), np.asarray(u2["w"]))

    s3 = tr.refresh_dp_noise_key(opt.init(params), jax.random.key(99))
    u3, _ = opt.update(per_ex_grads, s3, params)
    assert not np.allclose(np.asarray(u1["w"]), np.asarray(u3["w"]))
    # param leaves were untouched by the key swap (dtype-targeted replace)
    s4 = tr.refresh_dp_noise_key(opt.init(params), jax.random.key(1))
    flat3 = [l for l in jax.tree.leaves(s3) if not hasattr(l, "dtype") or
             not jax.dtypes.issubdtype(l.dtype, jax.dtypes.prng_key)]
    flat4 = [l for l in jax.tree.leaves(s4) if not hasattr(l, "dtype") or
             not jax.dtypes.issubdtype(l.dtype, jax.dtypes.prng_key)]
    for a, b in zip(flat3, flat4):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cli_exposes_dp_and_label_flip():
    """--use-dp / --label-flip-prob reach cfg.train (previously the fields
    existed but NO flag set them, so svt-client could never run DP)."""
    cfg = Config.from_args(["--use-dp", "--label-flip-prob", "0.25"])
    assert cfg.train.use_dp is True
    assert cfg.train.label_flip_prob == 0.25
    cfg = Config.from_args([])
    assert cfg.train.use_dp is False
    assert cfg.train.label_flip_prob == 0.0


def test_preload_rejects_stale_size_and_partial_reads(tmp_path):
    """The C preloader must return complete bytes or a per-file error —
    never silently truncated content. A caps[i] that disagrees with the
    open file's fstat size (the stat/open TOCTOU under atomic renames)
    must come back -1."""
    from shapley_vit_tpu.fl import native

    if not native.native_available():
        pytest.skip("native runtime not built")
    lib = native.load_native()

    p = tmp_path / "ckpt.bin"
    payload = bytes(range(200)) * 5  # 1000 bytes
    p.write_bytes(payload)

    # normal path: exact size -> full content
    out = native.preload_files([str(p)])
    assert out == [payload]

    # stale (smaller) cap: e.g. the file was replaced by a bigger one
    # after the sizing stat — must be an error, not 500 truncated bytes
    buf = (ctypes.c_uint8 * 500)()
    bufs = (ctypes.POINTER(ctypes.c_uint8) * 1)(
        ctypes.cast(buf, ctypes.POINTER(ctypes.c_uint8))
    )
    caps = (ctypes.c_int64 * 1)(500)
    sizes = (ctypes.c_int64 * 1)()
    paths = (ctypes.c_char_p * 1)(str(p).encode())
    ok = lib.svt_preload_files(paths, 1, bufs, caps, sizes, 1)
    assert ok == 0 and sizes[0] == -1

    # a file that appeared AFTER the sizing stat (cap 0 vs real size):
    # error, not b'' masquerading as success
    caps0 = (ctypes.c_int64 * 1)(0)
    buf0 = (ctypes.c_uint8 * 1)()
    bufs0 = (ctypes.POINTER(ctypes.c_uint8) * 1)(
        ctypes.cast(buf0, ctypes.POINTER(ctypes.c_uint8))
    )
    ok = lib.svt_preload_files(paths, 1, bufs0, caps0, sizes, 1)
    assert ok == 0 and sizes[0] == -1

    # genuinely empty file: cap 0 == fstat 0 is a SUCCESSFUL empty read
    q = tmp_path / "empty.bin"
    q.write_bytes(b"")
    assert native.preload_files([str(q)]) == [b""]
    # missing file stays None
    assert native.preload_files([str(tmp_path / "nope")]) == [None]


def test_failed_artifact_futures_are_bounded(tmp_path):
    """A persistently failing artifact path must not accumulate one failed
    future (pinning its args via the exception traceback) per round for
    the life of the service."""
    from shapley_vit_tpu.driver import report

    def boom():
        raise RuntimeError("dead disk")

    report.flush_async_plots(raise_errors=False)  # drain prior state
    for _ in range(30):
        report.submit_async_artifact(boom)
    report.pending_artifact_jobs()  # settle helper exercises the lock
    # wait for the worker to finish, then one more submit to prune
    import time

    deadline = time.time() + 10
    while report.pending_artifact_jobs() and time.time() < deadline:
        time.sleep(0.01)
    report.submit_async_artifact(lambda: None)
    with report._PLOT_LOCK:
        n_failed = sum(
            1 for f in report._PLOT_PENDING
            if f.done() and f.exception() is not None
        )
    assert n_failed <= 8
    assert report.flush_async_plots(raise_errors=False) <= 9


def test_sv_trajectory_includes_late_clients(tmp_path):
    """A straggler absent from round 0 must still get a trajectory line
    (the client set is the union across rounds, not round 0's)."""
    from shapley_vit_tpu.driver import report

    per_round = [
        [{0: 0.1, 1: 0.2}],          # round 0: client 2 skipped
        [{0: 0.1, 1: 0.2, 2: 0.9}],  # round 1: straggler arrives
    ]
    p = str(tmp_path / "sv_rounds.png")
    report.plot_shapley_rounds(per_round, p)
    assert os.path.exists(p) and os.path.getsize(p) > 0


def test_samples_per_client_sets_fixed_budget(monkeypatch):
    """cfg.shapley.samples_per_client must set m on the fixed-budget live
    path (previously it only bounded the adaptive mode — the knob was a
    silent no-op with target_se=0)."""
    from types import SimpleNamespace

    from shapley_vit_tpu.shapley import estimators as est
    from shapley_vit_tpu.shapley.game import TabularGame, additive_table

    seen = {}
    real = est.shapley_comp_contrib

    def spy(game, m, **kw):
        seen["m"] = m
        return real(game, m, **kw)

    monkeypatch.setattr(est, "shapley_comp_contrib", spy)
    values = np.array([[1.0, 0.0], [2.0, 0.5], [3.0, 1.0]])
    game = TabularGame(additive_table(values), n_all=3)
    cfg = SimpleNamespace(
        target_se=0.0, cc_stratify="uniform", samples_per_client=7
    )
    est.run_configured_comp_contrib(
        game, cfg, rng=np.random.default_rng(0)
    )
    assert seen["m"] == 7 * 3


def test_monte_carlo_m_zero_raises_cleanly():
    from shapley_vit_tpu.shapley.estimators import shapley_monte_carlo
    from shapley_vit_tpu.shapley.game import TabularGame, additive_table

    game = TabularGame(
        additive_table(np.array([[1.0, 0.0], [2.0, 0.5]])), n_all=2
    )
    with pytest.raises(ValueError, match="m >= 1"):
        shapley_monte_carlo(game, m=0)


def test_corrupt_utility_table_reads_as_absent(tmp_path):
    """A corrupt persisted table (shared-disk fault) must cost one
    re-evaluation, not kill the restarted service at ingest."""
    from shapley_vit_tpu.fl import checkpoint as ckpt
    from shapley_vit_tpu.shapley.game import TabularGame, additive_table

    p = str(tmp_path / "utility_table.npz")
    with open(p, "wb") as f:
        f.write(b"this is not a zip file at all" * 10)
    table, fp = ckpt.load_utility_table(p)
    assert table == {} and fp is None
    game = TabularGame(
        additive_table(np.array([[1.0, 0.0], [2.0, 0.5]])), n_all=2
    )
    assert ckpt.resume_game(game, p) == 0


def test_resume_count_is_actual_injections(tmp_path):
    from shapley_vit_tpu.fl import checkpoint as ckpt
    from shapley_vit_tpu.shapley.game import TabularGame, additive_table

    values = np.array([[1.0, 0.0], [2.0, 0.5]])
    g1 = TabularGame(additive_table(values), n_all=2)
    g1.precompute([[0], [1], [0, 1]])
    p = str(tmp_path / "t.npz")
    ckpt.save_utility_table(p, g1.utility)

    g2 = TabularGame(additive_table(values), n_all=2)
    g2.precompute([[0]])  # one coalition already memoized
    pre_seeded = len(g2.utility)
    restored = ckpt.resume_game(g2, p)
    # counted = only entries actually injected, not len(table)
    assert restored == len(g1.utility) - pre_seeded


def test_checkpointed_game_flushes_tail(tmp_path):
    """every > 1 must still persist the final blocks once the precompute
    call completes ('a kill loses at most block evals')."""
    from shapley_vit_tpu.fl import checkpoint as ckpt
    from shapley_vit_tpu.shapley.game import TabularGame, additive_table

    values = np.array([[1.0, 0.0], [2.0, 0.5], [3.0, 1.0]])
    game = TabularGame(additive_table(values), n_all=3)
    p = str(tmp_path / "t.npz")
    wrapped = ckpt.checkpointed_game(game, p, every=3, block=2)
    coalitions = [[0], [1], [2], [0, 1], [0, 2], [1, 2], [0, 1, 2]]
    wrapped.precompute(coalitions)  # 4 blocks -> modulo alone saves once
    table, _ = ckpt.load_utility_table(p)
    assert len(table) == len(coalitions)  # tail flushed


def test_tabular_csv_rejects_non_numeric(tmp_path):
    from shapley_vit_tpu.data.registry import get_dataset

    p = tmp_path / "compas.csv"
    p.write_text(
        "f1,f2,group,label\n"
        "1.0,State-gov,0,1\n"
        "2.0,3.0,1,0\n"
    )
    with pytest.raises(ValueError, match="non-numeric"):
        get_dataset("compas", data_dir=str(tmp_path), synthetic_ok=False)
