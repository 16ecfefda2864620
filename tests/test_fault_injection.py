"""Fault-injection stress of the stop/resume protocol (round-4 VERDICT #8).

The reference blocks forever on missing files and keeps its utility memo in
RAM only (game2.py:32-34, start.py:212-219) — a kill loses the whole round.
Here the contract is: a ``kill -9`` at ANY byte/point costs at most the
in-flight block of coalition evals, and a resumed service reproduces the
identical Shapley values.

Three layers:
  * byte-offset sweep over the append-log tail: truncating the log at EVERY
    byte inside the last record must replay exactly the records before it
    (fast tier, pure host);
  * mid-consolidation crash states reconstructed on disk (tmp-npz not yet
    renamed / npz renamed but log not yet cleared): resume must merge
    without loss or double-count (fast tier);
  * a REAL ``SIGKILL`` of a serving OS process mid-``shapley_round`` (after
    the 2nd block append) and mid-consolidation (before the log clear),
    restarted by ``svt-supervise --restart-on-crash``: the resumed child
    re-evaluates only the unfinished coalitions and lands on identical SVs
    (slow tier).
"""

import json
import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

from shapley_vit_tpu.fl import checkpoint as ckpt

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ---------------------------------------------------------------------------
# fast tier: torn-tail byte sweep + consolidation crash states
# ---------------------------------------------------------------------------

def test_torn_tail_byte_offset_sweep(tmp_path):
    """Truncate the block log at EVERY byte offset inside the last record:
    replay must return exactly the entries of the complete records before
    the cut — never an error, never a partial record."""
    path = str(tmp_path / "u.npz")
    log = path + ".log"
    boundaries = [0]
    blocks = [
        {frozenset({0}): [1.0, 0.5], frozenset({1}): [2.0, 0.25]},
        {frozenset({2}): [3.0, 0.125], frozenset({0, 1}): [4.0, 0.0625]},
        {frozenset({1, 2}): [5.0, 0.03125]},
    ]
    for b in blocks:
        ckpt.append_utility_log(path, b, fingerprint="fp")
        boundaries.append(os.path.getsize(log))
    full = open(log, "rb").read()

    def entries_upto(k):
        out = {}
        for b in blocks[:k]:
            out.update(b)
        return out

    checked = 0
    for k in range(len(blocks)):  # truncation inside record k+1
        for cut in range(boundaries[k] + 1, boundaries[k + 1]):
            with open(log, "wb") as f:
                f.write(full[:cut])
            table, _ = ckpt.load_utility_table(path, fingerprint="fp")
            assert table == entries_upto(k), f"cut at byte {cut}"
            checked += 1
    assert checked == boundaries[-1] - len(blocks)

    # single-bit corruption anywhere in the last record drops ONLY it
    for bit_at in range(boundaries[2], boundaries[3], 37):
        data = bytearray(full)
        data[bit_at] ^= 0x40
        with open(log, "wb") as f:
            f.write(bytes(data))
        table, _ = ckpt.load_utility_table(path, fingerprint="fp")
        # a flipped byte in the magic/len/crc/payload must never corrupt
        # the prefix; the damaged record (and anything after) reads absent
        for key, v in entries_upto(2).items():
            assert table.get(key) == v


def test_mid_consolidation_crash_states(tmp_path):
    """The two interruption points of _consolidate (atomic_save_npz tmp →
    os.replace → clear log): reconstruct each on-disk state and assert the
    resumed load sees every entry exactly once."""
    path = str(tmp_path / "u.npz")
    entries = {frozenset({i}): [float(i), 0.1 * i] for i in range(6)}
    half = dict(list(entries.items())[:3])

    # state A: crash BEFORE os.replace — stale tmp file + no npz + full log
    for k, v in entries.items():
        ckpt.append_utility_log(path, {k: v}, fingerprint="fp")
    with open(path + ".tmp", "wb") as f:
        f.write(b"partial npz bytes the crash left behind")
    table, _ = ckpt.load_utility_table(path, fingerprint="fp")
    assert table == entries

    # state B: crash AFTER os.replace, BEFORE clear_utility_log — the npz
    # holds everything, the stale log holds a subset with the same stamp
    ckpt.save_utility_table(path, entries, fingerprint="fp")
    ckpt.clear_utility_log(path)
    for k, v in half.items():
        ckpt.append_utility_log(path, {k: v}, fingerprint="fp")
    table, _ = ckpt.load_utility_table(path, fingerprint="fp")
    assert table == entries  # merge is idempotent, no loss, no mutation

    # and a resumed game re-evaluates nothing
    from shapley_vit_tpu.shapley import Game

    game = Game(
        eval_coalitions_fn=lambda W: (_ for _ in ()).throw(
            AssertionError("resume must not evaluate")
        ),
        num_local_data=[1.0] * 6,
        client_selection_vector=[True] * 6,
        previous_utility=[0.0, 0.0],
    )
    assert ckpt.resume_game(game, path, fingerprint="fp") == 6


# ---------------------------------------------------------------------------
# slow tier: real SIGKILL mid-round, svt-supervise resume, SV parity
# ---------------------------------------------------------------------------

_CHILD_TEMPLATE = """\
import os, signal, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})

import json
from shapley_vit_tpu.fl import checkpoint as ckpt

SENTINEL = {sentinel!r}
MODE = {mode!r}

_orig_cg = ckpt.checkpointed_game

def small_block_cg(game, path, every=1, fingerprint=None, block=8, save=True):
    # force small persistence blocks so the kill lands mid-round
    return _orig_cg(game, path, every=every, fingerprint=fingerprint,
                    block=4, save=save)

ckpt.checkpointed_game = small_block_cg

_appends = {{"n": 0}}
_orig_append = ckpt.append_utility_log

def killing_append(path, entries, fingerprint=None):
    _orig_append(path, entries, fingerprint=fingerprint)
    _appends["n"] += 1
    if MODE == "append" and _appends["n"] >= 2 and not os.path.exists(SENTINEL):
        open(SENTINEL, "w").write("killed")
        os.kill(os.getpid(), signal.SIGKILL)

ckpt.append_utility_log = killing_append

_orig_clear = ckpt.clear_utility_log

def killing_clear(path):
    if MODE == "consolidate" and not os.path.exists(SENTINEL):
        # crash AFTER the consolidated npz was atomically replaced but
        # BEFORE the log is removed
        open(SENTINEL, "w").write("killed")
        os.kill(os.getpid(), signal.SIGKILL)
    _orig_clear(path)

ckpt.clear_utility_log = killing_clear

from shapley_vit_tpu.config import Config
from shapley_vit_tpu.driver.serve import serve

cfg = Config()
cfg.model.model_type = "ViT-micro"
cfg.data.eval_batch_size = 32
cfg.obs.exp_dir = {exp_dir!r}
cfg.obs.exp_id = "fault"
cfg.paths.validation_dataset = {valdir!r}
cfg.data.synthetic_scale = 0.02
cfg.paths.local_model_path = {local!r}
cfg.shapley.num_clients = 5
records = serve(cfg, max_rounds=1, timeout=30.0, policy="fail")
with open({results!r}, "w") as f:
    json.dump({{
        "evals": records[0]["evals"],
        "shapley": records[0]["shapley"],
        "utility": records[0]["utility"],
    }}, f)
sys.exit(0)
"""


def _stage_clients(local_dir, n=5):
    """Deterministic 5-client epoch-0 drop shared byte-for-byte by every
    run dir (SV parity requires identical deltas)."""
    import importlib

    import jax

    from shapley_vit_tpu.config import Config
    from shapley_vit_tpu.fl import ingestion
    from shapley_vit_tpu.ops import tree_math as tm

    cfg = Config()
    cfg.model.model_type = "ViT-micro"
    start_mod = importlib.import_module("shapley_vit_tpu.driver.start")
    spec, base, init_lora = start_mod.build_model(cfg)
    for i in range(n):
        lora_i = tm.tree_add(
            init_lora,
            jax.tree.map(
                lambda l: 0.05 * jax.random.normal(jax.random.key(i), l.shape),
                init_lora,
            ),
        )
        ingestion.save_lora_checkpoint(
            os.path.join(local_dir, f"client_{i + 1}_model", "ViT_epoch_0.pth.tar"),
            lora_i, spec, num_local_data_train=100 * (i + 1),
        )


def _run_case(tmp_path, tag, mode):
    """One kill scenario under the real supervisor; returns the results
    dict of the SURVIVING (resumed) child."""
    from shapley_vit_tpu.driver.supervisor import supervise

    case = tmp_path / tag
    local = case / "local"
    os.makedirs(local)
    src_local = tmp_path / "staged_local"
    shutil.copytree(src_local, local, dirs_exist_ok=True)
    results = str(case / "results.json")
    child = case / "child.py"
    child.write_text(
        _CHILD_TEMPLATE.format(
            repo=REPO,
            sentinel=str(case / "killed.sentinel"),
            mode=mode,
            exp_dir=str(case / "exp"),
            valdir=str(case / "none"),
            local=str(local),
            results=results,
        )
    )
    env = dict(os.environ, SVT_COMPILE_CACHE=str(tmp_path / "cache"))
    logs = []
    rc = supervise(
        [sys.executable, str(child)],
        env=env, restart_on_crash=True, max_restarts=2,
        restart_delay_s=0.0, log_fn=logs.append,
    )
    assert rc == 0, logs
    if mode != "none":
        assert os.path.exists(case / "killed.sentinel"), logs
        assert any("crash" in ln for ln in logs), logs
    with open(results) as f:
        return json.load(f)


@pytest.mark.slow
def test_sigkill_mid_round_resumes_with_identical_svs(tmp_path):
    _stage_clients(str(tmp_path / "staged_local"))

    ref = _run_case(tmp_path, "reference", mode="none")
    killed_append = _run_case(tmp_path, "kill_append", mode="append")
    killed_consol = _run_case(tmp_path, "kill_consolidate", mode="consolidate")

    # SV parity: the resumed children land on the identical values
    for got in (killed_append, killed_consol):
        for d in range(2):
            for c in range(5):
                assert got["shapley"][d][str(c)] == pytest.approx(
                    ref["shapley"][d][str(c)], abs=1e-9
                )
        np.testing.assert_allclose(got["utility"], ref["utility"], atol=1e-9)

    # eval accounting: the mid-append kill happened after exactly 2
    # four-entry block appends, so the resumed child re-evaluates exactly
    # ref_evals - 8 coalitions — nothing beyond the in-flight block is lost
    assert killed_append["evals"] == ref["evals"] - 8, (
        killed_append["evals"], ref["evals"]
    )
    # the mid-consolidation kill happened AFTER the estimator finished (the
    # round-end flush): the whole table survives, zero re-evaluations
    assert killed_consol["evals"] == 0, killed_consol["evals"]
