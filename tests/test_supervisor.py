"""Recycle-supervisor tests: the restart protocol (unit, stub children) and
the real service recycling end-to-end through the ``svt-serve`` CLI (slow).

Background (BENCH_NOTES round 4 / OPERATIONS.md): on the TPU-tunnel stack
the runtime client retains ~the full payload of every H2D transfer, so the
service's only unbounded memory term is environmental. The built-in remedy
is an RSS ceiling in serve() + a process-recycle supervisor; these tests
pin the exit-code contract and the resume cursor.
"""

import os
import subprocess
import sys

import pytest

from shapley_vit_tpu.driver.serve import RECYCLE_EXIT_CODE, read_service_state
from shapley_vit_tpu.driver.supervisor import supervise

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _scripted_child(tmp_path, codes):
    """A child command that exits with codes[run_index] (last code repeats),
    counting runs in a file so the test can assert how many launches the
    supervisor performed."""
    counter = tmp_path / "runs.txt"
    counter.write_text("0")
    script = tmp_path / "child.py"
    script.write_text(
        f"import sys\n"
        f"p = {str(counter)!r}\n"
        f"n = int(open(p).read())\n"
        f"open(p, 'w').write(str(n + 1))\n"
        f"codes = {list(codes)!r}\n"
        f"sys.exit(codes[min(n, len(codes) - 1)])\n"
    )
    return [sys.executable, str(script)], counter


def _runs(counter):
    return int(counter.read_text())


def test_supervise_restarts_on_recycle_until_clean(tmp_path):
    cmd, counter = _scripted_child(
        tmp_path, [RECYCLE_EXIT_CODE, RECYCLE_EXIT_CODE, 0]
    )
    rc = supervise(cmd, restart_delay_s=0.0, log_fn=lambda s: None)
    assert rc == 0
    assert _runs(counter) == 3


def test_supervise_crash_stops_without_opt_in(tmp_path):
    cmd, counter = _scripted_child(tmp_path, [7])
    rc = supervise(cmd, restart_delay_s=0.0, log_fn=lambda s: None)
    assert rc == 7
    assert _runs(counter) == 1


def test_supervise_crash_restarts_with_opt_in(tmp_path):
    cmd, counter = _scripted_child(tmp_path, [7, 0])
    rc = supervise(
        cmd, restart_on_crash=True, restart_delay_s=0.0, log_fn=lambda s: None
    )
    assert rc == 0
    assert _runs(counter) == 2


def test_supervise_bounded_restarts(tmp_path):
    # a child that always asks to recycle must still be bounded
    cmd, counter = _scripted_child(tmp_path, [RECYCLE_EXIT_CODE])
    rc = supervise(
        cmd, max_restarts=2, restart_delay_s=0.0, log_fn=lambda s: None
    )
    assert rc == RECYCLE_EXIT_CODE
    assert _runs(counter) == 3  # initial launch + 2 restarts


def test_supervise_exports_service_env(tmp_path):
    # the ceiling and the auto-resume cursor reach the child as env vars
    out = tmp_path / "env.txt"
    script = tmp_path / "child.py"
    script.write_text(
        "import os, sys\n"
        f"open({str(out)!r}, 'w').write(\n"
        "    os.environ.get('SVT_MAX_RSS_MB', '') + ':' +\n"
        "    os.environ.get('SVT_START_EPOCH', ''))\n"
        "sys.exit(0)\n"
    )
    rc = supervise(
        [sys.executable, str(script)], max_rss_mb=123.5,
        restart_delay_s=0.0, log_fn=lambda s: None,
    )
    assert rc == 0
    assert out.read_text() == "123.5:auto"


def test_supervise_forwards_stop_signal(tmp_path):
    """SIGTERM to the supervisor forwards to the child and ends the restart
    chain: the child traps it, exits 0, and the supervisor returns 0
    without launching another child."""
    import signal
    import threading
    import time

    ready = tmp_path / "ready.txt"
    got = tmp_path / "got.txt"
    counter = tmp_path / "runs.txt"
    counter.write_text("0")
    script = tmp_path / "child.py"
    script.write_text(
        "import signal, sys, time\n"
        f"open({str(counter)!r}, 'w').write(str(int(open({str(counter)!r}).read() or 0) + 1))\n"
        "def bye(s, f):\n"
        f"    open({str(got)!r}, 'w').write(str(s))\n"
        "    sys.exit(0)\n"
        "signal.signal(signal.SIGTERM, bye)\n"
        f"open({str(ready)!r}, 'w').close()\n"  # handler installed: safe to signal
        "time.sleep(30)\n"
        "sys.exit(7)\n"  # no signal arrived — fail loudly via crash rc
    )
    counter.write_text("0")

    def fire():
        deadline = time.time() + 20
        while time.time() < deadline and not ready.exists():
            time.sleep(0.02)
        os.kill(os.getpid(), signal.SIGTERM)

    t = threading.Thread(target=fire)
    t.start()
    logs = []
    rc = supervise(
        [sys.executable, str(script)], restart_on_crash=True,
        restart_delay_s=0.0, log_fn=logs.append,
    )
    t.join()
    assert rc == 0, logs
    assert got.read_text() == str(int(signal.SIGTERM))
    assert _runs(counter) == 1  # restart-on-crash must NOT fire after a stop


@pytest.mark.slow
def test_supervised_service_drains_end_to_end(tmp_path):
    """The realistic eviction: the supervised service is idle-waiting for
    the next epoch (policy='wait' blocks forever) when SIGTERM hits the
    supervisor — the forwarded signal drains the child through
    serve.main()'s handler: cursor persisted, exit 0, no restart."""
    import importlib
    import signal
    import threading
    import time

    from shapley_vit_tpu.config import Config
    from shapley_vit_tpu.driver.serve import read_service_state
    from test_serve import write_epoch

    cfg = Config()
    cfg.model.model_type = "ViT-micro"
    cfg.paths.local_model_path = str(tmp_path / "local")
    start_mod = importlib.import_module("shapley_vit_tpu.driver.start")
    spec, base, init_lora = start_mod.build_model(cfg)
    write_epoch(cfg, spec, init_lora, epoch=0)  # epoch 1 never arrives

    child = tmp_path / "serve_child.py"
    child.write_text(
        "import os, sys\n"
        "os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'\n"
        "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        f"sys.path.insert(0, {REPO!r})\n"
        "from shapley_vit_tpu.driver.serve import main\n"
        "sys.exit(main(sys.argv[1:]))\n"
    )
    env = dict(
        os.environ,
        LOCAL_MODEL_PATH=str(tmp_path / "local"),
        GLOBAL_MODEL_PATH=str(tmp_path / "global"),
        VALIDATION_DATASET=str(tmp_path / "none"),
        SVT_COMPILE_CACHE=str(tmp_path / "cache"),
    )
    out_dir = str(tmp_path / "exp" / "svc")

    def fire_when_idle():
        deadline = time.time() + 280
        while time.time() < deadline:
            st = read_service_state(out_dir)
            if st and st.get("next_epoch") == 1:
                break
            time.sleep(0.2)
        # fire even on deadline expiry: a drain bug must fail the asserts,
        # not hang the suite on the child's indefinite policy='wait'
        os.kill(os.getpid(), signal.SIGTERM)

    t = threading.Thread(target=fire_when_idle)
    t.start()
    logs = []
    rc = supervise(
        [
            sys.executable, str(child),
            "--model-type", "ViT-micro",
            "--exp-dir", str(tmp_path / "exp"), "--exp-id", "svc",
        ],
        env=env, restart_delay_s=0.0, log_fn=logs.append,
    )
    t.join()
    assert rc == 0, logs
    state = read_service_state(out_dir)
    assert state["next_epoch"] == 1
    assert state["stop_reason"] == "drain"
    assert os.path.exists(
        os.path.join(str(tmp_path / "global"), "ViT_global_epoch_0.npz")
    )
    assert any("stop signal" in ln for ln in logs), logs


@pytest.mark.slow
def test_supervised_service_recycles_end_to_end(tmp_path):
    """The full contract through the real CLI: two epochs staged, a 1 MB
    ceiling forces a recycle after every round, and the supervisor's second
    child resumes at the persisted cursor — both rounds' global exports
    exist, produced by two different OS processes."""
    import importlib

    from shapley_vit_tpu.config import Config
    from test_serve import write_epoch

    # stage checkpoints with the SAME deterministic model the child builds
    cfg = Config()
    cfg.model.model_type = "ViT-micro"
    cfg.paths.local_model_path = str(tmp_path / "local")
    start_mod = importlib.import_module("shapley_vit_tpu.driver.start")
    spec, base, init_lora = start_mod.build_model(cfg)
    write_epoch(cfg, spec, init_lora, epoch=0)
    write_epoch(cfg, spec, init_lora, epoch=1)

    # the child must force the CPU backend before importing jax consumers
    # (the container's sitecustomize overrides the env var alone)
    child = tmp_path / "serve_child.py"
    child.write_text(
        "import os, sys\n"
        "os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'\n"
        "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        f"sys.path.insert(0, {REPO!r})\n"
        "from shapley_vit_tpu.driver.serve import main\n"
        "sys.exit(main(sys.argv[1:]))\n"
    )
    env = dict(
        os.environ,
        LOCAL_MODEL_PATH=str(tmp_path / "local"),
        GLOBAL_MODEL_PATH=str(tmp_path / "global"),
        VALIDATION_DATASET=str(tmp_path / "none"),
        SVT_COMPILE_CACHE=str(tmp_path / "cache"),
    )
    cmd = [
        sys.executable, str(child),
        "--model-type", "ViT-micro",
        "--exp-dir", str(tmp_path / "exp"), "--exp-id", "svc",
    ]
    logs = []
    rc = supervise(
        cmd, max_rss_mb=1.0, max_restarts=1, restart_delay_s=0.0,
        env=env, log_fn=logs.append,
    )
    # both children recycled; the restart budget (1) then stopped the chain
    assert rc == RECYCLE_EXIT_CODE, "\n".join(logs)
    state = read_service_state(str(tmp_path / "exp" / "svc"))
    assert state is not None
    assert state["next_epoch"] == 2
    assert state["stop_reason"] == "rss_ceiling"
    for epoch in (0, 1):
        assert os.path.exists(
            os.path.join(str(tmp_path / "global"), f"ViT_global_epoch_{epoch}.npz")
        ), (epoch, "\n".join(logs))


def test_stop_during_restart_delay_spawns_no_doomed_child(tmp_path):
    """A stop signal landing between a recycle exit and the next launch
    must end the chain WITHOUT spawning a child that exists only to be
    killed in its boot window (round-4 review: the old loop Popen'd first
    and only then noticed the stop)."""
    import signal
    import threading
    import time

    cmd, counter = _scripted_child(tmp_path, [RECYCLE_EXIT_CODE])

    def fire():
        deadline = time.time() + 20
        while time.time() < deadline and _runs(counter) < 1:
            time.sleep(0.01)
        os.kill(os.getpid(), signal.SIGTERM)

    t = threading.Thread(target=fire)
    t.start()
    logs = []
    rc = supervise(cmd, restart_delay_s=3.0, log_fn=logs.append)
    t.join()
    assert rc == 0, logs
    # one launch only: either the signal stopped the chain in the restart
    # delay (no second Popen), or it was forwarded to the still-live first
    # child — never a second child
    assert _runs(counter) == 1, logs
