"""bench.py outage watchdog: the headline bench must never hang the driver.

The axon tunnel fails by HANGING inside backend init (round-4 outage,
BENCH_NOTES.md), so bench.py probes init in a killable subprocess before
importing jax in-process, and emits an honest zero-value JSON line (plus
exit code 1) when the probe fails. These tests exercise both probe
outcomes hermetically (no real backend traffic).
"""

import json
import subprocess
import sys

import bench


def test_backend_probe_timeout_returns_false(monkeypatch):
    calls = []

    def fake_run(cmd, timeout=None, capture_output=False):
        calls.append(timeout)
        raise subprocess.TimeoutExpired(cmd, timeout)

    # _backend_reachable does `import subprocess` locally — patching the
    # module object's attribute reaches it
    monkeypatch.setattr(subprocess, "run", fake_run)
    assert bench._backend_reachable(attempts=2, timeout=0.5) is False
    assert calls == [0.5, 0.5]  # retries the configured number of times


def test_backend_probe_success_short_circuits(monkeypatch):
    calls = []

    class R:
        returncode = 0

    def fake_run(cmd, timeout=None, capture_output=False):
        calls.append(list(cmd))
        return R()

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert bench._backend_reachable(attempts=2, timeout=0.5) is True
    assert len(calls) == 1  # first success wins, no second child
    assert calls[0][0] == sys.executable  # probes THIS interpreter


def test_main_emits_honest_failure_line_when_unreachable(monkeypatch, capsys):
    monkeypatch.setattr(bench, "_backend_reachable", lambda **kw: False)
    monkeypatch.delenv("SVT_BENCH_SKIP_PROBE", raising=False)
    rc = bench.main()
    assert rc == 1
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1  # still exactly ONE JSON line
    rec = json.loads(out[0])
    assert rec["metric"] == "coalition_evals_per_sec_per_chip_vitb16"
    assert rec["value"] == 0.0  # zero == "no measurement", never a fake number
    assert "error" in rec and "BENCH_r03" in rec["error"]


def test_skip_probe_env_bypasses_watchdog(monkeypatch):
    # SVT_BENCH_SKIP_PROBE=1 must go straight to the real bench (which
    # we intercept at the jax import to keep the test hermetic)
    monkeypatch.setenv("SVT_BENCH_PROBE_TIMEOUT", "0.001")
    monkeypatch.setenv("SVT_BENCH_SKIP_PROBE", "1")
    probed = []
    monkeypatch.setattr(
        bench, "_backend_reachable", lambda **kw: probed.append(1) or False
    )
    import builtins

    real_import = builtins.__import__

    def fake_import(name, *a, **kw):
        if name == "jax":
            raise RuntimeError("reached-jax-import")
        return real_import(name, *a, **kw)

    monkeypatch.setattr(builtins, "__import__", fake_import)
    try:
        bench.main()
        raise AssertionError("expected the jax-import sentinel")
    except RuntimeError as e:
        assert "reached-jax-import" in str(e)
    assert probed == []  # the probe never ran
