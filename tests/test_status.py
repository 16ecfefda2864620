"""svt-status: the operator view is assembled purely from on-disk
artifacts — cursor, drain flag, round CSV — and stays import-light."""

import csv
import io
import json
import os

from shapley_vit_tpu.driver import status as st
from shapley_vit_tpu.driver.protocol import DRAIN_FILENAME, STATE_FILENAME


def _stage(tmp_path, rounds=4):
    out = tmp_path / "exp" / "svc"
    out.mkdir(parents=True)
    (out / STATE_FILENAME).write_text(json.dumps(dict(
        next_epoch=rounds, last_epoch=rounds - 1, rounds=2,
        total_rounds=rounds, generation=3, rss_mb=512.0,
        stop_reason="rss_ceiling",
    )))
    with open(out / "shapley_round.csv", "w", newline="") as f:
        wr = csv.writer(f)
        wr.writerow(["round", "utility", "client_id", "shapley_value"])
        for r in range(rounds):
            for dim in ("accuracy", "celoss"):
                for c in range(3):
                    wr.writerow([r, dim, c, 0.01 * (r + 1) * (c + 1)])
    return str(out)


def test_collect_status_reads_cursor_and_rounds(tmp_path):
    out = _stage(tmp_path)
    s = st.collect_status(out, last=2)
    assert s["state"]["generation"] == 3
    assert s["state"]["total_rounds"] == 4
    assert s["rounds_on_disk"] == 4
    assert sorted(s["recent_rounds"]) == ["2", "3"]  # the LAST two
    assert s["recent_rounds"]["3"]["accuracy"]["2"] == 0.01 * 4 * 3
    assert s["drain_requested"] is False
    assert s["state_age_s"] is not None and s["state_age_s"] < 60


def test_status_drain_flag_and_render(tmp_path):
    out = _stage(tmp_path)
    open(os.path.join(out, DRAIN_FILENAME), "w").close()
    s = st.collect_status(out)
    assert s["drain_requested"] is True
    buf = io.StringIO()
    st.render(s, out=buf)
    text = buf.getvalue()
    assert "generation=3" in text and "total_rounds=4" in text
    assert "DRAIN requested" in text
    assert "round 3 [accuracy]" in text


def test_status_cli_json_and_exit_codes(tmp_path, capsys):
    out = _stage(tmp_path)
    rc = st.main([out, "--json", "--last", "1"])
    assert rc == 0
    payload = json.loads(capsys.readouterr().out)
    assert payload["state"]["next_epoch"] == 4
    assert list(payload["recent_rounds"]) == ["3"]

    empty = str(tmp_path / "nothing")
    os.makedirs(empty)
    assert st.main([empty]) == 1  # nothing there: scripts can probe

    # default dir resolution: --exp-dir/--exp-id
    rc = st.main(["--exp-dir", str(tmp_path / "exp"), "--exp-id", "svc"])
    assert rc == 0


def test_status_tolerates_torn_csv_and_last_zero(tmp_path):
    """The service appends the round CSV in place, so a live read can see a
    torn last line — status must skip it, not crash; --last 0 means 'cursor
    only', not 'every round ever'."""
    out = _stage(tmp_path)
    with open(os.path.join(out, "shapley_round.csv"), "a") as f:
        f.write("3,accuracy,1\n")      # short row (torn mid-append)
        f.write("notanint,accuracy,1,0.5\n")  # garbage round id
    s = st.collect_status(out, last=2)
    assert s["rounds_on_disk"] == 4  # the torn/garbage rows were skipped
    assert s["recent_rounds"]["3"]["accuracy"]["2"] == 0.01 * 4 * 3

    s = st.collect_status(out, last=0)
    assert s["recent_rounds"] == {}
    assert s["rounds_on_disk"] == 4


def test_cli_shim_binds_the_start_function():
    """Importing driver.serve first must not shadow the start FUNCTION the
    CLI shim binds (the package once lazily re-exported the name `start`,
    which the same-named submodule shadowed on first import)."""
    import importlib
    import sys

    importlib.import_module("shapley_vit_tpu.driver.serve")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo not in sys.path:
        sys.path.insert(0, repo)
    shim = importlib.import_module("mainShapley")
    assert callable(shim.start) and not hasattr(shim.start, "__path__")


def test_status_import_is_light(tmp_path):
    # the tool must stay usable on hosts without the compute stack: its
    # module graph (status -> protocol) is stdlib-only
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = (
        "import sys\n"
        "pre = set(sys.modules)\n"
        f"sys.path.insert(0, {repo!r})\n"
        "import shapley_vit_tpu.driver.status\n"
        "bad = [m for m in ('shapley_vit_tpu.driver.serve',"
        " 'shapley_vit_tpu.models.vit', 'optax', 'flax')"
        " if m in sys.modules and m not in pre]\n"
        "assert not bad, bad\n"
    )
    proc = subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True)
    assert proc.returncode == 0, proc.stderr[-2000:]


def test_status_tolerates_nul_corrupt_csv(tmp_path):
    """Reader-level corruption (a NUL-padded tail after power loss on ext4
    with delayed allocation) raises csv.Error from INSIDE DictReader
    iteration — before the per-row guard — and must not crash svt-status
    (round-4 review: only OSError was caught)."""
    out = _stage(tmp_path)
    with open(os.path.join(out, "shapley_round.csv"), "ab") as f:
        f.write(b"\x00" * 64)
    s = st.collect_status(out, last=2)
    assert s["rounds_on_disk"] >= 1  # rows before the tear still parsed
