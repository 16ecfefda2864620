"""Smoke tests for the repo-root examples — they are documentation that
must keep executing as APIs evolve (serve_demo/run_demo are covered in
test_serve_demo.py)."""

import os
import runpy
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_example(name, argv, capsys):
    old_argv = sys.argv
    sys.argv = [name] + argv
    try:
        runpy.run_path(os.path.join(ROOT, "examples", name), run_name="__main__")
    finally:
        sys.argv = old_argv
    return capsys.readouterr().out


def test_quickstart_example(capsys):
    out = _run_example(
        "quickstart.py", ["--variant", "micro", "--val-size", "32"], capsys
    )
    assert "distinct coalition evaluations: 7" in out
    assert "comp-contrib SV" in out


def test_multi_round_fl_example(tmp_path, capsys):
    out = _run_example(
        "multi_round_fl.py",
        ["--rounds", "2", "--out", str(tmp_path)],
        capsys,
    )
    assert "round 1" in out
    assert os.path.exists(os.path.join(str(tmp_path), "shapley_rounds.csv"))
