"""Round-report tests."""

import csv
import os

import numpy as np

from shapley_vit_tpu.driver import report
from shapley_vit_tpu.shapley import TabularGame, shapley_exact
from shapley_vit_tpu.shapley.game import additive_table
from shapley_vit_tpu.utils.profiling import StepTimer


def test_render_round_report(tmp_path):
    values = np.array([[1.0, -0.2], [2.0, 0.1], [0.5, 0.3]])
    game = TabularGame(additive_table(values), n_all=3)
    timer = StepTimer()
    with timer.span("shapley"):
        sv = shapley_exact(game)
    paths = report.render_round_report(str(tmp_path), sv, game=game, round_idx=0, timer=timer)
    for p in paths:
        assert os.path.getsize(p) > 0

    with open(os.path.join(tmp_path, "shapley_round.csv")) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 6  # 2 dims x 3 clients
    accs = {int(r["client_id"]): float(r["shapley_value"])
            for r in rows if r["utility"] == "accuracy"}
    np.testing.assert_allclose([accs[i] for i in range(3)], values[:, 0], atol=1e-9)

    with open(os.path.join(tmp_path, "utility_table_r0.csv")) as f:
        urows = list(csv.DictReader(f))
    assert len(urows) == 7  # all non-empty coalitions
    assert urows[0]["coalition"] in ("0", "1", "2")

    # append a second round and plot the trajectory
    sv2 = [{k: v * 0.5 for k, v in d.items()} for d in sv]
    report.write_shapley_csv(os.path.join(tmp_path, "shapley_round.csv"), sv2, round_idx=1)
    with open(os.path.join(tmp_path, "shapley_round.csv")) as f:
        assert len(list(csv.DictReader(f))) == 12
    report.plot_shapley_rounds([sv, sv2], str(tmp_path / "traj.png"))
    assert os.path.getsize(tmp_path / "traj.png") > 0


def test_sv_bar_with_error_bars(tmp_path):
    sv = [{0: 0.2, 1: -0.1}, {0: 1.0, 1: 0.4}]
    se = [{0: 0.05, 1: 0.02}, {0: 0.1, 1: 0.3}]
    p = str(tmp_path / "bar.png")
    report.plot_shapley_bar(sv, p, se=se)
    assert os.path.getsize(p) > 0
    paths = report.render_round_report(str(tmp_path), sv, se=se, round_idx=3)
    assert any(p.endswith("sv_bar_r3.png") for p in paths)


def test_render_round_report_without_plots(tmp_path):
    sv = [{0: 0.2, 1: -0.1}, {0: 1.0, 1: 0.4}]
    paths = report.render_round_report(
        str(tmp_path), sv, round_idx=5, render_plots=False
    )
    assert not any(p.endswith(".png") for p in paths)
    assert os.path.exists(os.path.join(str(tmp_path), "shapley_round.csv"))
