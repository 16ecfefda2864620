"""CSVLogger tests incl. the histo/image summaries (working versions of the
reference's broken-TF methods, utils/logger.py:34-85)."""

import csv
import os

import numpy as np

from shapley_vit_tpu.utils.logging import CSVLogger, get_logger


def test_csv_logger_rows_and_naming(tmp_path):
    with CSVLogger(str(tmp_path), dist_rank=2, exp_id="e1", mode="test") as lg:
        lg.log(["a", 1, 2.5])
        lg.print("hello")
    path = os.path.join(str(tmp_path), "party2_e1_test_log.csv")
    assert os.path.exists(path)  # reference naming (utils/logger.py:17)
    rows = list(csv.reader(open(path)))
    assert rows[0] == ["a", "1", "2.5"]
    assert rows[1][1] == "hello"


def test_scalar_and_histo_summary(tmp_path, rng):
    with CSVLogger(str(tmp_path)) as lg:
        lg.scalar_summary("acc", 0.5, step=1)
        lg.histo_summary("grads", rng.normal(size=100), step=1, bins=4)
    rows = list(csv.DictReader(open(lg.metrics_path)))
    tags = {r["tag"] for r in rows}
    assert "acc" in tags and "grads/mean" in tags and "grads/q75" in tags
    # quantiles monotone
    qs = [float(r["value"]) for r in rows if r["tag"].startswith("grads/q")]
    assert qs == sorted(qs)


def test_image_summary(tmp_path, rng):
    with CSVLogger(str(tmp_path)) as lg:
        lg.image_summary("samples", rng.random((3, 8, 8, 1)), step=0)
    pngs = [f for f in os.listdir(tmp_path) if f.endswith(".png")]
    assert pngs and os.path.getsize(os.path.join(tmp_path, pngs[0])) > 0


def test_get_logger_idempotent(tmp_path):
    l1 = get_logger("svt_test", str(tmp_path / "a.log"))
    n = len(l1.handlers)
    l2 = get_logger("svt_test", str(tmp_path / "a.log"))
    assert l2 is l1 and len(l2.handlers) == n  # no duplicate handlers
