"""Benchmark-runner smoke: config 1 (ViT-Tiny CIFAR-10 exact, the
CPU-runnable BASELINE config) end-to-end with tiny shapes."""

import json
import subprocess
import sys

from benchmarks.run import run_config


def test_config1_exact_tiny():
    res = run_config(1, val_size=32, batch=16)
    assert res["model"] == "ViT-tiny/16"
    assert res["distinct_coalition_evals"] == 7  # 2^3 - 1
    assert res["estimator"] == "exact"
    assert res["coalition_evals_per_s"] > 0


def test_config4_gtg_dirichlet_sizes():
    # micro-ize by monkeypatching the variant to keep CI fast
    from benchmarks import run as br

    orig = dict(br.CONFIGS[4])
    br.CONFIGS[4].update(dict(variant="micro", image=16, classes=4, clients=4))
    try:
        res = br.run_config(4, val_size=16, batch=16)
        assert res["estimator"] == "gtg"
        assert res["distinct_coalition_evals"] >= 2
    finally:
        br.CONFIGS[4] = orig
