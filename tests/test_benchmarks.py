"""Benchmark-runner smoke: config 1 (ViT-Tiny CIFAR-10 exact, the
CPU-runnable BASELINE config) end-to-end with tiny shapes."""

import json
import subprocess
import sys

import pytest

from benchmarks.run import run_config


def test_config1_exact_tiny():
    res = run_config(1, val_size=32, batch=16)
    assert res["model"] == "ViT-tiny/16"
    assert res["distinct_coalition_evals"] == 7  # 2^3 - 1
    assert res["estimator"] == "exact"
    assert res["coalition_evals_per_s"] > 0


def test_config1_merged_eval_mode():
    """--eval-mode merged (the drivers' default execution) runs the suite
    configs through the folded-weights forward."""
    res = run_config(1, val_size=32, batch=16, eval_mode="merged")
    assert res["eval_mode"] == "merged"
    assert res["distinct_coalition_evals"] == 7
    assert res["coalition_evals_per_s"] > 0


@pytest.mark.slow
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


def test_config6_full_delta_int8_micro():
    """Config 6 (whole-tree deltas + int8 fast-eval forward) end-to-end on
    the CPU mesh with a micro model: the quantized full-delta path must
    produce finite utilities for all 2^n-1 coalitions."""
    from benchmarks import run as br

    orig = dict(br.CONFIGS[6])
    br.CONFIGS[6].update(dict(variant="micro", image=16, classes=4, clients=2))
    try:
        res = br.run_config(6, val_size=16, batch=8)
        assert res["estimator"] == "exact"
        assert res["distinct_coalition_evals"] == 3  # 2^2 - 1
        assert res["coalition_evals_per_s"] > 0
    finally:
        br.CONFIGS[6] = orig


def test_config7_train_step_micro():
    """Config 7 (fused multi-client LoRA training throughput) on the CPU
    mesh with a micro model: remat + vmapped fwd+bwd+update must run and
    report finite losses/throughput."""
    from benchmarks import run as br

    orig = dict(br.CONFIGS[7])
    br.CONFIGS[7].update(dict(variant="micro", image=16, classes=4, clients=2, batch=4))
    try:
        res = br.run_config(7, val_size=8, batch=4)
        assert res["estimator"] == "multi_client_train_step"
        assert res["train_images_per_s"] > 0
    finally:
        br.CONFIGS[7] = orig


@pytest.mark.slow
def test_config8_large_n_micro():
    """Config 8 (the large-n frontier) on the CPU mesh with a micro model
    and n=6: all three estimator runs complete with persistence on, and the
    TPU-eval / host-scoring wall split is reported."""
    from benchmarks import run as br

    orig = dict(br.CONFIGS[8])
    br.CONFIGS[8].update(dict(variant="micro", image=16, classes=4, clients=6))
    try:
        res = br.run_config(8, val_size=16, batch=8)
        assert res["estimator"] == "large_n"
        assert set(res["runs"]) == {"cc_fixed_m50n", "cc_adaptive", "mc_10perm"}
        for r in res["runs"].values():
            assert r["evals"] > 0
            assert r["wall_s"] >= r["tpu_eval_s"] >= 0
            assert 0 <= r["host_share_pct"] <= 100
        assert res["runs"]["cc_fixed_m50n"]["m"] == 300  # 50n at n=6
        assert res["persistence"] is True
    finally:
        br.CONFIGS[8] = orig


@pytest.mark.slow
def test_config8_full_families_micro():
    """--families full adds the remaining estimator families (round-4
    VERDICT weak #1) — every row completes with persistence on and reports
    the wall split + an SE."""
    from benchmarks import run as br

    orig = dict(br.CONFIGS[8])
    br.CONFIGS[8].update(dict(variant="micro", image=16, classes=4, clients=5))
    try:
        res = br.run_config(8, val_size=16, batch=8, families="full")
        want = {"cc_fixed_m50n", "cc_adaptive", "mc_10perm",
                "gtg", "fed_sv", "owen", "kernel", "beta_1_4", "banzhaf"}
        assert set(res["runs"]) == want
        for tag in ("gtg", "fed_sv", "owen", "kernel", "beta_1_4", "banzhaf"):
            r = res["runs"][tag]
            assert r["evals"] > 0
            assert r["wall_s"] >= r["tpu_eval_s"] >= 0
            assert 0 <= r["host_share_pct"] <= 100
            assert r["max_se"] >= 0
    finally:
        br.CONFIGS[8] = orig


def test_config8_family_subset():
    """--families accepts a comma-list of family tags: only those rows run
    (no core block — added to finish the n=64 row after the KernelSHAP
    int64-overflow fix without re-paying the core sweep), and unknown tags
    fail loudly."""
    import pytest

    from benchmarks import run as br

    orig = dict(br.CONFIGS[8])
    br.CONFIGS[8].update(dict(variant="micro", image=16, classes=4, clients=5))
    try:
        res = br.run_config(8, val_size=16, batch=8, families="kernel,banzhaf")
        assert set(res["runs"]) == {"kernel", "banzhaf"}
        assert res["families"] == "kernel,banzhaf"
        for r in res["runs"].values():
            assert r["evals"] > 0 and r["max_se"] >= 0
        # the headline row falls back to the first measured family
        assert res["coalition_evals_per_s"] == res["runs"]["kernel"]["evals_per_s"]
        with pytest.raises(ValueError, match="unknown family"):
            br.run_config(8, val_size=16, batch=8, families="nope")
    finally:
        br.CONFIGS[8] = orig
