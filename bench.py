"""Headline benchmark: coalition-eval throughput for ViT-B/16 (the
reference's live-path model) on the available TPU.

Scenario (BASELINE.json primary metric): exact Shapley round over 3 clients —
7 distinct coalitions, each requiring a full validation pass (512 images,
batch 128) through LoRA-overlaid ViT-B/16. The reference runs these serially
on CPU/GPU torch (game2.py:106-110); here all 7 coalition models evaluate in
one vmapped pass with device-resident data.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline compares against the torch-CPU reference throughput measured on
this machine (bench_baseline.json; remeasure with tools/measure_cpu_baseline.py).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

VAL_SET = 512
BATCH = 128
N_CLIENTS = 3


def main():
    import jax
    import numpy as np

    from shapley_vit_tpu.fl import evaluation as ev
    from shapley_vit_tpu.models import vit as jvit
    from shapley_vit_tpu.ops import tree_math as tm

    spec = jvit.make_spec("base", num_classes=4, dtype="bfloat16")
    base = jvit.init_vit(jax.random.key(0), spec)
    lora0 = jvit.init_lora(jax.random.key(1), spec, classifier_from=base)
    leaves, treedef = jax.tree.flatten(lora0)
    deltas = [
        treedef.unflatten(
            [
                0.02 * jax.random.normal(k, l.shape)
                for k, l in zip(jax.random.split(jax.random.key(i), len(leaves)), leaves)
            ]
        )
        for i in range(N_CLIENTS)
    ]
    stacked = tm.tree_stack(deltas)
    coalitions = [[0], [1], [2], [0, 1], [0, 2], [1, 2], [0, 1, 2]]
    W = tm.coalition_weight_matrix(coalitions, [120, 300, 580], N_CLIENTS)

    rng = np.random.default_rng(0)
    images = jax.device_put(
        rng.normal(size=(VAL_SET, spec.image, spec.image, 3)).astype(np.float32)
    )
    labels = jax.device_put(rng.integers(0, 4, size=VAL_SET))
    jax.block_until_ready(images)
    data = [
        (images[i : i + BATCH], labels[i : i + BATCH]) for i in range(0, VAL_SET, BATCH)
    ]

    fwd = lambda b, lora, x: jvit.vit_forward(b, lora, x, spec)
    evaluator = ev.make_coalition_evaluator(fwd)
    mat = jax.jit(tm.materialize_coalitions)

    def one_round():
        stacked_lora = mat(lora0, stacked, W)
        return evaluator(base, stacked_lora, data, dataset_size=VAL_SET)

    one_round()  # compile + warm-up
    reps = 3
    t0 = time.time()
    for _ in range(reps):
        result = one_round()
    dt = (time.time() - t0) / reps
    assert np.isfinite(result).all()

    evals_per_sec = len(coalitions) / dt

    baseline_path = os.path.join(os.path.dirname(__file__), "bench_baseline.json")
    with open(baseline_path) as f:
        baseline = json.load(f)
    cpu_evals_per_sec = baseline["cpu_coalition_evals_per_sec"]

    print(
        json.dumps(
            {
                "metric": "coalition_evals_per_sec_per_chip_vitb16",
                "value": round(evals_per_sec, 3),
                "unit": f"coalition-evals/s (512-img val set, batch {BATCH}, bf16, 1 chip)",
                "vs_baseline": round(evals_per_sec / cpu_evals_per_sec, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
