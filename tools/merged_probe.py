"""A/B probe: overlay-path vs merged-weights coalition evaluator (real TPU).

bench.py's fused round folds the LoRA overlay into dense per-coalition q/v
kernels (``merge_coalition_weights``) — round-1 measured merged+scan at +7%
over the overlay path. The PRODUCTION evaluator (driver/serve.py,
driver/start.py via make_eval_backend) still runs the overlay path (two
skinny rank-16 matmuls per q/v per layer per coalition, stranding MXU
lanes). This probe measures both through the SAME evaluator protocol the
service uses (per-batch dispatch, C=7, batch 128) to decide whether wiring
merged mode into the drivers pays.

Usage (solo on the TPU): python tools/merged_probe.py [--val-size 512]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--val-size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--no-quant", action="store_true")
    args = ap.parse_args()

    import jax

    from shapley_vit_tpu.fl import evaluation as ev
    from shapley_vit_tpu.models import vit as jvit
    from shapley_vit_tpu.ops import tree_math as tm
    from shapley_vit_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
        )
    )

    spec = jvit.make_spec(
        "base", num_classes=4, dtype="bfloat16", gelu="tanh",
        quant="none" if args.no_quant else "int8",
        quant_targets=jvit.INT8_TARGETS,
    )
    base = jvit.init_vit(jax.random.key(0), spec)
    lora0 = jvit.init_lora(jax.random.key(1), spec, classifier_from=base)
    leaves, treedef = jax.tree.flatten(lora0)
    deltas = [
        treedef.unflatten(
            [0.02 * jax.random.normal(k, l.shape)
             for k, l in zip(jax.random.split(jax.random.key(i), len(leaves)), leaves)]
        )
        for i in range(3)
    ]
    stacked = tm.tree_stack(deltas)
    coalitions = [[0], [1], [2], [0, 1], [0, 2], [1, 2], [0, 1, 2]]
    W = tm.coalition_weight_matrix(coalitions, [120, 300, 580], 3)

    rng = np.random.default_rng(0)
    images = jax.device_put(
        rng.normal(size=(args.val_size, 224, 224, 3)).astype(np.float32)
    )
    labels = jax.device_put(rng.integers(0, 4, size=args.val_size))
    jax.block_until_ready(images)
    data = [
        (images[i : i + args.batch], labels[i : i + args.batch])
        for i in range(0, args.val_size, args.batch)
    ]

    mat = jax.jit(tm.materialize_coalitions)
    mat_merge = jax.jit(
        lambda b, o, s, Wm: jvit.merge_coalition_weights(
            b, tm.materialize_coalitions(o, s, Wm), spec
        )
    )

    overlay_eval = ev.make_coalition_evaluator(
        lambda b, l, x: jvit.vit_forward(b, l, x, spec)
    )
    merged_eval = ev.make_coalition_evaluator(
        lambda b, m, x: jvit.vit_forward_merged(b, m, x, spec)
    )

    def run_overlay():
        return overlay_eval(base, mat(lora0, stacked, W), data,
                            dataset_size=args.val_size)

    def run_merged():
        return merged_eval(base, mat_merge(base, lora0, stacked, W), data,
                           dataset_size=args.val_size)

    results = {}
    for name, fn in (("overlay", run_overlay), ("merged", run_merged)):
        r0 = fn()  # compile + warm
        t0 = time.time()
        for _ in range(args.reps):
            r = fn()
        dt = (time.time() - t0) / args.reps
        results[name] = {
            "round_s": round(dt, 3),
            "evals_per_s": round(len(coalitions) / dt, 3),
        }
        print(f"{name:8s} {dt:.3f} s/round = {len(coalitions) / dt:.3f} evals/s",
              flush=True)
        np.testing.assert_allclose(r[:, 0], r0[:, 0])
    print(json.dumps({"val_size": args.val_size, "batch": args.batch,
                      "quant": spec.quant, "results": results}))


if __name__ == "__main__":
    main()
