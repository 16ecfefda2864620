"""Validate ``suggest_coalition_chunk`` against the compiler's own memory
analysis (round-2 VERDICT weak #4: the activation_multiplier=20 estimate was
a single-point fit at ViT-B/224/B=128).

Method: AOT-lower the vmapped coalition eval step at two coalition counts
with ABSTRACT inputs (no weights materialized), compile, and read
``memory_analysis()``. The difference between C2 and C1 isolates the
per-coalition memory slope; extrapolating to the HBM limit gives the
compiler-certified max chunk, compared against the estimator's suggestion.

Each compile goes through the remote compiler (~minutes for ViT-L) — run
solo, results land in BENCH_NOTES.

Usage: python tools/chunk_calibration.py [--configs base:128,large:128]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def analyze(variant: str, batch: int, image: int = 224, cs=(2, 4)):
    import jax
    import jax.numpy as jnp

    from shapley_vit_tpu.fl import evaluation as ev
    from shapley_vit_tpu.models import vit as jvit

    spec = jvit.make_spec(variant, image=image, num_classes=4, dtype="bfloat16",
                          gelu="tanh")

    def abstract_tree(tree):
        return jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tree
        )

    # abstract shapes only — no ViT-L weights materialized on host/device
    base_s = abstract_tree(jax.eval_shape(lambda: jvit.init_vit(jax.random.key(0), spec)))
    lora_s = abstract_tree(jax.eval_shape(lambda: jvit.init_lora(jax.random.key(1), spec)))
    img_s = jax.ShapeDtypeStruct((batch, image, image, 3), jnp.float32)
    lab_s = jax.ShapeDtypeStruct((batch,), jnp.int32)

    fwd = lambda b, l, x: jvit.vit_forward(b, l, x, spec)
    vstep = jax.vmap(
        lambda s, p, x, y: ev.eval_step_metrics(fwd(s, p, x), y),
        in_axes=(None, 0, None, None),
    )

    mem = {}
    for C in cs:
        stacked_s = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct((C,) + x.shape, x.dtype), lora_s
        )
        compiled = jax.jit(vstep).lower(base_s, stacked_s, img_s, lab_s).compile()
        ma = compiled.memory_analysis()
        mem[C] = dict(
            temp=int(ma.temp_size_in_bytes),
            args=int(ma.argument_size_in_bytes),
            out=int(ma.output_size_in_bytes),
        )
        print(f"{variant} B={batch} C={C}: temp={mem[C]['temp'] / 1e9:.2f}GB "
              f"args={mem[C]['args'] / 1e9:.2f}GB", flush=True)

    c1, c2 = cs
    slope = (mem[c2]["temp"] - mem[c1]["temp"]) / (c2 - c1)
    fixed = mem[c1]["temp"] - c1 * slope + mem[c1]["args"]
    hbm = ev.device_hbm_bytes()
    max_chunk = int((hbm * 0.9 - fixed) / slope) if slope > 0 else 10**6
    suggested = ev.suggest_coalition_chunk(spec.seq_len, spec.hidden, batch)
    return dict(
        variant=variant, batch=batch,
        per_coalition_gb=round(slope / 1e9, 3),
        fixed_gb=round(fixed / 1e9, 3),
        compiler_max_chunk=max_chunk,
        estimator_chunk=suggested,
        safe=bool(suggested <= max_chunk),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", type=str, default="base:128,large:128")
    args = ap.parse_args()

    from shapley_vit_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
        )
    )
    out = []
    for part in args.configs.split(","):
        variant, batch = part.split(":")
        res = analyze(variant, int(batch))
        print(json.dumps(res), flush=True)
        out.append(res)
    print(json.dumps({"results": out}))


if __name__ == "__main__":
    main()
