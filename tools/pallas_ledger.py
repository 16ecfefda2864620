"""On-TPU ledger run for the MLP-block and patch-embed Pallas kernels.

Round-1 measured the three attention kernels in-ViT and recorded them as
losses to XLA (BENCH_NOTES.md). This tool closes the ledger for the other
two shipped kernels (round-2 VERDICT missing #3): same protocol — the full
ViT-B forward at the headline shape (B=128, 224px, bf16+tanh, no int8 since
the pallas path bypasses quant), dispatched timing with scalar readback,
XLA vs each kernel variant.

Usage (solo on the TPU; SVT_ENABLE_PALLAS is set internally):
  python tools/pallas_ledger.py [--batch 128] [--reps 20]

NOTE: first pallas compile goes through the remote Mosaic service
(~minutes); the timing loop only starts after warm-up.
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
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    os.environ["SVT_ENABLE_PALLAS"] = "1"

    import jax
    import jax.numpy as jnp

    from shapley_vit_tpu.models import vit as jvit
    from shapley_vit_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
        )
    )

    # patch_pallas is OFF by default: the Mosaic toolchain crashes lowering
    # the in-kernel patchify relayout at 224px (HTTP 500 from the remote
    # compiler, traced to the reshape/transpose — BENCH_NOTES round 3)
    variants = {
        "xla": dict(),
        "mlp_pallas": dict(mlp_impl="pallas"),
        "mlp_pallas_rows512": dict(mlp_impl="pallas", _env={"SVT_MLP_BLOCK_ROWS": "512"}),
        "mlp_pallas_rows1024": dict(mlp_impl="pallas", _env={"SVT_MLP_BLOCK_ROWS": "1024"}),
    }
    if os.environ.get("SVT_LEDGER_PATCH") == "1":
        variants["patch_pallas"] = dict(patch_impl="pallas")
    base_spec = jvit.make_spec("base", num_classes=4, dtype="bfloat16", gelu="tanh")
    base = jvit.init_vit(jax.random.key(0), base_spec)
    rng = np.random.default_rng(0)
    images = jax.device_put(
        rng.normal(size=(args.batch, 224, 224, 3)).astype(np.float32)
    )
    jax.block_until_ready(images)

    results = {}
    for name, over in variants.items():
        over = dict(over)
        env = over.pop("_env", {})
        for k, v in env.items():
            os.environ[k] = v
        spec = base_spec.replace(**over)

        @jax.jit
        def fwd(b, x, spec=spec):
            # scalar readback: a 128x4 logits fetch per rep would ride the
            # tunnel; the abs-sum keeps the measurement on-device
            return jnp.abs(jvit.vit_forward(b, None, x, spec)).sum()

        t0 = time.time()
        out = float(fwd(base, images))  # compile + warm
        compile_s = time.time() - t0
        assert np.isfinite(out)
        t0 = time.time()
        for _ in range(args.reps):
            out = float(fwd(base, images))
        dt = (time.time() - t0) / args.reps
        results[name] = {
            "fwd_ms": round(dt * 1e3, 2),
            "compile_s": round(compile_s, 1),
        }
        print(f"{name:20s} fwd={dt * 1e3:7.2f} ms (compile {compile_s:.0f}s)",
              flush=True)
        for k in env:
            os.environ.pop(k, None)

    for k in results:
        if k != "xla":
            results[k]["vs_xla"] = round(
                results[k]["fwd_ms"] / results["xla"]["fwd_ms"], 3
            )
    print(json.dumps({"batch": args.batch, "reps": args.reps, "results": results}))


if __name__ == "__main__":
    main()
