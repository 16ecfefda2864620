"""Measure the int8 coalition-eval path vs bf16 on the real TPU.

Reports (1) single-forward time ViT-B B=128 for bf16/tanh vs int8/tanh,
(2) fused 7-coalition round time (the bench.py scenario) for both, and
(3) argmax agreement + logit drift of int8 vs the exact-f32 parity mode.
Run: python tools/quant_ablation.py  (real TPU; ~minutes cold compile)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from shapley_vit_tpu.utils.runtime import enable_compile_cache

enable_compile_cache(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

import jax.numpy as jnp
import numpy as np

from shapley_vit_tpu.models import vit as jvit
from shapley_vit_tpu.ops import tree_math as tm
from shapley_vit_tpu.fl.evaluation import eval_step_metrics

VAL, BATCH, NC = 512, 128, 3


def readback(out):
    # axon remote backend: block_until_ready does not force execution
    # through the tunnel — np.asarray readback is required (CLAUDE.md)
    return jax.tree.map(np.asarray, out)


def timeit(fn, *args, reps=5):
    out = readback(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = readback(fn(*args))
    return (time.time() - t0) / reps, out


VARIANTS = {
    "bf16": {},
    "int8_all": dict(quant="int8"),
    "int8_nofc2": dict(quant="int8", quant_targets=("patch", "q", "k", "v", "out", "fc1")),
    "int8_mlp_qkv": dict(quant="int8", quant_targets=("q", "k", "v", "fc1", "fc2")),
    "int8_fc1_qkv": dict(quant="int8", quant_targets=("q", "k", "v", "fc1")),
}


def main():
    print("backend:", jax.default_backend())
    spec_bf = jvit.make_spec("base", num_classes=4, dtype="bfloat16", gelu="tanh")
    spec_q = spec_bf.replace(quant="int8")
    spec_f32 = jvit.make_spec("base", num_classes=4)  # exact parity mode

    base = jvit.init_vit(jax.random.key(0), spec_bf)
    lora0 = jvit.init_lora(jax.random.key(1), spec_bf, classifier_from=base)
    leaves, treedef = jax.tree.flatten(lora0)
    deltas = [
        treedef.unflatten(
            [0.02 * jax.random.normal(k, l.shape)
             for k, l in zip(jax.random.split(jax.random.key(i), len(leaves)), leaves)]
        )
        for i in range(NC)
    ]
    stacked = tm.tree_stack(deltas)
    W = tm.coalition_weight_matrix(
        [[0], [1], [2], [0, 1], [0, 2], [1, 2], [0, 1, 2]], [120, 300, 580], NC
    )
    rng = np.random.default_rng(0)
    nb = VAL // BATCH
    ims = jax.device_put(rng.normal(size=(nb, BATCH, 224, 224, 3)).astype(np.float32))
    labs = jax.device_put(rng.integers(0, 4, size=(nb, BATCH)))
    Wd = jnp.asarray(W)
    jax.block_until_ready(ims)

    # --- single forward, one batch ---
    x1 = ims[0]
    for name, kw in VARIANTS.items():
        sp = spec_bf.replace(**kw)
        f = jax.jit(lambda b, l, x, sp=sp: jvit.vit_forward(b, l, x, sp))
        dt, _ = timeit(f, base, lora0, x1)
        print(f"forward {name}: {dt*1000:.1f} ms  ({BATCH/dt:.0f} img/s)", flush=True)

    # --- fused 7-coalition round (bench scenario) ---
    def make_round(sp):
        @jax.jit
        def fused(base, lora0, stacked, Wm, ims, labs):
            sl = tm.materialize_coalitions(lora0, stacked, Wm)
            merged = jvit.merge_coalition_weights(base, sl, sp)
            vstep = jax.vmap(
                lambda b, m, x, y: eval_step_metrics(
                    jvit.vit_forward_merged(b, m, x, sp), y
                ),
                in_axes=(None, 0, None, None),
            )

            def body(c, xy):
                cc, ll = vstep(base, merged, xy[0], xy[1])
                return (c[0] + cc, c[1] + ll), None

            C = Wm.shape[0]
            (corr, loss), _ = jax.lax.scan(body, (jnp.zeros(C), jnp.zeros(C)), (ims, labs))
            return corr / VAL, loss / VAL

        return fused

    results = {}
    for name, kw in VARIANTS.items():
        sp = spec_bf.replace(**kw)
        f = make_round(sp)
        dt, out = timeit(f, base, lora0, stacked, Wd, ims, labs, reps=3)
        results[name] = np.stack([out[0], out[1]], 1)
        print(f"round {name}: {dt:.3f} s  -> {7/dt:.2f} coalition-evals/s", flush=True)

    # --- agreement vs exact f32 on per-image argmax ---
    f32_logits = jax.jit(lambda b, l, x: jvit.vit_forward(b, l, x, spec_f32))
    ref = [np.asarray(f32_logits(base, lora0, ims[i])) for i in range(nb)]
    for name, kw in VARIANTS.items():
        sp = spec_bf.replace(**kw)
        q_logits = jax.jit(lambda b, l, x, sp=sp: jvit.vit_forward(b, l, x, sp))
        agree = n = 0
        drift = 0.0
        for i in range(nb):
            lf = ref[i]
            lq = np.asarray(q_logits(base, lora0, ims[i]))
            agree += (lf.argmax(1) == lq.argmax(1)).sum()
            drift = max(drift, float(np.abs(lf - lq).max()))
            n += lf.shape[0]
        print(
            f"agreement {name} vs exact-f32: {agree/n*100:.2f}%  "
            f"max logit drift {drift:.4f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
