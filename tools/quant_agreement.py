"""Argmax-agreement guard for the fast-eval modes (the bench.py contract).

Fine-tunes the LoRA overlay briefly on class-separable synthetic data (so
logits separate — agreement measured on RANDOM-INIT weights is meaningless:
untrained logits cluster inside the quantization noise and even plain
bf16/tanh reads ~98.8%), then measures per-image argmax agreement and max
logit drift of each fast-eval mode against the exact-f32 parity mode.

Contract (BENCH_NOTES.md): every mode shipped as a bench default must hold
>= 99% agreement on this guard. Measured 2026-08-16 on the v5e: 100% for
bf16/tanh, int8 q/k/v/fc1 (the bench mode), and int8-all.

Run: python tools/quant_agreement.py   (real TPU, ~2-4 min warm)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from shapley_vit_tpu.utils.runtime import enable_compile_cache

enable_compile_cache(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

import numpy as np
import optax

from shapley_vit_tpu.fl import training as tr
from shapley_vit_tpu.models import vit as jvit

MODES = {
    "bf16_tanh": {},
    "int8_qkv_fc1 (bench mode)": dict(quant="int8", quant_targets=jvit.INT8_TARGETS),
    "int8_all": dict(quant="int8"),
}
BAR = 0.99


def main():
    spec_bf = jvit.make_spec("base", num_classes=4, dtype="bfloat16", gelu="tanh")
    spec_f32 = jvit.make_spec("base", num_classes=4)
    base = jvit.init_vit(jax.random.key(0), spec_bf)
    lora = jvit.init_lora(jax.random.key(1), spec_bf, classifier_from=base)

    rng = np.random.default_rng(0)
    protos = rng.normal(0.5, 0.15, size=(4, 224, 224, 3)).astype(np.float32)

    def make_batch(n, seed):
        r = np.random.default_rng(seed)
        y = r.integers(0, 4, size=n)
        x = protos[y] + r.normal(0, 0.1, size=(n, 224, 224, 3)).astype(np.float32)
        return np.clip(x, 0, 1).astype(np.float32), y

    opt = optax.adam(1e-3)
    step = tr.make_train_step(
        lambda b, l, x: jvit.vit_forward(b, l, x, spec_bf), opt, num_classes=4
    )
    state = opt.init(lora)
    t0 = time.time()
    for i in range(30):
        x, y = make_batch(64, 100 + i)
        lora, state, loss = step(base, lora, state, x, y, jax.random.key(i))
    print(f"trained 30 steps in {time.time() - t0:.0f}s, loss {float(loss):.4f}", flush=True)

    xs, ys = make_batch(512, 999)
    f32 = jax.jit(lambda b, l, x: jvit.vit_forward(b, l, x, spec_f32))
    ref = np.concatenate(
        [np.asarray(f32(base, lora, xs[i : i + 128])) for i in range(0, 512, 128)]
    )
    print(f"f32 accuracy: {(ref.argmax(1) == ys).mean() * 100:.1f}%", flush=True)

    failed = []

    def check(name, logits_fn):
        lq = np.concatenate(
            [np.asarray(logits_fn(xs[i : i + 128])) for i in range(0, 512, 128)]
        )
        agree = (lq.argmax(1) == ref.argmax(1)).mean()
        drift = np.abs(lq - ref).max()
        status = "PASS" if agree >= BAR else "FAIL"
        if agree < BAR:
            failed.append(name)
        print(
            f"{status} {name:28s} agreement {agree * 100:.2f}%  max drift {drift:.4f}",
            flush=True,
        )

    for name, kw in MODES.items():
        sp = spec_bf.replace(**kw)
        f = jax.jit(lambda b, l, x, sp=sp: jvit.vit_forward(b, l, x, sp))
        check(name, lambda xb, f=f: f(base, lora, xb))

    # merged-weights execution — the serve/start default
    # (model.eval_mode="merged" + int8 bench targets): LoRA folded into
    # dense q/v kernels at bf16, then the same quantized forward
    from shapley_vit_tpu.ops import tree_math as tm

    sp = spec_bf.replace(quant="int8", quant_targets=jvit.INT8_TARGETS)
    merged = jvit.merge_coalition_weights(
        base,
        tm.materialize_coalitions(
            lora, tm.tree_stack([tm.tree_zeros_like(lora)]),
            np.zeros((1, 1), np.float32),
        ),
        sp,
    )
    m1 = jax.tree.map(lambda a: a[0], merged)
    fm = jax.jit(lambda b, m, x: jvit.vit_forward_merged(b, m, x, sp))
    check("merged_int8 (serve mode)", lambda xb: fm(base, m1, xb))
    if failed:
        raise SystemExit(f"agreement below {BAR:.0%} for: {failed}")
    print("all fast-eval modes meet the agreement contract")


if __name__ == "__main__":
    main()
