"""Isolate int8 vs bf16 matmul rates and quantization overhead on the TPU.

Shapes: the ViT-B MLP fc1 at the bench scale ([B*N, D] x [D, 4D]).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

M, K, N = 128 * 197, 768, 3072
FLOPS = 2 * M * K * N


def bench(f, *args, reps=10):
    np.asarray(f(*args))  # compile + force
    t0 = time.time()
    for _ in range(reps):
        # readback EVERY rep: on the axon remote backend an unforced dispatch
        # never executes through the tunnel (CLAUDE.md) — forcing only the
        # last rep would time ~one execution divided by reps
        np.asarray(f(*args))
    return (time.time() - t0) / reps


def main():
    rng = np.random.default_rng(0)
    x_bf = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32), jnp.bfloat16)
    w_bf = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.05, jnp.bfloat16)
    x_i8 = jnp.asarray(rng.integers(-127, 127, size=(M, K)), jnp.int8)
    w_i8 = jnp.asarray(rng.integers(-127, 127, size=(K, N)), jnp.int8)

    # return |out|.sum() so only a scalar crosses the tunnel per rep (a raw
    # sum could be algebraically strength-reduced away by XLA; abs cannot)
    @jax.jit
    def dot_bf16(x, w):
        return jnp.abs(x @ w).sum()

    @jax.jit
    def dot_i8(x, w):
        return jnp.abs(jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )).sum()

    @jax.jit
    def dot_i8_rescaled(x, w, sx, sw):
        acc = jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        return jnp.abs((acc.astype(jnp.float32) * sx * sw).astype(jnp.bfloat16)).sum()

    from shapley_vit_tpu.ops.quant import dynamic_int8_dense, quantize_symmetric

    @jax.jit
    def dyn_full(x, w):
        return jnp.abs(dynamic_int8_dense(x, w)).sum()

    wq, sw = quantize_symmetric(w_bf, axis=0)
    wq = jax.device_put(wq)
    sw = jax.device_put(sw)

    @jax.jit
    def dyn_act_only(x, wq, sw):
        xq, sx = quantize_symmetric(x, axis=-1)
        acc = jax.lax.dot_general(
            xq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        return jnp.abs((acc.astype(jnp.float32) * sx * sw).astype(jnp.bfloat16)).sum()

    sx = jnp.ones((M, 1), jnp.float32)
    for name, f, args in [
        ("bf16 dot", dot_bf16, (x_bf, w_bf)),
        ("int8 dot (raw)", dot_i8, (x_i8, w_i8)),
        ("int8 dot + rescale", dot_i8_rescaled, (x_i8, w_i8, sx, sw)),
        ("dynamic W8A8 (quantize both)", dyn_full, (x_bf, w_bf)),
        ("A8 dynamic, W8 pre-quantized", dyn_act_only, (x_bf, wq, sw)),
    ]:
        dt = bench(f, *args)
        print(f"{name:32s} {dt*1e3:7.2f} ms   {FLOPS/dt/1e12:6.1f} T(FL)OP/s", flush=True)


if __name__ == "__main__":
    main()
