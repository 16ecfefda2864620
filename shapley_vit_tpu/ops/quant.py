"""Dynamic int8 quantized matmul for the coalition-eval fast path.

The v5e MXU runs int8×int8→int32 at twice the bf16 rate, and the ViT forward
is matmul-dominated (MLP ≈ 43% + QKV/out projections ≈ 20% of forward time,
BENCH_NOTES.md ablation). This is an AQT-style W8A8 scheme, hand-rolled
because AQT isn't in the image (CLAUDE.md round-2 candidate #1):

  * activations: dynamic symmetric per-token (per leading-row) scales,
    computed in-graph — one ``max|x|`` reduction that XLA fuses into the
    producer;
  * weights: symmetric per-output-channel scales, quantized in-graph (cost
    O(K·N) elementwise vs the O(rows·K·N) matmul — negligible, and it keeps
    weight trees/checkpoints/coalition algebra unchanged);
  * accumulation in int32, rescale ``acc · s_x · s_w`` and bias add in f32.

Softmax, LayerNorm, attention einsums, and the classifier head stay in the
compute dtype / f32 — quantizing those costs accuracy for ~no time (the
attention matrix at N≈200 is tiny, BENCH_NOTES.md).

Reference equivalent: none — the reference evaluates coalitions in full
f32 torch (utils.py:864-926); this is a beyond-reference throughput mode
gated behind ``ViTSpec.quant='int8'`` with an argmax-agreement contract
(tests/test_quant.py, BENCH_NOTES.md).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def quantize_symmetric(x: jax.Array, axis, bound: float = 127.0):
    """Symmetric int8 quantization along ``axis`` (kept dims): returns
    (int8 values, f32 scale with keepdims)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / bound
    q = jnp.clip(jnp.round(xf / scale), -bound, bound).astype(jnp.int8)
    return q, scale


def dynamic_int8_dense(
    x: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    out_dtype=None,
) -> jax.Array:
    """``x @ kernel + bias`` with both operands dynamically quantized to int8.

    ``x``: [..., K] activations (per-row scales over the last dim);
    ``kernel``: [K, N] (per-column scales). The contraction runs
    int8×int8→int32 on the MXU; the result is rescaled in f32.
    """
    xq, sx = quantize_symmetric(x, axis=-1)          # [..., K] int8, [..., 1]
    wq, sw = quantize_symmetric(kernel, axis=0)      # [K, N] int8, [1, N]
    acc = jax.lax.dot_general(
        xq,
        wq,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * sx * sw.reshape((1,) * (x.ndim - 1) + (-1,))
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype or x.dtype)
