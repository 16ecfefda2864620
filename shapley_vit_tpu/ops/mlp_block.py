"""Fused LayerNorm→MLP→residual — Pallas TPU kernel.

The ViT MLP block (reference hot path: HF ViTLayer intermediate+output
dense, utils.py:887 forward) costs ~43% of the forward (ablation, round 1).
XLA materializes the [M, 4D] GELU intermediate in HBM between the two
matmuls; this kernel keeps it in VMEM: one program computes
``out = x + (gelu(LN(x)·W1 + b1))·W2 + b2`` for a tile of tokens, with both
matmuls on the MXU (f32 accumulation) and LN/GELU on the VPU.

VMEM budget per program (ViT-B, bf16): W1+W2 ≈ 9.4MB + x/h tiles ≈ 2MB —
comfortably under the ~16MB/core budget. Token tiles of 256 rows.

Gated like the attention kernel (SVT_ENABLE_PALLAS); interpret-mode tests
prove numerics on CPU; ``ViTSpec.mlp_impl="pallas"`` wires it into the
forward.

MEASURED ON TPU (round 3, tools/pallas_ledger.py): in-ViT forward at
B=128/224px/bf16 runs 1.02-1.07x SLOWER than XLA at 256/512/1024-token
tiles. The eval path is compute-bound (BENCH_NOTES round 2: 108-125
TFLOP/s effective vs the chip's 121-142 peak), so saving the [M, 4D] HBM
round-trip buys nothing while Mosaic loses XLA's tuned epilogue fusion.
Kept for study; off by default — same verdict as the attention kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _mlp_kernel(x_ref, ls_ref, lb_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
                *, eps: float, rows: int, approximate_gelu: bool):
    x = x_ref[:].astype(jnp.float32)                 # [T, D]
    # LayerNorm (f32 stats, matching models/vit._layer_norm)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * ls_ref[:].astype(jnp.float32) + lb_ref[:].astype(jnp.float32)

    h = jax.lax.dot_general(
        y.astype(w1_ref.dtype), w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[:].astype(jnp.float32)                # [T, M]
    # exact erf GELU for HF parity; tanh for the fast-eval mode (matches
    # models/vit._block's spec.gelu flavors — the f32 h makes exact here
    # equivalent to 'exact_f32')
    h = jax.nn.gelu(h, approximate=approximate_gelu)

    out = jax.lax.dot_general(
        h.astype(w2_ref.dtype), w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[:].astype(jnp.float32)                # [T, D]

    # residual; padded rows just write garbage that the caller slices off
    o_ref[:] = (x + out).astype(o_ref.dtype)


def fused_mlp_block(
    x: jax.Array, ln_scale: jax.Array, ln_bias: jax.Array,
    w1: jax.Array, b1: jax.Array, w2: jax.Array, b2: jax.Array,
    eps: float = 1e-12, block_rows: int = 256, interpret: bool = False,
    approximate_gelu: bool = False,
) -> jax.Array:
    """``x [M, D] -> x + MLP(LN(x))`` with the [M, 4D] intermediate never
    touching HBM. Weights use their input dtype on the MXU with f32
    accumulation."""
    M, D = x.shape
    H = w1.shape[1]
    m_pad = _round_up(M, block_rows)
    xp = jnp.pad(x, ((0, m_pad - M), (0, 0)))
    grid = (m_pad // block_rows,)

    out = pl.pallas_call(
        functools.partial(
            _mlp_kernel, eps=eps, rows=block_rows,
            approximate_gelu=approximate_gelu,
        ),
        out_shape=jax.ShapeDtypeStruct((m_pad, D), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * m_pad * D * H,
            bytes_accessed=(m_pad * D * 2 + D * H * 2) * 2,
            transcendentals=m_pad * H,
        ),
        interpret=interpret,
    )(xp, ln_scale, ln_bias, w1, b1, w2, b2)
    return out[:M]
