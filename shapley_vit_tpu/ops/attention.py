"""Fused multi-head attention — Pallas TPU kernel.

The ViT hot path (SURVEY.md §7 build step 7): one kernel computes
``softmax(q·kᵀ/√d)·v`` per (batch, head) without materializing the attention
matrix in HBM. ViT sequence length is 197 (224²/16² + CLS, SURVEY.md §2.3),
which is padded to the 128-lane boundary inside the kernel and masked.

The public entry :func:`fused_attention` is shape/dtype compatible with the
XLA einsum path in ``models/vit.py`` and carries a custom VJP whose backward
recomputes attention with plain XLA ops (eval dominates this workload; the
backward exists so the same forward can sit inside the LoRA training step).

Grid: one program per (batch, head) — q/k/v tiles of [N_pad, D] live in VMEM
(197→256 rows × 64 lanes ≈ 64KB in f32, far under the ~16MB/core budget), and
both matmuls hit the MXU with f32 accumulation.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, seq_len: int, scale: float):
    """One (batch, head): o = softmax(mask(q·kᵀ·scale))·v, f32 throughout."""
    q = q_ref[0, 0].astype(jnp.float32)            # [N_pad, D]
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                                    # [N_pad, N_pad]

    # mask padded KEY positions (cols >= seq_len)
    n_pad = s.shape[-1]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
    s = jnp.where(col_ids < seq_len, s, -jnp.inf)

    # numerically-stable softmax over keys
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    p = e / denom

    o = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )                                            # [N_pad, D]
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _fused_attention_fwd_impl(q, k, v, interpret: bool = False):
    """q/k/v: [B, H, N, D] -> [B, H, N, D]. ``interpret=True`` runs the
    Pallas interpreter (any backend) — used by the CPU correctness tests."""
    B, H, N, D = q.shape
    scale = 1.0 / math.sqrt(D)
    n_pad = _round_up(N, 128)
    d_pad = _round_up(D, 128)
    pad = [(0, 0), (0, 0), (0, n_pad - N), (0, d_pad - D)]
    qp = jnp.pad(q, pad)
    kp = jnp.pad(k, pad)
    vp = jnp.pad(v, pad)

    grid = (B, H)
    spec = pl.BlockSpec(
        (1, 1, n_pad, d_pad), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_attn_kernel, seq_len=N, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B, H, n_pad, d_pad), q.dtype),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * H * n_pad * n_pad * d_pad,
            bytes_accessed=4 * B * H * n_pad * d_pad * 4,
            transcendentals=B * H * n_pad * n_pad,
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :, :N, :D]


def _xla_attention(q, k, v):
    """Reference XLA path (identical math; used for the VJP and as the
    fallback on non-TPU backends)."""
    D = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32))
    s = s / jnp.sqrt(jnp.float32(D))
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32)).astype(q.dtype)


# ---------------------------------------------------------------------------
# v2 kernel: one program per batch item, heads looped in VMEM
# ---------------------------------------------------------------------------

def _attn_v2_kernel(q_ref, k_ref, v_ref, o_ref, *, seq_len: int, heads: int,
                    head_dim: int, scale: float):
    """One batch item, all heads: q/k/v [N_pad, H·D] in the natural
    (pre-transpose) layout. Per head: s = q_h·k_hᵀ·scale → masked softmax →
    ·v_h, all resident in VMEM. Avoids the [B,H,N,D] transposes and the
    128-lane padding waste of the v1 kernel (D=64 stays packed in H·D=768)."""
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    n_pad = q.shape[0]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), dimension=1)
    neg = jnp.float32(-1e30)

    for h in range(heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        qh, kh, vh = q[:, sl], k[:, sl], v[:, sl]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        s = jnp.where(col_ids < seq_len, s, neg)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        oh = jax.lax.dot_general(
            p, vh, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        o_ref[0, :, sl] = oh.astype(o_ref.dtype)


def fused_attention_packed(q, k, v, heads: int, interpret: bool = False):
    """Packed-layout fused MHA: q/k/v [B, N, H·D] -> [B, N, H·D] (no head
    transpose needed on either side)."""
    B, N, HD = q.shape
    head_dim = HD // heads
    scale = 1.0 / math.sqrt(head_dim)
    n_pad = _round_up(N, 128)
    pad = [(0, 0), (0, n_pad - N), (0, 0)]
    qp, kp, vp = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)

    spec = pl.BlockSpec((1, n_pad, HD), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(
            _attn_v2_kernel, seq_len=N, heads=heads, head_dim=head_dim, scale=scale
        ),
        out_shape=jax.ShapeDtypeStruct((B, n_pad, HD), q.dtype),
        grid=(B,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * heads * n_pad * n_pad * head_dim,
            bytes_accessed=4 * B * n_pad * HD * 4,
            transcendentals=B * heads * n_pad * n_pad,
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :N, :]


def pallas_enabled() -> bool:
    """TPU Pallas path gate. Opt-in via SVT_ENABLE_PALLAS=1: this container
    routes Mosaic compiles through a remote service that can stall for
    minutes, so the XLA path is the default until the kernel is warmed.
    SVT_PALLAS_INTERPRET=1 enables the path on ANY backend through the
    Pallas interpreter — the CPU wiring-correctness tests use it."""
    import os

    if os.environ.get("SVT_PALLAS_INTERPRET", "0") == "1":
        return True
    return os.environ.get("SVT_ENABLE_PALLAS", "0") == "1" and jax.default_backend() == "tpu"


def pallas_interpret() -> bool:
    """Whether gated Pallas call sites should run the interpreter."""
    import os

    return os.environ.get("SVT_PALLAS_INTERPRET", "0") == "1"


@jax.custom_vjp
def fused_attention(q, k, v):
    """Fused MHA: [B, H, N, D] q/k/v -> context [B, H, N, D].

    Forward runs the Pallas kernel when enabled on TPU (XLA math elsewhere;
    the SVT_PALLAS_INTERPRET escape routes through the Pallas interpreter —
    never a compiled Mosaic kernel on a non-TPU backend); backward
    recomputes with XLA ops (flash-style recomputation: no attention matrix
    is saved as a residual).
    """
    if pallas_enabled():
        return _fused_attention_fwd_impl(q, k, v, interpret=pallas_interpret())
    return _xla_attention(q, k, v)


def _fwd(q, k, v):
    return fused_attention(q, k, v), (q, k, v)


def _bwd(res, g):
    q, k, v = res
    _, vjp = jax.vjp(_xla_attention, q, k, v)
    return vjp(g)


fused_attention.defvjp(_fwd, _bwd)
