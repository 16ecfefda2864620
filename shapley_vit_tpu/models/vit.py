"""Functional ViT with a LoRA overlay — the live-path model.

TPU-native re-design of the reference's model construction
(``shapleyserver/start.py:258-288``: HF ``ViTForImageClassification`` on
``google/vit-base-patch16-224-in21k`` with a 4-class head, wrapped in peft LoRA
``r=16, alpha=8, targets=[query,value], modules_to_save=[classifier]`` and
``nn.DataParallel``). Semantics match HF ViT exactly (pre-LN encoder, erf-GELU,
learned position embeddings incl. CLS, classifier on the CLS token) — verified
by the parity tests in ``tests/test_vit_parity.py`` against
``transformers.ViTForImageClassification`` + peft on random weights.

Design choices for TPU:

* **Params are plain pytrees**, split into a frozen ``base`` tree and a small
  ``lora`` tree (LoRA A/B for q,v per layer + the classifier). Client deltas
  only touch the ``lora`` tree, so coalition evaluation vmaps over stacked
  LoRA trees while the 86M-param base stays resident once (SURVEY.md §7
  "stacked-LoRA coalition eval memory").
* **Blocks are stacked on a depth axis** and the encoder runs as one
  ``lax.scan`` — one compiled block regardless of depth, fast compiles, and
  identical math per layer maps cleanly onto the MXU.
* **Patch embedding is a reshape + matmul**, not a conv: with stride == kernel
  == patch size the conv is exactly a blocked matmul, which feeds the MXU
  without XLA having to pattern-match the convolution.
* Compute dtype is configurable (bf16 on TPU, f32 for parity runs); LayerNorm
  statistics and softmax always accumulate in f32.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp

PyTree = Any


@dataclass(frozen=True)
class ViTSpec:
    """Architecture hyperparameters (HF ViTConfig equivalents)."""

    hidden: int = 768
    depth: int = 12
    heads: int = 12
    mlp_dim: int = 3072
    patch: int = 16
    image: int = 224
    channels: int = 3
    num_classes: int = 4
    layernorm_eps: float = 1e-12   # HF ViTConfig default
    # LoRA (reference start.py:274-276)
    lora_r: int = 16
    lora_alpha: float = 8.0
    # numerics
    dtype: str = "float32"         # activation/compute dtype: float32 | bfloat16
    # kernel selection: 'xla' einsum path or 'pallas' fused-attention kernel
    attention_impl: str = "xla"
    # MLP-block implementation: 'xla' (fused by the compiler) or 'pallas'
    # (ops/mlp_block.fused_mlp_block — LN2→fc1→GELU→fc2→residual in one
    # program, the [M, 4D] intermediate never touching HBM). The pallas
    # path bypasses int8 quant on fc1/fc2; gate via SVT_ENABLE_PALLAS like
    # attention. On-TPU ledger: BENCH_NOTES.md round 3.
    mlp_impl: str = "xla"
    # patch-embedding implementation: 'xla' (_patchify + matmul) or
    # 'pallas' (ops/patch_embed.patch_embed — fused relayout+projection)
    patch_impl: str = "xla"
    # GELU flavor: 'exact_f32' (HF parity: erf in f32), 'exact' (erf in the
    # compute dtype), 'tanh' (tanh approximation in the compute dtype — the
    # fast TPU path, −17% forward time at bf16; ablation round 1)
    gelu: str = "exact_f32"
    # matmul quantization: 'none' | 'int8' (dynamic W8A8 for the dense
    # projections + MLP — the v5e MXU runs int8 at 2× bf16; softmax/LN/
    # attention einsums/classifier stay high precision; ops/quant.py)
    quant: str = "none"
    # which dense matmuls quantize under quant='int8' (accuracy/speed knob;
    # fc2's post-GELU activations are the usual outlier source)
    quant_targets: tuple = ("patch", "q", "k", "v", "out", "fc1", "fc2")
    # the measured-best production target set is INT8_TARGETS (module
    # constant below): quantizing fc2/out/patch costs more than their int8
    # gain on v5e (tools/quant_ablation.py, tools/full_delta_profile.py)
    # rematerialize each scanned block on the backward pass
    # (jax.checkpoint): activation memory drops from O(L·intermediates) to
    # O(L·residual + one block) — required for full-model (non-LoRA)
    # fine-tuning of base/large variants (SURVEY.md §7 "hard parts")
    remat: bool = False

    @property
    def num_patches(self) -> int:
        return (self.image // self.patch) ** 2

    @property
    def seq_len(self) -> int:
        return self.num_patches + 1  # + CLS

    @property
    def head_dim(self) -> int:
        return self.hidden // self.heads

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    def replace(self, **kw) -> "ViTSpec":
        return dataclasses.replace(self, **kw)


VIT_VARIANTS = {
    # standard ViT family (reference live path uses 'base'; BASELINE.json
    # configs also exercise tiny/small/large)
    "tiny": dict(hidden=192, depth=12, heads=3, mlp_dim=768),
    "small": dict(hidden=384, depth=12, heads=6, mlp_dim=1536),
    "base": dict(hidden=768, depth=12, heads=12, mlp_dim=3072),
    "large": dict(hidden=1024, depth=24, heads=16, mlp_dim=4096),
    # micro: CI-sized fixture for fast tests
    "micro": dict(hidden=32, depth=2, heads=2, mlp_dim=64, patch=4, image=16),
}


# measured-best int8 target set on v5e (BENCH_NOTES.md round 2): q/k/v/fc1
# only — the single source of truth for bench.py, benchmarks, tools and the
# drivers
INT8_TARGETS = ("q", "k", "v", "fc1")


def make_spec(variant: str = "base", **overrides) -> ViTSpec:
    return ViTSpec(**{**VIT_VARIANTS[variant], **overrides})


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _trunc_normal(key, shape, std=0.02):
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, jnp.float32)


def init_vit(key: jax.Array, spec: ViTSpec) -> PyTree:
    """Initialize the frozen base tree (HF-equivalent init distributions).

    Layout: encoder-block leaves carry a leading depth axis [L, ...] so the
    encoder can run as a single ``lax.scan``.
    """
    D, L, M = spec.hidden, spec.depth, spec.mlp_dim
    P, C = spec.patch, spec.channels
    keys = iter(jax.random.split(key, 16))

    def dense(k, din, dout, layers=None):
        shape = (din, dout) if layers is None else (layers, din, dout)
        bshape = (dout,) if layers is None else (layers, dout)
        return {"kernel": _trunc_normal(k, shape), "bias": jnp.zeros(bshape, jnp.float32)}

    return {
        "patch_embed": dense(next(keys), P * P * C, D),
        "cls_token": _trunc_normal(next(keys), (1, 1, D)),
        "pos_embed": _trunc_normal(next(keys), (1, spec.seq_len, D)),
        "blocks": {
            "ln1": {"scale": jnp.ones((L, D)), "bias": jnp.zeros((L, D))},
            "attn": {
                "q": dense(next(keys), D, D, L),
                "k": dense(next(keys), D, D, L),
                "v": dense(next(keys), D, D, L),
                "out": dense(next(keys), D, D, L),
            },
            "ln2": {"scale": jnp.ones((L, D)), "bias": jnp.zeros((L, D))},
            "mlp": {
                "fc1": dense(next(keys), D, M, L),
                "fc2": dense(next(keys), M, D, L),
            },
        },
        "final_ln": {"scale": jnp.ones((D,)), "bias": jnp.zeros((D,))},
        "classifier": dense(next(keys), D, spec.num_classes),
    }


def init_lora(key: jax.Array, spec: ViTSpec, classifier_from: Optional[PyTree] = None) -> PyTree:
    """Initialize the trainable overlay: LoRA A/B for q,v in every block plus
    the classifier head (peft ``modules_to_save=['classifier']`` semantics —
    the head is fully trainable, reference start.py:276).

    peft init: A ~ kaiming-uniform, B = 0 so the overlay starts as identity.
    Our layout is x @ A @ B with A:[D,r], B:[r,D] (peft stores A:[r,in],
    B:[out,r]; ``torch_lora_to_tree`` in fl/ingestion handles the transpose).
    """
    D, L, r = spec.hidden, spec.depth, spec.lora_r
    ka, kb = jax.random.split(key)

    def kaiming_uniform(k, shape, fan_in):
        # peft's exact bound: kaiming_uniform_(a=sqrt(5)) on A[r, in] is
        # gain·sqrt(3/fan_in) with gain = sqrt(2/(1+5)) ⇒ sqrt(1/fan_in).
        # (The generic a=0 kaiming bound sqrt(6/fan_in) is √6≈2.45× larger —
        # B=0 hides it at inference, but training-from-init gradient scales
        # through the LoRA path would deviate from the reference.)
        bound = jnp.sqrt(1.0 / fan_in)
        return jax.random.uniform(k, shape, jnp.float32, -bound, bound)

    lora = {
        "q": {"A": kaiming_uniform(ka, (L, D, r), D), "B": jnp.zeros((L, r, D))},
        "v": {"A": kaiming_uniform(kb, (L, D, r), D), "B": jnp.zeros((L, r, D))},
    }
    if classifier_from is not None:
        classifier = jax.tree.map(jnp.copy, classifier_from["classifier"])
    else:
        classifier = {
            "kernel": jnp.zeros((D, spec.num_classes), jnp.float32),
            "bias": jnp.zeros((spec.num_classes,), jnp.float32),
        }
    return {"lora": lora, "classifier": classifier}


def trainable_params(lora_tree: PyTree) -> int:
    return sum(x.size for x in jax.tree.leaves(lora_tree))


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _layer_norm(x, scale, bias, eps):
    # f32 statistics regardless of compute dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


def _dense(x, kernel, bias, spec: "ViTSpec", name: str = ""):
    """Dense projection in the spec's matmul mode: plain compute-dtype
    matmul, or dynamic-int8 (2× MXU rate on v5e) under ``quant='int8'``
    when ``name`` is in ``spec.quant_targets``."""
    if spec.quant == "int8" and name in spec.quant_targets:
        from shapley_vit_tpu.ops.quant import dynamic_int8_dense

        return dynamic_int8_dense(x, kernel, bias, out_dtype=x.dtype)
    return x @ kernel.astype(x.dtype) + bias.astype(x.dtype)


def _patchify(images: jax.Array, patch: int) -> jax.Array:
    """[B,H,W,C] -> [B, N, patch*patch*C] with HF ordering.

    HF's Conv2d patch embedding contracts over (C, ph, pw) with kernel layout
    [D, C, ph, pw]; flattening our patches as (ph, pw, C) and transposing the
    kernel to [ph*pw*C, D] in the converter keeps the two paths bit-compatible.
    """
    B, H, W, C = images.shape
    gh, gw = H // patch, W // patch
    x = images.reshape(B, gh, patch, gw, patch, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # [B, gh, gw, ph, pw, C]
    return x.reshape(B, gh * gw, patch * patch * C)


def _attention(x, attn_p, lora_p, spec: ViTSpec):
    """Multi-head self-attention with the LoRA overlay folded into q,v.

    q = x·Wq + bq + scaling·(x·Aq)·Bq  — the low-rank path is two skinny
    matmuls, never materializing the [D,D] delta (peft's forward semantics).
    """
    B, N, D = x.shape
    h, hd = spec.heads, spec.head_dim
    scaling = spec.lora_alpha / spec.lora_r

    def proj(p, name):
        y = _dense(x, p["kernel"], p["bias"], spec, name)
        if lora_p is not None and name in lora_p:
            # the rank-r path stays in the compute dtype: it's two skinny
            # matmuls that gain nothing from int8 and would add quant noise
            a = lora_p[name]["A"].astype(x.dtype)
            b = lora_p[name]["B"].astype(x.dtype)
            y = y + (x @ a) @ b * jnp.asarray(scaling, x.dtype)
        return y

    def split_heads(y):
        return y.reshape(B, N, h, hd).transpose(0, 2, 1, 3)

    def einsum_ctx(q, k, v):
        # the ONE XLA attention implementation ([B,h,N,hd] in/out): every
        # non-pallas path — including the pallas2 fallback when the kernel
        # is gated off — must share these numerics (f32 softmax, compute-
        # dtype scaling), not keep a drifting copy
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.asarray(
            jnp.sqrt(jnp.float32(hd)), x.dtype
        )
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", probs, v)

    if spec.attention_impl == "pallas2":
        # packed-layout kernel: no [B,H,N,D] transposes on either side
        from shapley_vit_tpu.ops.attention import (
            fused_attention_packed,
            pallas_enabled,
            pallas_interpret,
        )

        qp = proj(attn_p["q"], "q")
        kp = proj(attn_p["k"], "k")
        vp = proj(attn_p["v"], "v")
        if pallas_enabled():
            ctx = fused_attention_packed(
                qp, kp, vp, heads=h, interpret=pallas_interpret()
            )
        else:
            ctx = einsum_ctx(split_heads(qp), split_heads(kp), split_heads(vp))
            ctx = ctx.transpose(0, 2, 1, 3).reshape(B, N, D)
        return _dense(ctx, attn_p["out"]["kernel"], attn_p["out"]["bias"], spec, "out")

    q = split_heads(proj(attn_p["q"], "q"))
    k = split_heads(proj(attn_p["k"], "k"))
    v = split_heads(proj(attn_p["v"], "v"))

    if spec.attention_impl == "pallas":
        from shapley_vit_tpu.ops.attention import fused_attention

        ctx = fused_attention(q, k, v)
    else:
        ctx = einsum_ctx(q, k, v)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(B, N, D)
    return _dense(ctx, attn_p["out"]["kernel"], attn_p["out"]["bias"], spec, "out")


def _block(x, blk_p, lora_p, spec: ViTSpec):
    """Pre-LN transformer block (HF ViTLayer)."""
    eps = spec.layernorm_eps
    y = _layer_norm(x, blk_p["ln1"]["scale"], blk_p["ln1"]["bias"], eps)
    x = x + _attention(y, blk_p["attn"], lora_p, spec)
    if spec.mlp_impl == "pallas":
        from shapley_vit_tpu.ops.attention import pallas_enabled, pallas_interpret
        from shapley_vit_tpu.ops.mlp_block import fused_mlp_block

        if pallas_enabled():
            import os as _os

            B, N, D = x.shape
            mlp = blk_p["mlp"]
            dt = spec.compute_dtype
            out = fused_mlp_block(
                x.reshape(B * N, D),
                blk_p["ln2"]["scale"].astype(dt),
                blk_p["ln2"]["bias"].astype(dt),
                mlp["fc1"]["kernel"].astype(dt),
                mlp["fc1"]["bias"].astype(dt),
                mlp["fc2"]["kernel"].astype(dt),
                mlp["fc2"]["bias"].astype(dt),
                eps=eps,
                approximate_gelu=spec.gelu == "tanh",
                # token-tile sweep knob for the perf ledger
                block_rows=int(_os.environ.get("SVT_MLP_BLOCK_ROWS", "256")),
                interpret=pallas_interpret(),
            )
            return out.reshape(B, N, D)
    y = _layer_norm(x, blk_p["ln2"]["scale"], blk_p["ln2"]["bias"], eps)
    y = _dense(y, blk_p["mlp"]["fc1"]["kernel"], blk_p["mlp"]["fc1"]["bias"], spec, "fc1")
    if spec.gelu == "exact_f32":  # HF parity: erf GELU with f32 compute
        y = jax.nn.gelu(y.astype(jnp.float32), approximate=False).astype(x.dtype)
    elif spec.gelu == "exact":
        y = jax.nn.gelu(y, approximate=False)
    else:  # 'tanh' — fast TPU path
        y = jax.nn.gelu(y, approximate=True)
    y = _dense(y, blk_p["mlp"]["fc2"]["kernel"], blk_p["mlp"]["fc2"]["bias"], spec, "fc2")
    return x + y


def vit_forward(
    base: PyTree,
    lora: Optional[PyTree],
    images: jax.Array,
    spec: ViTSpec,
) -> jax.Array:
    """ViT forward pass -> logits [B, num_classes].

    Equivalent of the reference's ``net(img).logits`` hot leaf
    (utils.py:887 via HF ViTForImageClassification). ``lora=None`` runs the
    plain base model; otherwise the LoRA q/v overlay and the overlay's
    classifier head are applied (peft ``modules_to_save`` replaces the head).
    """
    dt = spec.compute_dtype
    use_pallas_patch = False
    if spec.patch_impl == "pallas":
        from shapley_vit_tpu.ops.attention import pallas_enabled

        use_pallas_patch = pallas_enabled()
    if use_pallas_patch:
        from shapley_vit_tpu.ops.attention import pallas_interpret
        from shapley_vit_tpu.ops.patch_embed import patch_embed

        x = patch_embed(
            images.astype(dt),
            base["patch_embed"]["kernel"].astype(dt),
            base["patch_embed"]["bias"].astype(dt),
            spec.patch,
            interpret=pallas_interpret(),
        )
    else:
        x = _patchify(images.astype(dt), spec.patch)
        x = _dense(x, base["patch_embed"]["kernel"], base["patch_embed"]["bias"], spec, "patch")
    B = x.shape[0]
    cls = jnp.broadcast_to(base["cls_token"].astype(dt), (B, 1, spec.hidden))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + base["pos_embed"].astype(dt)

    blocks = base["blocks"]
    lora_blocks = lora["lora"] if lora is not None else None

    # one compiled block, scanned over the stacked depth axis; under remat
    # each block recomputes its intermediates on the backward pass
    block_fn = _block
    if spec.remat:
        block_fn = jax.checkpoint(_block, static_argnums=(3,))
    if lora_blocks is None:
        x, _ = jax.lax.scan(lambda c, bp: (block_fn(c, bp, None, spec), None), x, blocks)
    else:
        x, _ = jax.lax.scan(
            lambda c, ps: (block_fn(c, ps[0], ps[1], spec), None), x, (blocks, lora_blocks)
        )

    x = _layer_norm(x, base["final_ln"]["scale"], base["final_ln"]["bias"], spec.layernorm_eps)
    cls_repr = x[:, 0]
    head = lora["classifier"] if lora is not None else base["classifier"]
    logits = cls_repr @ head["kernel"].astype(dt) + head["bias"].astype(dt)
    return logits.astype(jnp.float32)


def merge_coalition_weights(base: PyTree, stacked_lora: PyTree, spec: ViTSpec) -> PyTree:
    """Fold C stacked LoRA overlays into full per-coalition q/v kernels.

    Under coalition-vmap the overlay costs two rank-16 matmuls per q/v per
    layer per coalition — skinny contractions that strand most of the MXU's
    128 lanes. Folding W_eff[c] = W + scale·A_c@B_c up front (a tiny one-off
    einsum) makes the per-coalition forward a plain dense ViT, trading
    ~2·L·D² bf16 bytes per coalition of HBM for full-width matmuls.

    Returns the "varying" tree for the merged forward:
    ``{"q_kernel": [C,L,D,D], "v_kernel": [C,L,D,D], "classifier": {...[C,...]}}``.
    """
    scaling = spec.lora_alpha / spec.lora_r

    def fold(name):
        delta = jnp.einsum(
            "cldr,clre->clde",
            stacked_lora["lora"][name]["A"],
            stacked_lora["lora"][name]["B"],
            precision="highest",
        ) * scaling
        kern = base["blocks"]["attn"][name]["kernel"]
        return (kern[None] + delta).astype(spec.compute_dtype)

    return {
        "q_kernel": fold("q"),
        "v_kernel": fold("v"),
        "classifier": jax.tree.map(lambda x: x, stacked_lora["classifier"]),
    }


def vit_forward_merged(base: PyTree, merged: PyTree, images: jax.Array, spec: ViTSpec) -> jax.Array:
    """Forward for ONE coalition of a merged tree (vmap over the leading C
    axis of ``merged``): base with q/v kernels and the classifier overridden.
    Identical math to ``vit_forward`` with the overlay folded in
    (``test_merged_coalition_forward_matches_overlay``)."""
    blocks = dict(base["blocks"])
    attn = dict(blocks["attn"])
    attn["q"] = {"kernel": merged["q_kernel"], "bias": attn["q"]["bias"]}
    attn["v"] = {"kernel": merged["v_kernel"], "bias": attn["v"]["bias"]}
    blocks["attn"] = attn
    eff_base = dict(base)
    eff_base["blocks"] = blocks
    eff_base["classifier"] = merged["classifier"]
    return vit_forward(eff_base, None, images, spec)


def merge_lora(base: PyTree, lora: PyTree, spec: ViTSpec) -> PyTree:
    """Fold the LoRA overlay into a standalone base tree
    (peft ``merge_and_unload`` equivalent): Wq += scaling·A@B, head replaced."""
    scaling = spec.lora_alpha / spec.lora_r
    merged = jax.tree.map(lambda x: x, base)  # shallow functional copy
    attn = dict(merged["blocks"]["attn"])
    for name in ("q", "v"):
        delta = jnp.einsum(
            "ldr,lre->lde", lora["lora"][name]["A"], lora["lora"][name]["B"],
            precision="highest",
        ) * scaling
        attn[name] = {"kernel": attn[name]["kernel"] + delta, "bias": attn[name]["bias"]}
    blocks = dict(merged["blocks"])
    blocks["attn"] = attn
    merged = dict(merged)
    merged["blocks"] = blocks
    merged["classifier"] = jax.tree.map(jnp.copy, lora["classifier"])
    return merged
