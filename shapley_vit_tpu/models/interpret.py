"""Model interpretability: attention rollout and Grad-CAM for the ViT.

The reference exposes ``--use-grad-cam`` / ``--use-grad-cam-layers`` flags
(opts.py:70-73) with no in-repo implementation (the grad-cam code lives
outside the repo). Here the capability is first-class, ViT-native:

  * :func:`attention_rollout` — Abnar & Zuidema-style rollout: average
    attention over heads, add identity (residual), row-normalize, and
    cumulatively matmul through the layers; the CLS row gives a patch
    saliency map.
  * :func:`grad_cam` — gradient of the target-class logit w.r.t. the token
    activations entering the final LN, token-weighted by the gradient
    (ViT analogue of CAM over the last feature map).

Both run a side-channel forward that collects per-layer attention (the hot
path in models/vit.py stays collection-free).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from shapley_vit_tpu.models.vit import ViTSpec, _layer_norm, _patchify

PyTree = object


def _attention_with_probs(x, attn_p, lora_p, spec: ViTSpec):
    """Same math as models/vit._attention, also returning softmax probs."""
    B, N, D = x.shape
    h, hd = spec.heads, spec.head_dim
    scaling = spec.lora_alpha / spec.lora_r

    def proj(p, name):
        y = x @ p["kernel"].astype(x.dtype) + p["bias"].astype(x.dtype)
        if lora_p is not None and name in lora_p:
            a = lora_p[name]["A"].astype(x.dtype)
            b = lora_p[name]["B"].astype(x.dtype)
            y = y + (x @ a) @ b * jnp.asarray(scaling, x.dtype)
        return y

    q = proj(attn_p["q"], "q").reshape(B, N, h, hd).transpose(0, 2, 1, 3)
    k = proj(attn_p["k"], "k").reshape(B, N, h, hd).transpose(0, 2, 1, 3)
    v = proj(attn_p["v"], "v").reshape(B, N, h, hd).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.asarray(
        jnp.sqrt(jnp.float32(hd)), x.dtype
    )
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(x.dtype), v)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(B, N, D)
    out = ctx @ attn_p["out"]["kernel"].astype(x.dtype) + attn_p["out"]["bias"].astype(x.dtype)
    return out, probs


def _forward_collect(base: PyTree, lora: Optional[PyTree], images, spec: ViTSpec):
    """Forward returning (logits, per-layer attention [L,B,H,N,N], tokens
    entering final LN [B,N,D])."""
    dt = spec.compute_dtype
    x = _patchify(images.astype(dt), spec.patch)
    x = x @ base["patch_embed"]["kernel"].astype(dt) + base["patch_embed"]["bias"].astype(dt)
    B = x.shape[0]
    cls = jnp.broadcast_to(base["cls_token"].astype(dt), (B, 1, spec.hidden))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + base["pos_embed"].astype(dt)

    blocks = base["blocks"]
    lora_blocks = lora["lora"] if lora is not None else None

    def body(carry, ps):
        blk_p = ps[0]
        lora_p = ps[1] if lora_blocks is not None else None
        xx = carry
        y = _layer_norm(xx, blk_p["ln1"]["scale"], blk_p["ln1"]["bias"], spec.layernorm_eps)
        attn_out, probs = _attention_with_probs(y, blk_p["attn"], lora_p, spec)
        xx = xx + attn_out
        y = _layer_norm(xx, blk_p["ln2"]["scale"], blk_p["ln2"]["bias"], spec.layernorm_eps)
        y = y @ blk_p["mlp"]["fc1"]["kernel"].astype(xx.dtype) + blk_p["mlp"]["fc1"]["bias"].astype(xx.dtype)
        y = jax.nn.gelu(y.astype(jnp.float32), approximate=False).astype(xx.dtype)
        y = y @ blk_p["mlp"]["fc2"]["kernel"].astype(xx.dtype) + blk_p["mlp"]["fc2"]["bias"].astype(xx.dtype)
        return xx + y, probs

    xs = (blocks, lora_blocks) if lora_blocks is not None else (blocks,)
    tokens, all_probs = jax.lax.scan(body, x, xs)
    normed = _layer_norm(tokens, base["final_ln"]["scale"], base["final_ln"]["bias"], spec.layernorm_eps)
    head = lora["classifier"] if lora is not None else base["classifier"]
    logits = normed[:, 0] @ head["kernel"].astype(dt) + head["bias"].astype(dt)
    return logits.astype(jnp.float32), all_probs, tokens


def attention_rollout(
    base: PyTree, lora: Optional[PyTree], images, spec: ViTSpec,
    head_fuse: str = "mean",
) -> jax.Array:
    """Attention rollout -> patch saliency [B, grid, grid] in [0, 1]."""
    _, probs, _ = _forward_collect(base, lora, images, spec)  # [L,B,H,N,N]
    if head_fuse == "mean":
        A = probs.mean(axis=2)
    elif head_fuse == "max":
        A = probs.max(axis=2)
    else:
        raise ValueError(f"unknown head_fuse {head_fuse!r}")
    L, B, N, _ = A.shape
    eye = jnp.eye(N)[None]
    A = 0.5 * A + 0.5 * eye                    # residual mixing
    A = A / A.sum(axis=-1, keepdims=True)

    def body(carry, a):
        return a @ carry, None

    rollout, _ = jax.lax.scan(body, jnp.broadcast_to(eye, (B, N, N)), A)
    cls_to_patch = rollout[:, 0, 1:]            # [B, N-1]
    g = spec.image // spec.patch
    sal = cls_to_patch.reshape(B, g, g)
    sal = sal - sal.min(axis=(1, 2), keepdims=True)
    denom = sal.max(axis=(1, 2), keepdims=True)
    return sal / jnp.where(denom == 0, 1.0, denom)


def grad_cam(
    base: PyTree, lora: Optional[PyTree], images, spec: ViTSpec,
    class_idx: Optional[jax.Array] = None,
) -> jax.Array:
    """ViT Grad-CAM -> patch saliency [B, grid, grid]: ReLU(Σ_d ∂y_c/∂A_d ·
    A_d) over the final token activations."""

    def tokens_fn(imgs):
        _, _, t = _forward_collect(base, lora, imgs, spec)
        return t

    def score_from_tokens(t):
        normed = _layer_norm(t, base["final_ln"]["scale"], base["final_ln"]["bias"], spec.layernorm_eps)
        head = lora["classifier"] if lora is not None else base["classifier"]
        logits = (normed[:, 0] @ head["kernel"].astype(t.dtype) + head["bias"].astype(t.dtype)).astype(jnp.float32)
        idx = logits.argmax(axis=-1) if class_idx is None else class_idx
        return jnp.take_along_axis(logits, idx[:, None], axis=-1).sum()

    t = tokens_fn(images)
    g = jax.grad(score_from_tokens)(t)          # [B, N, D]
    weights = g.mean(axis=1, keepdims=True)     # channel importance
    cam = jax.nn.relu((weights * t).sum(axis=-1))[:, 1:]  # drop CLS
    gsz = spec.image // spec.patch
    cam = cam.reshape(cam.shape[0], gsz, gsz)
    cam = cam - cam.min(axis=(1, 2), keepdims=True)
    denom = cam.max(axis=(1, 2), keepdims=True)
    return cam / jnp.where(denom == 0, 1.0, denom)
