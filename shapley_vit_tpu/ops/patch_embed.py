"""Patch embedding — Pallas TPU kernel.

ViT patch embedding with stride == kernel == patch size is exactly a blocked
matmul (models/vit._patchify + matmul). This kernel fuses the patch
extraction (a pure relayout) with the projection so the [B·N, p²·C] patch
matrix never materializes in HBM: each program gathers one image-row-of-
patches from VMEM, reshapes in-register, and runs the projection on the MXU.

Mostly a demonstration kernel — XLA already fuses this well — but it keeps
the patchify layout contract in one tested place and removes one HBM
round-trip at large batch.

MEASURED ON TPU (round 3, tools/pallas_ledger.py): does NOT compile at
production shapes — the Mosaic toolchain crashes lowering the in-kernel
patchify relayout (reshape + 5-D transpose) at 224px, and the earlier
row-of-patches blocking is rejected by the block-shape rule
(second-to-last dim 14 % 8 != 0). Interpreter-verified only; the XLA
``_patchify`` + matmul path is the product. Off by default
(``ViTSpec.patch_impl``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _patch_embed_kernel(img_ref, w_ref, b_ref, o_ref, *, patch: int, gh: int,
                        gw: int, C: int):
    # img_ref: [1, H, W, C] — one whole image per program. Full-image
    # blocks keep the trailing block dims equal to the array dims, which
    # the Mosaic lowering requires (a row-of-patches block has a
    # grid-width second-to-last dim, e.g. 14 for ViT-B/224 — not divisible
    # by 8, rejected by the TPU lowering).
    img = img_ref[0]                                    # [H, W, C]
    # [gh, p, gw, p, C] -> [gh, gw, p, p, C] -> [N, p*p*C]  (HF ordering)
    x = img.reshape(gh, patch, gw, patch, C).transpose(0, 2, 1, 3, 4).reshape(
        gh * gw, patch * patch * C
    )
    o_ref[0] = (
        jax.lax.dot_general(
            x.astype(w_ref.dtype), w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b_ref[:].astype(jnp.float32)
    ).astype(o_ref.dtype)


def patch_embed(
    images: jax.Array, kernel: jax.Array, bias: jax.Array, patch: int,
    interpret: bool = False,
) -> jax.Array:
    """[B, H, W, C] -> [B, N, D] patch tokens (HF-ordering parity with
    models/vit._patchify: patches flattened as (ph, pw, C), row-major grid)."""
    B, H, W, C = images.shape
    gh, gw = H // patch, W // patch
    D = kernel.shape[1]
    grid = (B,)

    out = pl.pallas_call(
        functools.partial(_patch_embed_kernel, patch=patch, gh=gh, gw=gw, C=C),
        out_shape=jax.ShapeDtypeStruct((B, gh * gw, D), images.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((patch * patch * C, D), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda b: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, gh * gw, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(images, kernel, bias)
    return out
