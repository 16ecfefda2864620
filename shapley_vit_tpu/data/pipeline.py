"""Device-side preprocessing pipeline.

Reference: torchvision transforms on the host per sample
(``Resize((256,256)) + ToTensor`` at start.py:35-38; per-dataset normalize
stacks in utils.py:250-486). TPU-first: decode happens once on the host
(data/oct.py), everything after — resize, normalize, dtype cast — is a fused
jit transform applied to whole batches on device, and the result stays
device-resident for every coalition and round.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from shapley_vit_tpu.data.arrays import ArrayDataset

# torchvision-style constants
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
# HF ViTImageProcessor defaults (vit-base-patch16-224-in21k)
VIT_MEAN = (0.5, 0.5, 0.5)
VIT_STD = (0.5, 0.5, 0.5)


@functools.partial(jax.jit, static_argnames=("size", "method"))
def resize_batch(images: jax.Array, size: int, method: str = "bilinear") -> jax.Array:
    """[B, H, W, C] -> [B, size, size, C] (torchvision Resize semantics)."""
    B, _, _, C = images.shape
    return jax.image.resize(images, (B, size, size, C), method)


@jax.jit
def normalize_batch(images: jax.Array, mean: jax.Array, std: jax.Array) -> jax.Array:
    """Per-channel (x - mean) / std (torchvision Normalize)."""
    return (images - mean.reshape(1, 1, 1, -1)) / std.reshape(1, 1, 1, -1)


def preprocess(
    images,
    size: Optional[int] = None,
    mean: Optional[Sequence[float]] = None,
    std: Optional[Sequence[float]] = None,
    dtype=jnp.float32,
) -> jax.Array:
    """Fused resize→normalize→cast; one device program, one output buffer."""
    x = jnp.asarray(images, jnp.float32)
    if size is not None and x.shape[1] != size:
        x = resize_batch(x, size)
    if mean is not None:
        x = normalize_batch(
            x, jnp.asarray(mean, jnp.float32), jnp.asarray(std or (1.0,) * len(mean), jnp.float32)
        )
    return x.astype(dtype)


def make_eval_batches(
    ds: ArrayDataset,
    batch_size: int,
    size: Optional[int] = None,
    mean: Optional[Sequence[float]] = None,
    std: Optional[Sequence[float]] = None,
) -> List[Tuple[jax.Array, jax.Array]]:
    """Preprocess once, upload once, slice into device-resident batches —
    the eval-loop input contract (reference DataLoader at start.py:84
    re-reads and re-uploads per epoch per coalition)."""
    images = preprocess(ds.images, size=size, mean=mean, std=std)
    labels = jax.device_put(np.asarray(ds.labels))
    images = jax.device_put(images)
    return [
        (images[i : i + batch_size], labels[i : i + batch_size])
        for i in range(0, len(ds), batch_size)
    ]
