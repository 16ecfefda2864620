"""Preprocessing pipeline tests (parity with torchvision semantics)."""

import jax.numpy as jnp
import numpy as np
import pytest

from shapley_vit_tpu.data.arrays import ArrayDataset
from shapley_vit_tpu.data import pipeline as pp


def test_resize_matches_pil_bilinear_roughly(rng):
    imgs = rng.random((2, 8, 8, 3)).astype(np.float32)
    out = np.asarray(pp.resize_batch(jnp.asarray(imgs), 16))
    assert out.shape == (2, 16, 16, 3)
    # upsampling preserves the value range and mean approximately
    assert abs(out.mean() - imgs.mean()) < 0.05


def test_normalize_matches_torchvision(rng):
    imgs = rng.random((3, 4, 4, 3)).astype(np.float32)
    out = np.asarray(
        pp.normalize_batch(
            jnp.asarray(imgs),
            jnp.asarray(pp.VIT_MEAN), jnp.asarray(pp.VIT_STD),
        )
    )
    np.testing.assert_allclose(out, (imgs - 0.5) / 0.5, atol=1e-6)
    # [0,1] -> [-1,1]
    assert out.min() >= -1 - 1e-6 and out.max() <= 1 + 1e-6


def test_preprocess_fused(rng):
    imgs = rng.random((2, 10, 10, 3)).astype(np.float32)
    out = pp.preprocess(imgs, size=16, mean=pp.VIT_MEAN, std=pp.VIT_STD,
                        dtype=jnp.bfloat16)
    assert out.shape == (2, 16, 16, 3) and out.dtype == jnp.bfloat16
    # no-resize passthrough keeps values
    same = pp.preprocess(imgs)
    np.testing.assert_allclose(np.asarray(same), imgs, atol=1e-6)


def test_make_eval_batches_device_resident(rng):
    ds = ArrayDataset(
        images=rng.random((10, 8, 8, 3)).astype(np.float32),
        labels=rng.integers(0, 4, 10).astype(np.int32),
    )
    batches = pp.make_eval_batches(ds, batch_size=4, size=16)
    assert len(batches) == 3
    assert batches[0][0].shape == (4, 16, 16, 3)
    assert sum(len(b[1]) for b in batches) == 10
