"""int8 quantized eval path: numerical contract of the dynamic W8A8 matmul
and the quantized ViT forward (ops/quant.py, ViTSpec.quant='int8')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shapley_vit_tpu.models import vit as jvit
from shapley_vit_tpu.ops.quant import dynamic_int8_dense, quantize_symmetric


def test_quantize_symmetric_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(8, 64)).astype(np.float32)
    q, s = quantize_symmetric(jnp.asarray(x), axis=-1)
    assert q.dtype == jnp.int8 and s.shape == (8, 1)
    back = np.asarray(q, np.float32) * np.asarray(s)
    # max quantization error is half a step = scale/2 per element
    assert np.max(np.abs(back - x)) <= np.max(np.asarray(s)) * 0.5 + 1e-7


def test_dynamic_int8_dense_close_to_f32():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(4, 197, 96)).astype(np.float32)
    w = rng.normal(size=(96, 128)).astype(np.float32) * 0.05
    b = rng.normal(size=128).astype(np.float32)
    exact = x @ w + b
    q = np.asarray(dynamic_int8_dense(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    # W8A8 with per-token/per-channel scales: ~1% relative error on gaussians
    rel = np.abs(q - exact) / (np.abs(exact).mean() + 1e-6)
    assert rel.mean() < 0.02, rel.mean()
    assert np.corrcoef(q.ravel(), exact.ravel())[0, 1] > 0.999


def test_dense_zero_rows_no_nan():
    x = jnp.zeros((3, 16))
    w = jnp.ones((16, 8))
    out = np.asarray(dynamic_int8_dense(x, w))
    assert np.isfinite(out).all() and np.allclose(out, 0.0)


@pytest.fixture(scope="module")
def micro_setup():
    spec = jvit.make_spec("micro", num_classes=4)
    base = jvit.init_vit(jax.random.key(0), spec)
    lora = jvit.init_lora(jax.random.key(1), spec, classifier_from=base)
    # non-trivial overlay so the merged path is exercised
    lora = jax.tree.map(
        lambda l: l + 0.05 * jax.random.normal(jax.random.key(2), l.shape), lora
    )
    rng = np.random.default_rng(3)
    images = rng.normal(size=(16, spec.image, spec.image, 3)).astype(np.float32)
    return spec, base, lora, images


def test_quantized_forward_tracks_f32(micro_setup):
    spec, base, lora, images = micro_setup
    exact = np.asarray(jvit.vit_forward(base, lora, images, spec))
    quant = np.asarray(
        jvit.vit_forward(base, lora, images, spec.replace(quant="int8"))
    )
    assert quant.shape == exact.shape
    # logits drift bounded relative to the logit spread
    spread = exact.max() - exact.min() + 1e-6
    assert np.max(np.abs(quant - exact)) / spread < 0.15
    assert np.corrcoef(quant.ravel(), exact.ravel())[0, 1] > 0.99


def test_quantized_merged_coalition_forward(micro_setup):
    spec, base, lora, images = micro_setup
    qspec = spec.replace(quant="int8")
    stacked = jax.tree.map(lambda l: jnp.stack([l, l * 0.5]), lora)
    merged = jvit.merge_coalition_weights(base, stacked, qspec)
    out = jax.vmap(
        lambda m: jvit.vit_forward_merged(base, m, images, qspec)
    )(merged)
    exact = jax.vmap(
        lambda m: jvit.vit_forward_merged(base, m, images, spec)
    )(jvit.merge_coalition_weights(base, stacked, spec))
    out, exact = np.asarray(out), np.asarray(exact)
    assert out.shape == (2, 16, 4)
    assert np.corrcoef(out.ravel(), exact.ravel())[0, 1] > 0.99
