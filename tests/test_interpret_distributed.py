"""Tests: attention rollout / Grad-CAM saliency and multi-host plumbing."""

import jax
import numpy as np
import pytest

from shapley_vit_tpu.config import DistConfig
from shapley_vit_tpu.models import vit as jvit
from shapley_vit_tpu.models import interpret
from shapley_vit_tpu.parallel import distributed


@pytest.fixture(scope="module")
def micro():
    spec = jvit.make_spec("micro", num_classes=4)
    base = jvit.init_vit(jax.random.key(0), spec)
    lora = jvit.init_lora(jax.random.key(1), spec, classifier_from=base)
    return spec, base, lora


def test_attention_rollout_saliency(micro, rng):
    spec, base, lora = micro
    images = rng.normal(size=(2, 16, 16, 3)).astype(np.float32)
    sal = np.asarray(interpret.attention_rollout(base, lora, images, spec))
    g = spec.image // spec.patch
    assert sal.shape == (2, g, g)
    assert sal.min() >= 0 and sal.max() <= 1 + 1e-6
    assert np.isfinite(sal).all()
    sal_max = np.asarray(interpret.attention_rollout(base, None, images, spec, head_fuse="max"))
    assert sal_max.shape == (2, g, g)
    with pytest.raises(ValueError):
        interpret.attention_rollout(base, None, images, spec, head_fuse="median")


def test_forward_collect_matches_vit_forward(micro, rng):
    spec, base, lora = micro
    images = rng.normal(size=(2, 16, 16, 3)).astype(np.float32)
    logits, probs, tokens = interpret._forward_collect(base, lora, images, spec)
    ref = np.asarray(jvit.vit_forward(base, lora, images, spec))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=1e-5)
    L, B, H, N, _ = probs.shape
    assert (L, B, H, N) == (spec.depth, 2, spec.heads, spec.seq_len)
    # each attention row is a distribution
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, atol=1e-5)


def test_grad_cam_saliency(micro, rng):
    spec, base, lora = micro
    images = rng.normal(size=(2, 16, 16, 3)).astype(np.float32)
    cam = np.asarray(interpret.grad_cam(base, lora, images, spec))
    g = spec.image // spec.patch
    assert cam.shape == (2, g, g)
    assert cam.min() >= 0 and np.isfinite(cam).all()
    # explicit target class
    cam2 = np.asarray(
        interpret.grad_cam(base, lora, images, spec, class_idx=np.array([1, 2]))
    )
    assert cam2.shape == (2, g, g)


def test_distributed_single_host_noop():
    dist = DistConfig(dist_num=1)
    assert distributed.initialize_from_config(dist) is False
    mesh = distributed.make_global_mesh(dist, n_coalition=2)
    assert mesh.axis_names == ("coalition", "data")
    info = distributed.process_info()
    assert info["process_count"] == 1 and info["global_devices"] == 8
