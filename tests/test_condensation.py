"""Data-condensation suite tests: match_loss semantics, DiffAugment family
(shapes, Siamese sync, differentiability), CPU augment, train loops."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from shapley_vit_tpu.data import condensation as dc
from shapley_vit_tpu.data.arrays import ArrayDataset


@pytest.fixture
def imgs(rng):
    return jnp.asarray(rng.random((4, 16, 16, 3)), jnp.float32)


def test_match_loss_mse_and_cos(rng):
    g1 = {"w": jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)}
    g2 = jax.tree.map(lambda x: x * 2, g1)
    assert float(dc.match_loss(g1, g1, "mse")) == 0.0
    assert float(dc.match_loss(g1, g2, "mse")) > 0
    # cos: scaling leaves direction unchanged
    np.testing.assert_allclose(float(dc.match_loss(g2, g1, "cos")), 0.0, atol=1e-6)
    with pytest.raises(ValueError):
        dc.match_loss(g1, g1, "l7")


def test_match_loss_ours_grouped_cosine(rng):
    conv = jnp.asarray(rng.normal(size=(3, 3, 2, 8)), jnp.float32)  # [h,w,in,out]
    bias = jnp.asarray(rng.normal(size=(8,)), jnp.float32)
    g = {"conv": conv, "bias": bias}
    # identical grads -> zero distance; bias (1-D) contributes 0 by contract
    np.testing.assert_allclose(float(dc.match_loss(g, g, "ours")), 0.0, atol=1e-5)
    g2 = {"conv": -conv, "bias": bias}
    # opposite direction per output channel -> distance = 2 per channel * 8
    np.testing.assert_allclose(float(dc.match_loss(g2, g, "ours")), 16.0, atol=1e-4)


@pytest.mark.parametrize("fn", [dc.rand_flip, dc.rand_brightness, dc.rand_saturation,
                                dc.rand_contrast, dc.rand_crop, dc.rand_cutout,
                                dc.rand_scale, dc.rand_rotate])
def test_diffaug_fns_preserve_shape(fn, imgs):
    out = fn(imgs, jax.random.key(0), dc.ParamDiffAug())
    assert out.shape == imgs.shape
    assert np.isfinite(np.asarray(out)).all()


def test_diffaug_siamese_synchronizes_batch(imgs):
    # with siamese=True every sample gets the SAME random transform:
    # applying to a batch of identical images must give identical outputs
    x = jnp.broadcast_to(imgs[:1], imgs.shape)
    for fn in (dc.rand_flip, dc.rand_crop, dc.rand_scale, dc.rand_rotate, dc.rand_cutout):
        out = np.asarray(fn(x, jax.random.key(1), dc.ParamDiffAug(), siamese=True))
        for b in range(1, out.shape[0]):
            np.testing.assert_allclose(out[b], out[0], atol=1e-6, err_msg=str(fn))


def test_diffaug_is_differentiable(imgs):
    def f(x):
        p = dc.ParamDiffAug()
        y = dc.rand_scale(x, jax.random.key(0), p)
        y = dc.rand_brightness(y, jax.random.key(1), p)
        return jnp.sum(y**2)

    g = jax.grad(f)(imgs)
    assert g.shape == imgs.shape
    assert float(jnp.abs(g).sum()) > 0  # gradients flow through the sampler


def test_diff_augment_entry_modes(imgs):
    out = dc.diff_augment(imgs, "color_crop_cutout", jax.random.key(0), dc.ParamDiffAug())
    assert out.shape == imgs.shape
    p = dc.ParamDiffAug(aug_mode="M")
    out = dc.diff_augment(imgs, "flip_color", jax.random.key(0), p)
    assert out.shape == imgs.shape
    assert dc.diff_augment(imgs, "none") is imgs


def test_cpu_augment(rng):
    images = rng.random((6, 16, 16, 1)).astype(np.float32)
    param = {"crop": 2, "scale": 0.2, "rotate": 10, "noise": 0.01,
             "strategy": "crop_scale_rotate_noise"}
    out = dc.augment(images, param, rng=np.random.default_rng(0))
    assert out.shape == images.shape
    assert not np.allclose(out, images)
    # none strategy is a no-op passthrough
    assert dc.augment(images, {"strategy": "none"}) is images


def test_get_daparam_and_eval_pool():
    p = dc.get_daparam("MNIST", "ConvNet", "ConvNet", 10)
    assert p["strategy"] == "crop_scale_rotate"
    assert dc.get_daparam("CIFAR10", "ConvNet", "ConvNetBN", 10)["strategy"] == "crop_noise"
    assert "ResNet18" in dc.get_eval_pool("M", "ConvNet", "ConvNet")
    assert dc.get_eval_pool("S", "ConvNetBN", "x") == ["ConvNet"]
    assert dc.get_eval_pool("SS", "ConvNetBN", "x") == ["ConvNetBN"]
    assert dc.get_eval_pool("other", "m", "EvalNet") == ["EvalNet"]


def test_run_epoch_trains(rng):
    from shapley_vit_tpu.models import zoo

    module, variables, apply_fn = zoo.get_network("MLP", 1, 3, (8, 8), jax.random.key(0))
    X = rng.random((64, 8, 8, 1)).astype(np.float32)
    y = (X.mean(axis=(1, 2, 3)) > 0.5).astype(np.int32) + 1  # classes 1/2
    ds = ArrayDataset(images=X, labels=y)
    opt = optax.adam(1e-2)
    opt_state = opt.init(variables["params"])
    losses = []
    for _ in range(5):
        loss, acc, variables, opt_state = dc.run_epoch(
            "train", ds, apply_fn, variables, opt, opt_state, batch_size=16
        )
        losses.append(loss)
    assert losses[-1] < losses[0]
    ev_loss, ev_acc, _, _ = dc.run_epoch("eval", ds, apply_fn, variables)
    assert ev_acc > 0.5


def test_run_epoch_data_weight(rng):
    from shapley_vit_tpu.models import zoo

    module, variables, apply_fn = zoo.get_network("MLP", 1, 2, (4, 4), jax.random.key(0))
    X = rng.random((32, 4, 4, 1)).astype(np.float32)
    y = rng.integers(0, 2, 32).astype(np.int32)
    src = rng.integers(0, 3, 32).astype(np.int32)
    ds = dc.SynDataset(images=X, labels=y, src=src)
    weights = np.ones((2, 3), np.float32)  # [num_classes, num_clients]
    opt = optax.sgd(1e-2)
    opt_state = opt.init(variables["params"])
    loss, acc, variables, opt_state = dc.run_epoch_data_weight(
        ds, apply_fn, variables, opt, opt_state, data_weights=weights, batch_size=8
    )
    assert np.isfinite(loss) and 0 <= acc <= 1
