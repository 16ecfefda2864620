"""Inception-v3 + denoiser tests: stage shapes vs the reference's inline
shape comments, denoiser residual structure, paired net outputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shapley_vit_tpu.models import inception as inc


@pytest.fixture(scope="module")
def small_input():
    # full 299x299 is slow on CPU; 299 is the documented size, use it once
    return jnp.zeros((1, 299, 299, 3))


def test_inception3_output_shape(small_input):
    model = inc.Inception3(num_classes=1001)
    variables = model.init(jax.random.key(0), small_input, train=False)
    out = model.apply(variables, small_input, train=False)
    # 299x299 -> 8x8x2048 -> avgpool5 -> 1x1 -> 1001 logits (inception.py:373-427)
    assert out.shape == (1, 1001)


def test_inception_network_wrapper_4_classes(small_input):
    model = inc.inception_network()
    variables = model.init(jax.random.key(0), small_input)
    out = model.apply(variables, small_input)
    assert out.shape == (1, 4)  # xray_inception_network.py:23 always 4


def test_knee_pooling_branch(small_input):
    model = inc.Inception3(num_classes=1001, knee_pooling=True)
    variables = model.init(jax.random.key(0), small_input, train=False)
    out = model.apply(variables, small_input, train=False)
    assert out.shape == (1, 2)  # max over batch + 2-class head (inception.py:414-418)


def test_denoise_residual_identity_shape():
    x = jax.random.normal(jax.random.key(0), (1, 64, 64, 3))
    den = inc.Denoise(h_in=64, w_in=64, block=inc.DenoiseConv,
                      fwd_out=(8, 16, 16), num_fwd=(1, 1, 1),
                      back_out=(8, 16), num_back=(1, 1))
    variables = den.init(jax.random.key(1), x, False)
    out = den.apply(variables, x, False)
    assert out.shape == x.shape  # residual add keeps shape (inception.py:313-327)


def test_denoise_bottleneck_block():
    x = jax.random.normal(jax.random.key(0), (1, 16, 16, 8))
    blk = inc.DenoiseBottleneck(n_out=8, stride=2)
    variables = blk.init(jax.random.key(1), x, False)
    out = blk.apply(variables, x, False)
    assert out.shape == (1, 8, 8, 32)  # expansion 4, stride 2


def test_denoise_loss_semantics():
    x = jnp.array([1.0, 2.0, 3.0])
    y = jnp.array([1.0, 1.0, 1.0])
    # n=2: mean((x-y)^2 / 2)
    np.testing.assert_allclose(
        float(inc.denoise_loss(x, y, n=2)), np.mean([0, 0.5, 2.0]), atol=1e-6
    )
    # norm: divide by mean(|y|^n)
    np.testing.assert_allclose(
        float(inc.denoise_loss(x, y, n=2, norm=True)),
        np.mean([0, 0.5, 2.0]) / 1.0, atol=1e-6,
    )
    # hard mining keeps the top-k largest losses
    hm = float(inc.denoise_loss(x, y, n=2, hard_mining=1 / 3))
    np.testing.assert_allclose(hm, 2.0, atol=1e-6)


def test_paired_net_small():
    net = inc.Net(input_size=(75, 75), fwd_out=(8, 16), num_fwd=(1, 1),
                  back_out=(8,), num_back=(1,), n=1, num_classes=5)
    x = jax.random.normal(jax.random.key(0), (1, 75, 75, 3))
    adv = x + 0.1
    variables = net.init(jax.random.key(1), x, adv, requires_control=True, train=False)
    orig, adv_out, loss, control, control_loss = net.apply(
        variables, x, adv, requires_control=True, train=False
    )
    assert orig.shape == (1, 5) and adv_out.shape == (1, 5) and control.shape == (1, 5)
    assert len(loss) == 1 and len(control_loss) == 1
    orig2, adv2, loss2 = net.apply(variables, x, adv, requires_control=False, train=False)
    np.testing.assert_allclose(np.asarray(orig), np.asarray(orig2), atol=1e-6)
