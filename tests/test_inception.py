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


@pytest.mark.slow
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


def _reference_style_state_dict(variables, rng):
    """Synthesize a torch-format Inception3 state dict in the REFERENCE's
    naming (conv2d_1a / Mixed_5b.branch0.0 / classif) with random values,
    shapes derived from the flax init via the inverse layout transforms."""
    from shapley_vit_tpu.models import convert as cv

    p = variables["params"]
    s = variables["batch_stats"]
    if "net" in p:
        p, s = p["net"], s["net"]
    sd = {}

    def emit(src_p, src_s, flax_name, torch_prefix):
        kern = np.asarray(src_p[flax_name]["Conv_0"]["kernel"])  # [kh,kw,I,O]
        sd[f"{torch_prefix}.conv.weight"] = rng.normal(
            size=(kern.shape[3], kern.shape[2], kern.shape[0], kern.shape[1])
        ).astype(np.float32)
        C = kern.shape[3]
        sd[f"{torch_prefix}.bn.weight"] = rng.normal(size=C).astype(np.float32)
        sd[f"{torch_prefix}.bn.bias"] = rng.normal(size=C).astype(np.float32)
        sd[f"{torch_prefix}.bn.running_mean"] = rng.normal(size=C).astype(np.float32)
        sd[f"{torch_prefix}.bn.running_var"] = np.abs(
            rng.normal(size=C)
        ).astype(np.float32) + 0.5

    for i, name in enumerate(cv._INCEPTION_STEM):
        emit(p, s, f"BasicConv2d_{i}", name)
    for flax_block, torch_block in cv._INCEPTION_BLOCKS:
        kind = flax_block.rsplit("_", 1)[0]
        for i, sub in enumerate(cv._BLOCK_CONV_ORDER[kind]):
            emit(p[flax_block], s[flax_block], f"BasicConv2d_{i}", f"{torch_block}.{sub}")
    k = np.asarray(p["Dense_0"]["kernel"])  # [I,O]
    sd["classif.weight"] = rng.normal(size=(k.shape[1], k.shape[0])).astype(np.float32)
    sd["classif.bias"] = rng.normal(size=k.shape[1]).astype(np.float32)
    return sd


def test_torch_inception3_to_flax_full_coverage():
    """Every reference-named tensor lands in the right flax slot with the
    right layout; unconsumed keys raise (VERDICT missing #2: the pretrained
    inceptionv3_state.pth load path, reference inception.py:495-509)."""
    from shapley_vit_tpu.models import convert as cv

    x = jnp.zeros((1, 299, 299, 3))
    model = inc.Inception3(num_classes=7)
    variables = model.init(jax.random.key(0), x, train=False)
    rng = np.random.default_rng(3)
    sd = _reference_style_state_dict(variables, rng)

    loaded = cv.torch_inception3_to_flax(sd, variables)

    # spot-check layout on the stem conv + classifier
    np.testing.assert_array_equal(
        loaded["params"]["BasicConv2d_0"]["Conv_0"]["kernel"],
        sd["conv2d_1a.conv.weight"].transpose(2, 3, 1, 0),
    )
    np.testing.assert_array_equal(
        loaded["params"]["Dense_0"]["kernel"], sd["classif.weight"].T
    )
    np.testing.assert_array_equal(
        loaded["batch_stats"]["InceptionE_1"]["BasicConv2d_8"]["BatchNorm_0"]["var"],
        sd["Mixed_7c.branch3.1.bn.running_var"],
    )
    # every flax BasicConv2d received checkpoint values (full coverage):
    # no conv kernel should equal its random init anymore
    before = jax.tree.leaves(variables["params"])
    after = jax.tree.leaves(loaded["params"])
    changed = sum(
        1 for b, a in zip(before, after)
        if np.asarray(b).shape == np.asarray(a).shape and not np.allclose(b, a)
    )
    assert changed >= 94 * 2 + 2, f"only {changed} leaves overlaid"

    # the loaded net must still run
    out = model.apply(loaded, x, train=False)
    assert out.shape == (1, 7)

    # unconsumed keys raise instead of silently ignoring
    sd_bad = dict(sd)
    sd_bad["Mixed_9z.bogus.conv.weight"] = np.zeros((1, 1, 1, 1), np.float32)
    with pytest.raises(ValueError, match="unconsumed"):
        cv.torch_inception3_to_flax(sd_bad, variables)


def test_get_net_pretrained_path(tmp_path):
    """get_net(pretrained_path=...) loads the reference checkpoint format
    into the paired Net's inception subtree; denoise keys keep init."""
    net = inc.Net(input_size=(75, 75), fwd_out=(8, 16), num_fwd=(1, 1),
                  back_out=(8,), num_back=(1,), n=1, num_classes=1001)
    x = jnp.zeros((1, 75, 75, 3))
    variables = net.init(jax.random.key(1), x, x, requires_control=False, train=False)
    rng = np.random.default_rng(5)
    sd = _reference_style_state_dict(variables, rng)
    path = str(tmp_path / "inceptionv3_state.npz")
    np.savez(path, **sd)

    net2, loaded = inc.get_net(
        (75, 75), fwd_out=(8, 16), num_fwd=(1, 1), back_out=(8,), num_back=(1,),
        pretrained_path=path, rng=jax.random.key(1)
    )
    np.testing.assert_array_equal(
        loaded["params"]["net"]["BasicConv2d_0"]["Conv_0"]["kernel"],
        sd["conv2d_1a.conv.weight"].transpose(2, 3, 1, 0),
    )
    out = net2.apply(loaded, x, x, requires_control=False, train=False)
    assert out[0].shape[-1] == 1001


def test_get_net_pretrained_torch_pth(tmp_path):
    """The reference's actual format: ``inceptionv3_state.pth`` written by
    torch.save — must load through the torch-free restricted reader
    (fl/torch_ckpt.py), with no torch import in the loader itself."""
    torch = pytest.importorskip("torch")
    net = inc.Net(input_size=(75, 75), fwd_out=(8, 16), num_fwd=(1, 1),
                  back_out=(8,), num_back=(1,), n=1, num_classes=1001)
    x = jnp.zeros((1, 75, 75, 3))
    variables = net.init(jax.random.key(1), x, x, requires_control=False, train=False)
    rng = np.random.default_rng(7)
    sd = _reference_style_state_dict(variables, rng)
    path = str(tmp_path / "inceptionv3_state.pth")
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, path)

    net2, loaded = inc.get_net(
        (75, 75), fwd_out=(8, 16), num_fwd=(1, 1), back_out=(8,), num_back=(1,),
        pretrained_path=path, rng=jax.random.key(1)
    )
    np.testing.assert_array_equal(
        loaded["params"]["net"]["BasicConv2d_0"]["Conv_0"]["kernel"],
        sd["conv2d_1a.conv.weight"].transpose(2, 3, 1, 0),
    )


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
