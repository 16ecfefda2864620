"""Numerical parity of the flax Inception-v3 (and its weight converter)
against an INDEPENDENT torch-functional oracle.

The oracle consumes a reference-named state dict (``conv2d_1a`` /
``Mixed_5b.branch0.0`` / ``classif``, models/inception.py:329-430) directly
with ``torch.nn.functional`` ops, following the reference architecture.
The flax side loads the same state dict through
``torch_inception3_to_flax``. Agreement of the logits validates both the
architecture transcription and the converter's key mapping — including
same-shape key swaps (e.g. the two c7->c7 convs inside InceptionC.branch2)
that structural/shape tests cannot catch.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from shapley_vit_tpu.models import convert as cv  # noqa: E402
from shapley_vit_tpu.models import inception as inc  # noqa: E402
from tests.test_inception import _reference_style_state_dict  # noqa: E402


def _bc(x, sd, prefix, stride=1, padding=0):
    """BasicConv2d: bias-free conv + BatchNorm(eps=1e-3) + ReLU
    (reference inception.py:187-196)."""
    w = torch.from_numpy(sd[f"{prefix}.conv.weight"])
    x = F.conv2d(x, w, stride=stride, padding=padding)
    x = F.batch_norm(
        x,
        torch.from_numpy(sd[f"{prefix}.bn.running_mean"]),
        torch.from_numpy(sd[f"{prefix}.bn.running_var"]),
        torch.from_numpy(sd[f"{prefix}.bn.weight"]),
        torch.from_numpy(sd[f"{prefix}.bn.bias"]),
        training=False,
        eps=0.001,
    )
    return F.relu(x)


def _avg31(x):
    return F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)


def _inception_a(x, sd, p):
    b0 = _bc(x, sd, f"{p}.branch0.0")
    b1 = _bc(_bc(x, sd, f"{p}.branch1.0"), sd, f"{p}.branch1.1", padding=2)
    b2 = _bc(_bc(_bc(x, sd, f"{p}.branch2.0"), sd, f"{p}.branch2.1", padding=1),
             sd, f"{p}.branch2.2", padding=1)
    b3 = _bc(_avg31(x), sd, f"{p}.branch3.1")
    return torch.cat([b0, b1, b2, b3], 1)


def _inception_b(x, sd, p):
    b0 = _bc(x, sd, f"{p}.branch0.0", stride=2)
    b1 = _bc(_bc(_bc(x, sd, f"{p}.branch1.0"), sd, f"{p}.branch1.1", padding=1),
             sd, f"{p}.branch1.2", stride=2)
    return torch.cat([b0, b1, F.max_pool2d(x, 3, stride=2)], 1)


def _inception_c(x, sd, p):
    b0 = _bc(x, sd, f"{p}.branch0.0")
    b1 = _bc(x, sd, f"{p}.branch1.0")
    b1 = _bc(b1, sd, f"{p}.branch1.1", padding=(0, 3))
    b1 = _bc(b1, sd, f"{p}.branch1.2", padding=(3, 0))
    b2 = _bc(x, sd, f"{p}.branch2.0")
    b2 = _bc(b2, sd, f"{p}.branch2.1", padding=(3, 0))
    b2 = _bc(b2, sd, f"{p}.branch2.2", padding=(0, 3))
    b2 = _bc(b2, sd, f"{p}.branch2.3", padding=(3, 0))
    b2 = _bc(b2, sd, f"{p}.branch2.4", padding=(0, 3))
    b3 = _bc(_avg31(x), sd, f"{p}.branch3.1")
    return torch.cat([b0, b1, b2, b3], 1)


def _inception_d(x, sd, p):
    b0 = _bc(_bc(x, sd, f"{p}.branch0.0"), sd, f"{p}.branch0.1", stride=2)
    b1 = _bc(x, sd, f"{p}.branch1.0")
    b1 = _bc(b1, sd, f"{p}.branch1.1", padding=(0, 3))
    b1 = _bc(b1, sd, f"{p}.branch1.2", padding=(3, 0))
    b1 = _bc(b1, sd, f"{p}.branch1.3", stride=2)
    return torch.cat([b0, b1, F.max_pool2d(x, 3, stride=2)], 1)


def _inception_e(x, sd, p):
    b0 = _bc(x, sd, f"{p}.branch0.0")
    b1 = _bc(x, sd, f"{p}.branch1_0")
    b1 = torch.cat([
        _bc(b1, sd, f"{p}.branch1_1", padding=(0, 1)),
        _bc(b1, sd, f"{p}.branch1_2", padding=(1, 0)),
    ], 1)
    b2 = _bc(_bc(x, sd, f"{p}.branch2_0"), sd, f"{p}.branch2_1", padding=1)
    b2 = torch.cat([
        _bc(b2, sd, f"{p}.branch2_2", padding=(0, 1)),
        _bc(b2, sd, f"{p}.branch2_3", padding=(1, 0)),
    ], 1)
    b3 = _bc(_avg31(x), sd, f"{p}.branch3.1")
    return torch.cat([b0, b1, b2, b3], 1)


def _torch_oracle_logits(x_nhwc, sd):
    """Full reference forward (inception.py:369-429, eval mode, no dropout)."""
    with torch.no_grad():
        x = torch.from_numpy(x_nhwc.transpose(0, 3, 1, 2))
        x = _bc(x, sd, "conv2d_1a", stride=2)
        x = _bc(x, sd, "conv2d_2a")
        x = _bc(x, sd, "conv2d_2b", padding=1)
        x = F.max_pool2d(x, 3, stride=2)
        x = _bc(x, sd, "conv2d_3b")
        x = _bc(x, sd, "conv2d_4a")
        x = F.max_pool2d(x, 3, stride=2)
        x = _inception_a(x, sd, "Mixed_5b")
        x = _inception_a(x, sd, "Mixed_5c")
        x = _inception_a(x, sd, "Mixed_5d")
        x = _inception_b(x, sd, "Mixed_6a")
        for blk in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
            x = _inception_c(x, sd, blk)
        x = _inception_d(x, sd, "Mixed_7a")
        x = _inception_e(x, sd, "Mixed_7b")
        x = _inception_e(x, sd, "Mixed_7c")
        x = F.avg_pool2d(x, 5)  # reference kernel_size=5 (inception.py:419)
        x = x.flatten(1)
        w = torch.from_numpy(sd["classif.weight"])
        b = torch.from_numpy(sd["classif.bias"])
        return (x @ w.T + b).numpy()


def test_inception_logits_match_torch_oracle():
    model = inc.Inception3(num_classes=7)
    rng = np.random.default_rng(11)
    x = rng.normal(size=(1, 299, 299, 3)).astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.asarray(x), train=False)
    sd = _reference_style_state_dict(variables, rng)
    # tame random-weight activation blowup through 17 conv stages: small
    # conv magnitudes, BN stats near identity
    for k in list(sd):
        if k.endswith("conv.weight"):
            sd[k] = (sd[k] * 0.05).astype(np.float32)
        elif k.endswith("bn.running_mean"):
            sd[k] = (sd[k] * 0.01).astype(np.float32)
        elif k.endswith("bn.weight"):
            sd[k] = np.abs(sd[k]).astype(np.float32) * 0.2 + 0.9
        elif k.endswith("bn.bias"):
            sd[k] = (sd[k] * 0.05).astype(np.float32)

    loaded = cv.torch_inception3_to_flax(sd, variables)
    got = np.asarray(model.apply(loaded, jnp.asarray(x), train=False))
    want = _torch_oracle_logits(x, sd)
    assert got.shape == want.shape == (1, 7)
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=5e-3)
