"""Model-zoo tests: every factory variant builds and runs; shapes match the
reference classifier dims; BatchNorm state aggregates through tree algebra."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shapley_vit_tpu.models import zoo
from shapley_vit_tpu.ops import tree_math as tm

SMALL_VARIANTS = [
    "MLP", "LeNet", "ConvNet", "ConvNetD2", "ConvNetW32", "ConvNetAS",
    "ConvNetAL", "ConvNetASwish", "ConvNetBN", "ConvNetLN", "ConvNetIN",
    "ConvNetGN", "ConvNetNN", "ConvNetNP", "ConvNetMP", "ConvNetAP",
]


@pytest.mark.parametrize("name", SMALL_VARIANTS)
def test_small_variants_forward(name):
    module, variables, apply_fn = zoo.get_network(name, 3, 10, (32, 32), jax.random.key(0))
    x = jnp.zeros((2, 32, 32, 3))
    out = apply_fn(variables, x)
    assert out.shape == (2, 10)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("name", ["AlexNet", "AlexNetBN", "VGG11", "VGG11BN",
                                  "ResNet18", "ResNet18BN", "ResNet18_AP", "ResNet18BN_AP"])
def test_medium_variants_forward(name):
    module, variables, apply_fn = zoo.get_network(name, 3, 10, (32, 32), jax.random.key(0))
    out = apply_fn(variables, jnp.zeros((1, 32, 32, 3)))
    assert out.shape == (1, 10)


@pytest.mark.slow
def test_resnet50_builds():
    module, variables, apply_fn = zoo.get_network("ResNet50", 3, 10, (32, 32), jax.random.key(0))
    out = apply_fn(variables, jnp.zeros((1, 32, 32, 3)))
    assert out.shape == (1, 10)


@pytest.mark.slow
def test_grayscale_channel_quirks():
    # channel==1 first-layer padding quirks + 28->32 ConvNet pad
    for name in ("ConvNet", "LeNet", "AlexNet", "VGG11"):
        size = (28, 28) if name == "ConvNet" else (32, 32)
        module, variables, apply_fn = zoo.get_network(name, 1, 10, size, jax.random.key(0))
        out = apply_fn(variables, jnp.zeros((1, size[0], size[1], 1)))
        assert out.shape == (1, 10), name


def test_tabular_models():
    for name in ("MLP_tabular", "MLP_linear"):
        module, variables, apply_fn = zoo.get_network(name, 1, 2, 14, jax.random.key(0))
        out = apply_fn(variables, jnp.zeros((5, 14)))
        assert out.shape == (5, 2)


def test_unknown_model_raises():
    with pytest.raises(ValueError):
        zoo.build_network("TransformerXL", 3, 10)


def test_model_head_wrapper():
    # ModelHead capability (networks.py:9-19)
    module, variables, _ = zoo.get_network("AlexNet", 3, 10, (32, 32), jax.random.key(0))
    head = zoo.model_head(module)
    feats = head(variables, jnp.zeros((2, 32, 32, 3)))
    assert feats.shape == (2, 192 * 4 * 4)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        zoo.model_head(zoo.MLP(channel=3, num_classes=10))


def test_embed_feature_extraction():
    # ModelHead capability (networks.py:9-19): features without classifier
    module, variables, _ = zoo.get_network("ConvNet", 3, 10, (32, 32), jax.random.key(0))
    emb = module.apply(variables, jnp.zeros((2, 32, 32, 3)), train=False, method=module.embed)
    assert emb.ndim == 2 and emb.shape[0] == 2
    # avgpooling depth 3: 32 -> 4; 128 channels -> 2048 features
    assert emb.shape[1] == 128 * 4 * 4


def test_batchnorm_train_updates_stats_and_fedavg():
    module, variables, apply_fn = zoo.get_network("ConvNetBN", 3, 10, (32, 32), jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (8, 32, 32, 3))
    out, new_stats = apply_fn(variables, x, train=True)
    # running stats moved
    old = jax.tree.leaves(variables["batch_stats"])
    new = jax.tree.leaves(new_stats)
    assert any(not np.allclose(a, b) for a, b in zip(old, new))
    # whole-variables FedAvg (params + batch_stats) via tree algebra,
    # matching the reference's full state-dict aggregation
    v2 = jax.tree.map(lambda a: a + 0.1, variables)
    stacked = tm.tree_stack([variables, v2])
    avg = tm.tree_weighted_sum(stacked, np.array([0.5, 0.5], np.float32))
    expect = jax.tree.map(lambda a, b: (a + b) / 2, variables, v2)
    assert tm.tree_allclose(avg, expect, atol=1e-6)


def test_swish():
    x = jnp.array([-1.0, 0.0, 2.0])
    np.testing.assert_allclose(
        np.asarray(zoo.swish(x)), np.asarray(x) * (1 / (1 + np.exp(-np.asarray(x)))),
        atol=1e-6,
    )
