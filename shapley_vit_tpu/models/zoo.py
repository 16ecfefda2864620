"""Model zoo — the reference's breadth models as flax.linen modules.

Reference: ``federated_learning/networks.py`` (MLP family, configurable
ConvNet, LeNet, AlexNet/AlexNetBN, VGG11-19 with instance/batch norm switch,
ResNet18/34/50/101/152 and the _AP average-pool variants, ModelHead feature
extractor, Swish) and the ``get_network`` factory (utils.py:1312-1403).

Architectural parity notes:
  * layouts are NHWC (TPU-native) vs. the reference's NCHW; widths, kernel
    sizes, paddings (incl. the channel==1 first-layer padding quirks), pool
    shapes and classifier dims match exactly;
  * "instancenorm" is GroupNorm(groups=channels) and "groupnorm" is
    GroupNorm(4), as in networks.py:124-131;
  * BatchNorm running statistics live in the ``batch_stats`` collection —
    FedAvg over ``{params, batch_stats}`` matches the reference's
    whole-state-dict aggregation (SURVEY.md §7 "aggregating batch-norm");
  * every image model exposes ``embed()`` (the ModelHead capability,
    networks.py:9-19) via ``method=``;
  * the factory takes an explicit PRNG key (the reference seeds torch from
    wall-clock time at utils.py:1313 — not reproducible, not replicated).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def swish(x):
    """Swish(x) = x·σ(x) (networks.py:23-28)."""
    return x * jax.nn.sigmoid(x)


_ACTS = {
    "sigmoid": jax.nn.sigmoid,
    "relu": jax.nn.relu,
    "leakyrelu": lambda x: jax.nn.leaky_relu(x, 0.01),
    "swish": swish,
}


def _norm_layer(net_norm: str, channels: int, train: bool):
    # epsilon=1e-5 everywhere: torch's default (flax's 1e-6 drifts outputs
    # at the 1e-4 level; gold-tested against the reference's own nets)
    if net_norm == "batchnorm":
        return nn.BatchNorm(use_running_average=not train, epsilon=1e-5)
    if net_norm == "layernorm":
        # torch LayerNorm(C,H,W): normalize over all non-batch axes
        return nn.LayerNorm(
            reduction_axes=(-3, -2, -1), feature_axes=(-3, -2, -1), epsilon=1e-5
        )
    if net_norm == "instancenorm":
        return nn.GroupNorm(num_groups=channels, epsilon=1e-5)
    if net_norm == "groupnorm":
        return nn.GroupNorm(num_groups=4, epsilon=1e-5)
    raise ValueError(f"unknown net_norm: {net_norm}")


def _max_pool(x):
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def _avg_pool(x, k=2, s=2):
    return nn.avg_pool(x, (k, k), strides=(s, s))


def _flatten(x):
    return x.reshape(x.shape[0], -1)


# ---------------------------------------------------------------------------
# MLP family (networks.py:32-75)
# ---------------------------------------------------------------------------

class MLP(nn.Module):
    channel: int
    num_classes: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _flatten(x)
        x = jax.nn.relu(nn.Dense(128)(x))
        x = jax.nn.relu(nn.Dense(128)(x))
        return nn.Dense(self.num_classes)(x)


class MLP_linear(nn.Module):
    input_size: int
    num_classes: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.Dense(self.num_classes)(_flatten(x))


class MLP_tabular(nn.Module):
    input_size: int
    num_classes: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _flatten(x)
        for width in (64, 128, 256, 512):
            x = jax.nn.relu(nn.Dense(width)(x))
        return nn.Dense(self.num_classes)(x)


# ---------------------------------------------------------------------------
# ConvNet (networks.py:78-152)
# ---------------------------------------------------------------------------

class ConvNet(nn.Module):
    channel: int
    num_classes: int
    net_width: int = 128
    net_depth: int = 3
    net_act: str = "relu"
    net_norm: str = "instancenorm"
    net_pooling: str = "avgpooling"
    im_size: Tuple[int, int] = (32, 32)

    @nn.compact
    def features(self, x, train: bool = False):
        if x.shape[1] == 28:  # 28x28 inputs padded up to 32 (networks.py:138)
            x = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
        act = _ACTS[self.net_act]
        for d in range(self.net_depth):
            pad = 3 if self.channel == 1 and d == 0 else 1
            x = nn.Conv(self.net_width, (3, 3), padding=pad)(x)
            if self.net_norm != "none":
                x = _norm_layer(self.net_norm, self.net_width, train)(x)
            x = act(x)
            if self.net_pooling == "maxpooling":
                x = _max_pool(x)
            elif self.net_pooling == "avgpooling":
                x = _avg_pool(x)
        return x

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = self.features(x, train)
        return nn.Dense(self.num_classes)(_flatten(x))

    def embed(self, x, train: bool = False):
        return _flatten(self.features(x, train))


# ---------------------------------------------------------------------------
# LeNet (networks.py:157-178)
# ---------------------------------------------------------------------------

class LeNet(nn.Module):
    channel: int
    num_classes: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(6, (5, 5), padding=2 if self.channel == 1 else 0)(x)
        x = _max_pool(jax.nn.relu(x))
        x = nn.Conv(16, (5, 5), padding=0)(x)
        x = _max_pool(jax.nn.relu(x))
        x = _flatten(x)
        x = jax.nn.relu(nn.Dense(120)(x))
        x = jax.nn.relu(nn.Dense(84)(x))
        return nn.Dense(self.num_classes)(x)


# ---------------------------------------------------------------------------
# AlexNet (networks.py:183-250)
# ---------------------------------------------------------------------------

class AlexNet(nn.Module):
    channel: int
    num_classes: int
    use_bn: bool = False

    @nn.compact
    def features(self, x, train: bool = False):
        def maybe_bn(x):
            return nn.BatchNorm(use_running_average=not train)(x) if self.use_bn else x

        x = nn.Conv(128, (5, 5), padding=4 if self.channel == 1 else 2)(x)
        x = _max_pool(jax.nn.relu(maybe_bn(x)))
        x = nn.Conv(192, (5, 5), padding=2)(x)
        x = _max_pool(jax.nn.relu(maybe_bn(x)))
        x = nn.Conv(256, (3, 3), padding=1)(x)
        x = jax.nn.relu(maybe_bn(x))
        x = nn.Conv(192, (3, 3), padding=1)(x)
        x = jax.nn.relu(maybe_bn(x))
        x = nn.Conv(192, (3, 3), padding=1)(x)
        x = _max_pool(jax.nn.relu(maybe_bn(x)))
        return x

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.Dense(self.num_classes)(_flatten(self.features(x, train)))

    def embed(self, x, train: bool = False):
        return _flatten(self.features(x, train))


# ---------------------------------------------------------------------------
# VGG (networks.py:254-302)
# ---------------------------------------------------------------------------

CFG_VGG = {
    "VGG11": [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    "VGG13": [64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    "VGG16": [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
              512, 512, 512, "M"],
    "VGG19": [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M", 512, 512, 512, 512,
              "M", 512, 512, 512, 512, "M"],
}


class VGG(nn.Module):
    vgg_name: str
    channel: int
    num_classes: int
    norm: str = "instancenorm"

    @nn.compact
    def features(self, x, train: bool = False):
        for ic, v in enumerate(CFG_VGG[self.vgg_name]):
            if v == "M":
                x = _max_pool(x)
            else:
                pad = 3 if self.channel == 1 and ic == 0 else 1
                x = nn.Conv(v, (3, 3), padding=pad)(x)
                x = _norm_layer(self.norm, v, train)(x)
                x = jax.nn.relu(x)
        return _avg_pool(x, k=1, s=1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.Dense(self.num_classes)(_flatten(self.features(x, train)))

    def embed(self, x, train: bool = False):
        return _flatten(self.features(x, train))


# ---------------------------------------------------------------------------
# ResNet (networks.py:422-538) + _AP variants (networks.py:305-418)
# ---------------------------------------------------------------------------

class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    norm: str = "instancenorm"
    avg_pool_variant: bool = False  # _AP: stride->1 conv + avgpool

    expansion = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_planes = x.shape[-1]
        stride = 1 if self.avg_pool_variant else self.stride
        out = nn.Conv(self.planes, (3, 3), strides=stride, padding=1, use_bias=False)(x)
        out = jax.nn.relu(_norm_layer(self.norm, self.planes, train)(out))
        if self.avg_pool_variant and self.stride != 1:
            out = _avg_pool(out)
        out = nn.Conv(self.planes, (3, 3), strides=1, padding=1, use_bias=False)(out)
        out = _norm_layer(self.norm, self.planes, train)(out)
        if self.stride != 1 or in_planes != self.planes * self.expansion:
            if self.avg_pool_variant:
                sc = nn.Conv(self.planes * self.expansion, (1, 1), strides=1, use_bias=False)(x)
                sc = _avg_pool(sc)
            else:
                sc = nn.Conv(self.planes * self.expansion, (1, 1), strides=self.stride,
                             use_bias=False)(x)
            sc = _norm_layer(self.norm, self.planes * self.expansion, train)(sc)
        else:
            sc = x
        return jax.nn.relu(out + sc)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    norm: str = "instancenorm"
    avg_pool_variant: bool = False

    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_planes = x.shape[-1]
        stride = 1 if self.avg_pool_variant else self.stride
        out = nn.Conv(self.planes, (1, 1), use_bias=False)(x)
        out = jax.nn.relu(_norm_layer(self.norm, self.planes, train)(out))
        out = nn.Conv(self.planes, (3, 3), strides=stride, padding=1, use_bias=False)(out)
        out = jax.nn.relu(_norm_layer(self.norm, self.planes, train)(out))
        if self.avg_pool_variant and self.stride != 1:
            out = _avg_pool(out)
        out = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False)(out)
        out = _norm_layer(self.norm, self.planes * self.expansion, train)(out)
        if self.stride != 1 or in_planes != self.planes * self.expansion:
            if self.avg_pool_variant:
                sc = nn.Conv(self.planes * self.expansion, (1, 1), strides=1, use_bias=False)(x)
                sc = _avg_pool(sc)
            else:
                sc = nn.Conv(self.planes * self.expansion, (1, 1), strides=self.stride,
                             use_bias=False)(x)
            sc = _norm_layer(self.norm, self.planes * self.expansion, train)(sc)
        else:
            sc = x
        return jax.nn.relu(out + sc)


class ResNet(nn.Module):
    block: Any            # BasicBlock or Bottleneck class
    num_blocks: Sequence[int]
    channel: int = 3
    num_classes: int = 10
    norm: str = "instancenorm"
    avg_pool_variant: bool = False

    @nn.compact
    def features(self, x, train: bool = False):
        x = nn.Conv(64, (3, 3), strides=1, padding=1, use_bias=False)(x)
        x = jax.nn.relu(_norm_layer(self.norm, 64, train)(x))
        for stage, (planes, blocks) in enumerate(zip((64, 128, 256, 512), self.num_blocks)):
            strides = [1 if stage == 0 else 2] + [1] * (blocks - 1)
            for s in strides:
                x = self.block(
                    planes=planes, stride=s, norm=self.norm,
                    avg_pool_variant=self.avg_pool_variant,
                )(x, train)
        if self.avg_pool_variant:
            x = _avg_pool(x, k=1, s=1)  # networks.py:398 (no-op pool)
        else:
            x = _avg_pool(x, k=4, s=4)  # networks.py:508 F.avg_pool2d(out, 4)
        return x

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.Dense(self.num_classes)(_flatten(self.features(x, train)))

    def embed(self, x, train: bool = False):
        return _flatten(self.features(x, train))


# ---------------------------------------------------------------------------
# factory (utils.py:1312-1403)
# ---------------------------------------------------------------------------

def model_head(module: nn.Module):
    """Feature-extractor wrapper (reference ModelHead, networks.py:9-19:
    drop the classifier, flatten features). Returns
    ``apply_fn(variables, x, train=False) -> [B, features]`` backed by the
    module's ``embed`` method."""
    if not hasattr(module, "embed"):
        raise ValueError(f"{type(module).__name__} exposes no embed() features")

    def apply_fn(variables, x, train: bool = False):
        return module.apply(variables, x, train=train, method=module.embed)

    return apply_fn


def get_default_convnet_setting():
    """(utils.py:1306-1308)."""
    return 128, 3, "relu", "instancenorm", "avgpooling"


def _convnet(channel, num_classes, im_size, **overrides):
    w, d, a, n, p = get_default_convnet_setting()
    kw = dict(net_width=w, net_depth=d, net_act=a, net_norm=n, net_pooling=p)
    kw.update(overrides)
    return ConvNet(channel=channel, num_classes=num_classes, im_size=tuple(im_size), **kw)


def build_network(model: str, channel: int, num_classes: int, im_size=(32, 32)) -> nn.Module:
    """Name -> module (the reference's ~30 named variants, utils.py:1316-1390)."""
    if model == "MLP":
        return MLP(channel=channel, num_classes=num_classes)
    if model == "MLP_tabular":
        return MLP_tabular(input_size=im_size, num_classes=num_classes)
    if model == "MLP_linear":
        return MLP_linear(input_size=im_size, num_classes=num_classes)
    if model == "LeNet":
        return LeNet(channel=channel, num_classes=num_classes)
    if model == "AlexNet":
        return AlexNet(channel=channel, num_classes=num_classes)
    if model == "AlexNetBN":
        return AlexNet(channel=channel, num_classes=num_classes, use_bn=True)
    if model.startswith("VGG"):
        bn = model.endswith("BN")
        base = model[:-2] if bn else model
        if base not in CFG_VGG:
            raise ValueError(f"unknown model: {model}")
        return VGG(vgg_name=base, channel=channel, num_classes=num_classes,
                   norm="batchnorm" if bn else "instancenorm")
    if model.startswith("ResNet"):
        ap = model.endswith("_AP")
        core = model[:-3] if ap else model
        bn = core.endswith("BN")
        core = core[:-2] if bn else core
        depths = {
            "ResNet18": (BasicBlock, [2, 2, 2, 2]),
            "ResNet34": (BasicBlock, [3, 4, 6, 3]),
            "ResNet50": (Bottleneck, [3, 4, 6, 3]),
            "ResNet101": (Bottleneck, [3, 4, 23, 3]),
            "ResNet152": (Bottleneck, [3, 8, 36, 3]),
        }
        if core not in depths:
            raise ValueError(f"unknown model: {model}")
        block, nb = depths[core]
        return ResNet(block=block, num_blocks=nb, channel=channel,
                      num_classes=num_classes,
                      norm="batchnorm" if bn else "instancenorm",
                      avg_pool_variant=ap)
    if model.startswith("ConvNet"):
        suffix = model[len("ConvNet"):]
        if suffix == "":
            return _convnet(channel, num_classes, im_size)
        if suffix.startswith("D") and suffix[1:].isdigit():
            return _convnet(channel, num_classes, im_size, net_depth=int(suffix[1:]))
        if suffix.startswith("W") and suffix[1:].isdigit():
            return _convnet(channel, num_classes, im_size, net_width=int(suffix[1:]))
        acts = {"AS": "sigmoid", "AR": "relu", "AL": "leakyrelu", "ASwish": "swish"}
        if suffix in acts:
            return _convnet(channel, num_classes, im_size, net_act=acts[suffix])
        if suffix == "ASwishBN":
            return _convnet(channel, num_classes, im_size, net_act="swish", net_norm="batchnorm")
        norms = {"NN": "none", "BN": "batchnorm", "LN": "layernorm",
                 "IN": "instancenorm", "GN": "groupnorm"}
        if suffix in norms:
            return _convnet(channel, num_classes, im_size, net_norm=norms[suffix])
        pools = {"NP": "none", "MP": "maxpooling", "AP": "avgpooling"}
        if suffix in pools:
            return _convnet(channel, num_classes, im_size, net_pooling=pools[suffix])
    raise ValueError(f"unknown model: {model}")


def get_network(
    model: str,
    channel: int,
    num_classes: int,
    im_size=(32, 32),
    key: Optional[jax.Array] = None,
) -> Tuple[nn.Module, Any, Callable]:
    """Factory parity (utils.py:1312-1403): build + init.

    Returns ``(module, variables, apply_fn)`` where
    ``apply_fn(variables, x, train=False) -> logits`` (and, in train mode
    with BatchNorm, ``(logits, new_batch_stats)``). Multi-device placement is
    the caller's concern via parallel/ (the reference auto-wraps
    nn.DataParallel at utils.py:1394-1398).
    """
    key = key if key is not None else jax.random.key(0)
    module = build_network(model, channel, num_classes, im_size)
    if model in ("MLP_tabular", "MLP_linear"):
        dummy = jnp.zeros((1, im_size if isinstance(im_size, int) else im_size[0]))
    else:
        dummy = jnp.zeros((1, im_size[0], im_size[1], channel))
    variables = module.init(key, dummy, train=False)

    def apply_fn(variables, x, train: bool = False):
        if train and "batch_stats" in variables:
            out, mut = module.apply(variables, x, train=True, mutable=["batch_stats"])
            return out, mut["batch_stats"]
        return module.apply(variables, x, train=train)

    return module, variables, apply_fn
