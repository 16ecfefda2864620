"""Inception-v3 with the U-Net-style ``Denoise`` front-end for adversarial
defense, plus the paired orig/adv training ``Net`` and its losses.

Reference: ``shapleyserver/models/inception.py`` (full InceptionV3 at
329-430, Denoise 261-327, DenoiseLoss/Loss 433-466, paired forward Net
469-493, pretrained loader ``get_net`` 495-509 — dead py2 ``has_key`` code in
the reference; here it loads a torch checkpoint if one exists and otherwise
returns the randomly-initialized net) and the 4-class wrapper
``xray_inception_network.inception_network`` (9-27; its dataset-type
branching always passes ``num_classes=4``, line 23 — preserved).

Parity notes: NHWC layouts; BasicConv2d = bias-free conv + BatchNorm
(eps=1e-3) + ReLU; truncated-normal init with the aux head's per-layer
stddevs; the ``knee`` dataset-type pooling branch is a constructor flag
instead of a global-config read (the reference imports ``opt`` into model
code — a coupling we drop)."""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class BasicConv2d(nn.Module):
    out_channels: int
    kernel_size: Tuple[int, int] = (3, 3)
    stride: int = 1
    padding: Any = 0
    stddev: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        elif isinstance(pad, tuple) and isinstance(pad[0], int):
            pad = ((pad[0], pad[0]), (pad[1], pad[1]))
        x = nn.Conv(
            self.out_channels,
            self.kernel_size,
            strides=self.stride,
            padding=pad,
            use_bias=False,
            kernel_init=nn.initializers.truncated_normal(self.stddev, lower=-2.0, upper=2.0),
        )(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=0.001)(x)
        return jax.nn.relu(x)


def _avg_pool_3_1_1(x):
    # AvgPool2d(3, stride=1, padding=1, count_include_pad=False)
    summed = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
    # correct for zero-padded contributions at the borders
    ones = jnp.ones((1,) + x.shape[1:3] + (1,), x.dtype)
    frac = nn.avg_pool(ones, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
    return summed / frac


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x, train=False):
        b0 = BasicConv2d(64, (1, 1))(x, train)
        b1 = BasicConv2d(48, (1, 1))(x, train)
        b1 = BasicConv2d(64, (5, 5), padding=2)(b1, train)
        b2 = BasicConv2d(64, (1, 1))(x, train)
        b2 = BasicConv2d(96, (3, 3), padding=1)(b2, train)
        b2 = BasicConv2d(96, (3, 3), padding=1)(b2, train)
        b3 = BasicConv2d(self.pool_features, (1, 1))(_avg_pool_3_1_1(x), train)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        b0 = BasicConv2d(384, (3, 3), stride=2)(x, train)
        b1 = BasicConv2d(64, (1, 1))(x, train)
        b1 = BasicConv2d(96, (3, 3), padding=1)(b1, train)
        b1 = BasicConv2d(96, (3, 3), stride=2)(b1, train)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b0, b1, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x, train=False):
        c7 = self.channels_7x7
        b0 = BasicConv2d(192, (1, 1))(x, train)
        b1 = BasicConv2d(c7, (1, 1))(x, train)
        b1 = BasicConv2d(c7, (1, 7), padding=(0, 3))(b1, train)
        b1 = BasicConv2d(192, (7, 1), padding=(3, 0))(b1, train)
        b2 = BasicConv2d(c7, (1, 1))(x, train)
        b2 = BasicConv2d(c7, (7, 1), padding=(3, 0))(b2, train)
        b2 = BasicConv2d(c7, (1, 7), padding=(0, 3))(b2, train)
        b2 = BasicConv2d(c7, (7, 1), padding=(3, 0))(b2, train)
        b2 = BasicConv2d(192, (1, 7), padding=(0, 3))(b2, train)
        b3 = BasicConv2d(192, (1, 1))(_avg_pool_3_1_1(x), train)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        b0 = BasicConv2d(192, (1, 1))(x, train)
        b0 = BasicConv2d(320, (3, 3), stride=2)(b0, train)
        b1 = BasicConv2d(192, (1, 1))(x, train)
        b1 = BasicConv2d(192, (1, 7), padding=(0, 3))(b1, train)
        b1 = BasicConv2d(192, (7, 1), padding=(3, 0))(b1, train)
        b1 = BasicConv2d(192, (3, 3), stride=2)(b1, train)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b0, b1, bp], axis=-1)


class InceptionE(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        b0 = BasicConv2d(320, (1, 1))(x, train)
        b1 = BasicConv2d(384, (1, 1))(x, train)
        b1 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1))(b1, train),
            BasicConv2d(384, (3, 1), padding=(1, 0))(b1, train),
        ], axis=-1)
        b2 = BasicConv2d(448, (1, 1))(x, train)
        b2 = BasicConv2d(384, (3, 3), padding=1)(b2, train)
        b2 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1))(b2, train),
            BasicConv2d(384, (3, 1), padding=(1, 0))(b2, train),
        ], axis=-1)
        b3 = BasicConv2d(192, (1, 1))(_avg_pool_3_1_1(x), train)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionAux(nn.Module):
    """Auxiliary head (inception.py:160-182) with its reduced init stddevs."""

    num_classes: int

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.avg_pool(x, (5, 5), strides=(3, 3))
        x = BasicConv2d(128, (1, 1))(x, train)
        x = BasicConv2d(768, (5, 5), stddev=0.01)(x, train)
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(
            self.num_classes,
            kernel_init=nn.initializers.truncated_normal(0.001, lower=-2.0, upper=2.0),
        )(x)


# ---------------------------------------------------------------------------
# Denoise U-Net (inception.py:200-327)
# ---------------------------------------------------------------------------

class DenoiseConv(nn.Module):
    """Conv block (inception.py:200-211)."""

    n_out: int
    stride: int = 1
    expansion = 1

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(self.n_out, (3, 3), strides=self.stride, padding=1, use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        return jax.nn.relu(x)


class DenoiseBottleneck(nn.Module):
    """Bottleneck block (inception.py:214-250)."""

    n_out: int
    stride: int = 1
    expansion = 4

    @nn.compact
    def __call__(self, x, train=False):
        n_in = x.shape[-1]
        out = nn.Conv(self.n_out, (1, 1), use_bias=False)(x)
        out = jax.nn.relu(nn.BatchNorm(use_running_average=not train)(out))
        out = nn.Conv(self.n_out, (3, 3), strides=self.stride, padding=1, use_bias=False)(out)
        out = jax.nn.relu(nn.BatchNorm(use_running_average=not train)(out))
        out = nn.Conv(self.n_out * 4, (1, 1), use_bias=False)(out)
        out = nn.BatchNorm(use_running_average=not train)(out)
        if self.stride != 1 or n_in != self.n_out * 4:
            sc = nn.Conv(self.n_out * 4, (1, 1), strides=self.stride, use_bias=False)(x)
            sc = nn.BatchNorm(use_running_average=not train)(sc)
        else:
            sc = x
        return jax.nn.relu(out + sc)


class Denoise(nn.Module):
    """U-Net-style residual denoiser (inception.py:261-327): forward pyramid
    with stride-2 stages, bilinear upsampling back with skip concatenation,
    1x1 projection, residual add."""

    h_in: int
    w_in: int
    block: Any = DenoiseConv
    fwd_in: int = 3
    fwd_out: Sequence[int] = (64, 128, 256, 256, 256)
    num_fwd: Sequence[int] = (2, 3, 3, 3, 3)
    back_out: Sequence[int] = (64, 128, 256, 256)
    num_back: Sequence[int] = (2, 3, 3, 3)

    @nn.compact
    def __call__(self, x, train=False):
        hs, ws = [], []
        h, w = self.h_in, self.w_in
        for _ in range(len(self.num_fwd)):
            hs.append(h)
            ws.append(w)
            h = -(-h // 2)
            w = -(-w // 2)

        out = x
        skips = []
        for i in range(len(self.num_fwd)):
            for j in range(self.num_fwd[i]):
                stride = 2 if (j == 0 and i != 0) else 1
                out = self.block(n_out=self.fwd_out[i], stride=stride)(out, train)
            if i != len(self.num_fwd) - 1:
                skips.append(out)

        for i in range(len(self.num_back) - 1, -1, -1):
            out = jax.image.resize(
                out, (out.shape[0], hs[i], ws[i], out.shape[-1]), "bilinear"
            )
            out = jnp.concatenate([out, skips[i]], axis=-1)
            for j in range(self.num_back[i]):
                out = self.block(n_out=self.back_out[i])(out, train)

        out = nn.Conv(self.fwd_in, (1, 1), use_bias=False)(out)
        return out + x


# ---------------------------------------------------------------------------
# Inception3 + wrapper (inception.py:329-430, xray_inception_network.py)
# ---------------------------------------------------------------------------

class Inception3(nn.Module):
    num_classes: int = 1001
    denoise: Optional[Any] = None          # a Denoise module instance or None
    knee_pooling: bool = False             # reference: opt.dataset_type == 'knee'
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False, defense: bool = False):
        if defense:
            if self.denoise is None:
                raise ValueError("defense=True requires a denoise module")
            x = self.denoise(x, train)
        x = BasicConv2d(32, (3, 3), stride=2)(x, train)
        x = BasicConv2d(32, (3, 3))(x, train)
        x = BasicConv2d(64, (3, 3), padding=1)(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = BasicConv2d(80, (1, 1))(x, train)
        x = BasicConv2d(192, (3, 3))(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = InceptionA(pool_features=32)(x, train)
        x = InceptionA(pool_features=64)(x, train)
        x = InceptionA(pool_features=64)(x, train)
        x = InceptionB()(x, train)
        x = InceptionC(channels_7x7=128)(x, train)
        x = InceptionC(channels_7x7=160)(x, train)
        x = InceptionC(channels_7x7=160)(x, train)
        x = InceptionC(channels_7x7=192)(x, train)
        x = InceptionD()(x, train)
        x = InceptionE()(x, train)
        x = InceptionE()(x, train)

        if self.knee_pooling:
            # global-average pool, max over batch, 2-class head (inception.py:414-418)
            x = jnp.mean(x, axis=(1, 2))
            x = jnp.max(x, axis=0, keepdims=True)
            return nn.Dense(2)(x)

        x = nn.avg_pool(x, (5, 5), strides=(5, 5))  # reference kernel_size=5
        if train:
            x = nn.Dropout(self.dropout_rate, deterministic=False)(x)
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(
            self.num_classes,
            kernel_init=nn.initializers.truncated_normal(0.1, lower=-2.0, upper=2.0),
        )(x)


class inception_network(nn.Module):
    """4-class wrapper (xray_inception_network.py:9-27). The reference
    branches num_classes on dataset_type but always constructs with 4 — the
    default here preserves that."""

    dataset_type: str = "x-ray"
    num_classes: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False, defense: bool = False):
        return Inception3(num_classes=self.num_classes)(x, train=train, defense=defense)


# ---------------------------------------------------------------------------
# losses + paired net (inception.py:433-509)
# ---------------------------------------------------------------------------

def denoise_loss(x, y, n: int, hard_mining: float = 0.0, norm: bool = False):
    """|x − y|^n / n with optional hard-example mining and normalization
    (inception.py:433-454)."""
    assert 0.0 <= hard_mining <= 1.0
    loss = jnp.abs(x - y) ** n / n
    if hard_mining > 0:
        flat = loss.reshape(-1)
        k = int(flat.shape[0] * hard_mining)
        top, idcs = jax.lax.top_k(flat, k)
        loss = top
        y = y.reshape(-1)[idcs]
    loss = jnp.mean(loss)
    if norm:
        loss = loss / jnp.mean(jnp.abs(y) ** n)
    return loss


def paired_loss(xs, ys, n: int, hard_mining: float = 0.0, norm: bool = False):
    """Per-feature-level list of denoise losses (inception.py:457-466)."""
    return [denoise_loss(x, y, n, hard_mining, norm) for x, y in zip(xs, ys)]


class Net(nn.Module):
    """Paired orig/adv forward (inception.py:469-493): clean logits, control
    (undefended adv) logits + loss, defended adv logits + loss."""

    input_size: Tuple[int, int] = (299, 299)
    block: Any = DenoiseConv
    fwd_out: Sequence[int] = (64, 128, 256, 256, 256)
    num_fwd: Sequence[int] = (2, 3, 3, 3, 3)
    back_out: Sequence[int] = (64, 128, 256, 256)
    num_back: Sequence[int] = (2, 3, 3, 3)
    n: int = 1
    hard_mining: float = 0.0
    loss_norm: bool = False
    num_classes: int = 1001

    def setup(self):
        denoise = Denoise(
            h_in=self.input_size[0], w_in=self.input_size[1], block=self.block,
            fwd_in=3, fwd_out=tuple(self.fwd_out), num_fwd=tuple(self.num_fwd),
            back_out=tuple(self.back_out), num_back=tuple(self.num_back),
        )
        self.net = Inception3(num_classes=self.num_classes, denoise=denoise)

    def __call__(self, orig_x, adv_x, requires_control: bool = True, train: bool = False):
        orig_out = self.net(orig_x, train=train)
        if requires_control:
            control_out = self.net(adv_x, train=train)
            control_loss = paired_loss(
                [control_out], [orig_out], self.n, self.hard_mining, self.loss_norm
            )
        adv_out = self.net(adv_x, train=train, defense=True)
        loss = paired_loss([adv_out], [orig_out], self.n, self.hard_mining, self.loss_norm)
        if not requires_control:
            return orig_out, adv_out, loss
        return orig_out, adv_out, loss, control_out, control_loss


def get_net(input_size, block=DenoiseConv, fwd_out=(64, 128, 256, 256, 256),
            num_fwd=(2, 3, 3, 3, 3), back_out=(64, 128, 256, 256),
            num_back=(2, 3, 3, 3), n=1, hard_mining=0.0, loss_norm=False,
            pretrained_path: Optional[str] = None, rng=None):
    """Build the paired defense net (inception.py:495-509).

    With ``pretrained_path`` (the reference's ``inceptionv3_state.pth`` — a
    torch state dict in the reference's own ``conv2d_1a``/``Mixed_5b``/
    ``classif`` naming) this also initializes and returns the flax variables
    with the inception weights overlaid, mirroring the reference's load into
    ``net.net`` (its py2 ``has_key`` path was dead; this one works):
    returns ``(net, variables)``. Without it, returns ``net`` only —
    initialize with ``net.init`` as usual.
    """
    net = Net(input_size=tuple(input_size), block=block, fwd_out=tuple(fwd_out),
              num_fwd=tuple(num_fwd), back_out=tuple(back_out),
              num_back=tuple(num_back), n=n, hard_mining=hard_mining,
              loss_norm=loss_norm)
    if pretrained_path is not None:
        import numpy as np

        from shapley_vit_tpu.models.convert import torch_inception3_to_flax

        if pretrained_path.endswith(".npz"):
            with np.load(pretrained_path) as z:
                sd = {k: z[k] for k in z.files}
        else:
            # torch zip checkpoints parse torch-free through the restricted
            # reader; only legacy pre-1.6 files fall back to torch itself
            from shapley_vit_tpu.fl import torch_ckpt

            try:
                sd = torch_ckpt.read_checkpoint(pretrained_path)
            except (
                torch_ckpt.NativeFormatError,
                torch_ckpt.UnsafeCheckpointError,
            ):
                # legacy format, or a zip whose pickle carries benign
                # non-tensor objects (numpy scalars, Namespace...) outside
                # the restricted reader's vocabulary. pretrained_path is an
                # OPERATOR-provided local file — unlike the serve ingest
                # path — so torch's full loader is an acceptable fallback
                # here (the reference loads this file the same way)
                import torch

                try:
                    sd = torch.load(
                        pretrained_path, map_location="cpu", weights_only=True
                    )
                except Exception:
                    sd = torch.load(
                        pretrained_path, map_location="cpu", weights_only=False
                    )
            if isinstance(sd, dict) and "state_dict" in sd:
                sd = sd["state_dict"]
        rng = rng if rng is not None else jax.random.key(0)
        dummy = jnp.zeros((1, input_size[0], input_size[1], 3), jnp.float32)
        variables = net.init(rng, dummy, dummy, requires_control=False)
        return net, torch_inception3_to_flax(sd, variables)
    return net
