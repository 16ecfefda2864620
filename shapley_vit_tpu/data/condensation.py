"""Data-condensation suite: gradient-matching losses, differentiable
augmentation (DiffAugment), CPU augmentation, and the condensation train
loops.

Reference: ``federated_learning/utils.py:1268-1878`` — ``TensorDataset`` /
``ServerSynDataset`` (1268-1304), gradient ``match_loss`` ours/mse/cos with
``distance_wb`` (1415-1460), ``epoch`` / ``epoch_data_weight`` train loops
with per-sample weights (1485-1572), CPU ``augment`` crop/scale/rotate/noise
(1574-1633), ``get_daparam`` (1641-1657), ``get_eval_pool`` (1660-1680), and
the DiffAugment family with Siamese seeding (1683-1859).

JAX-native notes:
  * images are NHWC (reference NCHW);
  * DiffAugment threads an explicit PRNG key; ``siamese=True`` reuses
    sample 0's draw for the whole batch (the reference reseeds torch's global
    generator per draw to synchronize the two branches — same effect);
  * the geometric transforms implement torch's ``affine_grid``+``grid_sample``
    semantics (align_corners=False, bilinear, zero padding) so the math is
    differentiable end-to-end, as required by gradient matching;
  * ``distance_wb`` groups conv kernels by OUTPUT channel — flax layout
    [h, w, in, out] vs torch [out, in, h, w]; both reduce to (out, rest).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from shapley_vit_tpu.data.arrays import ArrayDataset


@dataclasses.dataclass
class SynDataset:
    """Server-side synthetic set with per-sample source-client ids
    (reference ServerSynDataset, utils.py:1286-1304)."""

    images: np.ndarray
    labels: np.ndarray
    src: np.ndarray

    def __len__(self):
        return len(self.labels)

    def as_array_dataset(self) -> ArrayDataset:
        return ArrayDataset(images=self.images, labels=self.labels)


# ---------------------------------------------------------------------------
# gradient matching (utils.py:1406-1460)
# ---------------------------------------------------------------------------

def distance_wb(gwr: jax.Array, gws: jax.Array) -> jax.Array:
    """Per-parameter grouped cosine distance (utils.py:1406-1426): conv
    kernels grouped by output channel, linear by row, 1-D (norm/bias)
    contributes 0."""
    if gwr.ndim == 4:  # flax conv [h, w, in, out] -> (out, rest)
        gwr = jnp.moveaxis(gwr, -1, 0).reshape(gwr.shape[-1], -1)
        gws = jnp.moveaxis(gws, -1, 0).reshape(gws.shape[-1], -1)
    elif gwr.ndim == 3:  # layernorm [C, h, w] -> (C, h*w) (utils.py:1412-1414)
        gwr = gwr.reshape(gwr.shape[0], -1)
        gws = gws.reshape(gws.shape[0], -1)
    elif gwr.ndim == 2:  # linear [in, out] -> rows are outputs in torch; the
        # cosine-per-row distance is orientation-symmetric, keep as-is
        gwr, gws = gwr.T, gws.T
    elif gwr.ndim <= 1:
        return jnp.asarray(0.0, jnp.float32)
    cos = jnp.sum(gwr * gws, axis=-1) / (
        jnp.linalg.norm(gwr, axis=-1) * jnp.linalg.norm(gws, axis=-1) + 1e-6
    )
    return jnp.sum(1 - cos)


def match_loss(gw_syn, gw_real, dis_metric: str = "ours") -> jax.Array:
    """Gradient-matching distance over two gradient pytrees
    (utils.py:1430-1460): 'ours' grouped cosine, 'mse' squared error over the
    flattened concat, 'cos' single cosine over the flattened concat."""
    syn_leaves = jax.tree.leaves(gw_syn)
    real_leaves = jax.tree.leaves(gw_real)
    if dis_metric == "ours":
        return sum(distance_wb(r, s) for r, s in zip(real_leaves, syn_leaves))
    real_vec = jnp.concatenate([x.reshape(-1) for x in real_leaves])
    syn_vec = jnp.concatenate([x.reshape(-1) for x in syn_leaves])
    if dis_metric == "mse":
        return jnp.sum((syn_vec - real_vec) ** 2)
    if dis_metric == "cos":
        return 1 - jnp.sum(real_vec * syn_vec) / (
            jnp.linalg.norm(real_vec) * jnp.linalg.norm(syn_vec) + 1e-6
        )
    raise ValueError(f"unknown distance function: {dis_metric}")


# ---------------------------------------------------------------------------
# DiffAugment (utils.py:1683-1859)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class ParamDiffAug:
    """(utils.py:1683-1694)."""

    aug_mode: str = "S"
    prob_flip: float = 0.5
    ratio_scale: float = 1.2
    ratio_rotate: float = 15.0
    ratio_crop_pad: float = 0.125
    ratio_cutout: float = 0.5
    brightness: float = 1.0
    saturation: float = 2.0
    contrast: float = 0.5


def _maybe_siamese(vals: jax.Array, siamese: bool) -> jax.Array:
    return jnp.broadcast_to(vals[:1], vals.shape) if siamese else vals


def _affine_sample(x: jax.Array, theta: jax.Array) -> jax.Array:
    """torch affine_grid+grid_sample (align_corners=False, bilinear, zeros).

    x: [B, H, W, C]; theta: [B, 2, 3] mapping output normalized coords
    (u, v, 1) -> input normalized coords."""
    B, H, W, C = x.shape
    u = (2 * jnp.arange(W) + 1) / W - 1          # x-coord, along width
    v = (2 * jnp.arange(H) + 1) / H - 1          # y-coord, along height
    vv, uu = jnp.meshgrid(v, u, indexing="ij")   # [H, W]
    ones = jnp.ones_like(uu)
    coords = jnp.stack([uu, vv, ones], axis=-1)  # [H, W, 3]
    src = jnp.einsum("bij,hwj->bhwi", theta, coords)  # [B, H, W, 2] (x, y)
    px = ((src[..., 0] + 1) * W - 1) / 2
    py = ((src[..., 1] + 1) * H - 1) / 2

    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = px - x0
    wy = py - y0

    def gather(yi, xi):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi_c = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        vals = jax.vmap(lambda img, yy, xx: img[yy, xx])(x, yi_c, xi_c)  # [B,H,W,C]
        return vals * valid[..., None]

    out = (
        gather(y0, x0) * ((1 - wx) * (1 - wy))[..., None]
        + gather(y0, x0 + 1) * (wx * (1 - wy))[..., None]
        + gather(y0 + 1, x0) * ((1 - wx) * wy)[..., None]
        + gather(y0 + 1, x0 + 1) * (wx * wy)[..., None]
    )
    return out


def rand_scale(x, key, param: ParamDiffAug, siamese=False):
    """(utils.py:1734-1749)."""
    ratio = param.ratio_scale
    k1, k2 = jax.random.split(key)
    sx = jax.random.uniform(k1, (x.shape[0],)) * (ratio - 1.0 / ratio) + 1.0 / ratio
    sy = jax.random.uniform(k2, (x.shape[0],)) * (ratio - 1.0 / ratio) + 1.0 / ratio
    sx = _maybe_siamese(sx, siamese)
    sy = _maybe_siamese(sy, siamese)
    zeros = jnp.zeros_like(sx)
    theta = jnp.stack(
        [jnp.stack([sx, zeros, zeros], -1), jnp.stack([zeros, sy, zeros], -1)], axis=1
    )
    return _affine_sample(x, theta)


def rand_rotate(x, key, param: ParamDiffAug, siamese=False):
    """(utils.py:1752-1763)."""
    ratio = param.ratio_rotate
    theta_deg = (jax.random.uniform(key, (x.shape[0],)) - 0.5) * 2 * ratio / 180 * jnp.pi
    theta_deg = _maybe_siamese(theta_deg, siamese)
    c, s = jnp.cos(theta_deg), jnp.sin(theta_deg)
    zeros = jnp.zeros_like(c)
    theta = jnp.stack(
        [jnp.stack([c, -s, zeros], -1), jnp.stack([s, c, zeros], -1)], axis=1
    )
    return _affine_sample(x, theta)


def rand_flip(x, key, param: ParamDiffAug, siamese=False):
    """Horizontal flip with prob_flip (utils.py:1766-1772)."""
    randf = jax.random.uniform(key, (x.shape[0], 1, 1, 1))
    randf = _maybe_siamese(randf, siamese)
    return jnp.where(randf < param.prob_flip, x[:, :, ::-1, :], x)


def rand_brightness(x, key, param: ParamDiffAug, siamese=False):
    randb = jax.random.uniform(key, (x.shape[0], 1, 1, 1), x.dtype)
    randb = _maybe_siamese(randb, siamese)
    return x + (randb - 0.5) * param.brightness


def rand_saturation(x, key, param: ParamDiffAug, siamese=False):
    x_mean = x.mean(axis=-1, keepdims=True)  # channel mean (torch dim=1)
    rands = jax.random.uniform(key, (x.shape[0], 1, 1, 1), x.dtype)
    rands = _maybe_siamese(rands, siamese)
    return (x - x_mean) * (rands * param.saturation) + x_mean


def rand_contrast(x, key, param: ParamDiffAug, siamese=False):
    x_mean = x.mean(axis=(1, 2, 3), keepdims=True)
    randc = jax.random.uniform(key, (x.shape[0], 1, 1, 1), x.dtype)
    randc = _maybe_siamese(randc, siamese)
    return (x - x_mean) * (randc + param.contrast) + x_mean


def rand_crop(x, key, param: ParamDiffAug, siamese=False):
    """Pad-and-shift crop (utils.py:1807-1827)."""
    B, H, W, C = x.shape
    shift_y = int(H * param.ratio_crop_pad + 0.5)
    shift_x = int(W * param.ratio_crop_pad + 0.5)
    k1, k2 = jax.random.split(key)
    ty = jax.random.randint(k1, (B, 1, 1), -shift_y, shift_y + 1)
    tx = jax.random.randint(k2, (B, 1, 1), -shift_x, shift_x + 1)
    ty = _maybe_siamese(ty, siamese)
    tx = _maybe_siamese(tx, siamese)
    gy = jnp.clip(jnp.arange(H)[None, :, None] + ty + 1, 0, H + 1)
    gx = jnp.clip(jnp.arange(W)[None, None, :] + tx + 1, 0, W + 1)
    x_pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    gy = jnp.broadcast_to(gy, (B, H, W))
    gx = jnp.broadcast_to(gx, (B, H, W))
    return jax.vmap(lambda img, yy, xx: img[yy, xx])(x_pad, gy, gx)


def rand_cutout(x, key, param: ParamDiffAug, siamese=False):
    """Zero a random rectangle of ratio_cutout (utils.py:1830-1848)."""
    B, H, W, C = x.shape
    ch = int(H * param.ratio_cutout + 0.5)
    cw = int(W * param.ratio_cutout + 0.5)
    k1, k2 = jax.random.split(key)
    oy = jax.random.randint(k1, (B, 1, 1), 0, H + (1 - ch % 2))
    ox = jax.random.randint(k2, (B, 1, 1), 0, W + (1 - cw % 2))
    oy = _maybe_siamese(oy, siamese)
    ox = _maybe_siamese(ox, siamese)
    yy = jnp.arange(H)[None, :, None]
    xx = jnp.arange(W)[None, None, :]
    y0 = oy - ch // 2
    x0 = ox - cw // 2
    in_cut = ((yy >= y0) & (yy < y0 + ch)) & ((xx >= x0) & (xx < x0 + cw))
    return x * (~in_cut)[..., None]


AUGMENT_FNS: Dict[str, List[Callable]] = {
    "color": [rand_brightness, rand_saturation, rand_contrast],
    "crop": [rand_crop],
    "cutout": [rand_cutout],
    "flip": [rand_flip],
    "scale": [rand_scale],
    "rotate": [rand_rotate],
}


def diff_augment(
    x: jax.Array,
    strategy: str = "",
    key: Optional[jax.Array] = None,
    param: Optional[ParamDiffAug] = None,
    siamese: bool = False,
) -> jax.Array:
    """DiffAugment entry (utils.py:1705-1730). mode 'S' picks ONE random
    strategy; mode 'M' applies them all in order. ``siamese=True`` is the
    reference's seed-synchronized two-branch mode."""
    if strategy in ("None", "none", ""):
        return x
    param = param or ParamDiffAug()
    key = key if key is not None else jax.random.key(0)
    parts = strategy.split("_")
    if param.aug_mode == "M":
        for p in parts:
            for f in AUGMENT_FNS[p]:
                key, sub = jax.random.split(key)
                x = f(x, sub, param, siamese)
        return x
    if param.aug_mode == "S":
        key, kp = jax.random.split(key)
        # host-side choice (matches the reference's torch.randint on host)
        choice = int(jax.random.randint(kp, (), 0, len(parts)))
        for f in AUGMENT_FNS[parts[choice]]:
            key, sub = jax.random.split(key)
            x = f(x, sub, param, siamese)
        return x
    raise ValueError(f"unknown augmentation mode: {param.aug_mode}")


# ---------------------------------------------------------------------------
# CPU augment (utils.py:1574-1633) — host-side numpy, non-differentiable
# ---------------------------------------------------------------------------

def augment(images: np.ndarray, dc_aug_param: Optional[dict], rng=None) -> np.ndarray:
    """Per-sample random crop/scale/rotate/noise (utils.py:1574-1633).
    images: [B, H, W, C] numpy; returns a new array."""
    if dc_aug_param is None or dc_aug_param.get("strategy", "none") == "none":
        return images
    from scipy.ndimage import rotate as scipyrotate
    from scipy.ndimage import zoom

    rng = rng or np.random.default_rng()
    images = images.copy()
    B, H, W, C = images.shape
    crop, scale = dc_aug_param["crop"], dc_aug_param["scale"]
    rot, noise = dc_aug_param["rotate"], dc_aug_param["noise"]
    mean = images.mean(axis=(0, 1, 2))
    augs = dc_aug_param["strategy"].split("_")

    for i in range(B):
        choice = rng.permutation(augs)[0]
        if choice == "crop":
            im_ = np.broadcast_to(mean, (H + crop * 2, W + crop * 2, C)).copy()
            im_[crop : crop + H, crop : crop + W] = images[i]
            r, c = rng.integers(0, crop * 2 + 1, 2)
            images[i] = im_[r : r + H, c : c + W]
        elif choice == "scale":
            h = int(rng.uniform(1 - scale, 1 + scale) * H)
            w = int(rng.uniform(1 - scale, 1 + scale) * H)
            tmp = zoom(images[i], (h / H, w / W, 1), order=1)
            mhw = max(h, w, H, W)
            im_ = np.zeros((mhw, mhw, C), np.float32)
            r, c = (mhw - h) // 2, (mhw - w) // 2
            im_[r : r + h, c : c + w] = tmp
            r, c = (mhw - H) // 2, (mhw - W) // 2
            images[i] = im_[r : r + H, c : c + W]
        elif choice == "rotate":
            im_ = scipyrotate(
                images[i], angle=float(rng.integers(-rot, rot)), axes=(0, 1),
                cval=float(mean.mean()),
            )
            r = (im_.shape[0] - H) // 2
            c = (im_.shape[1] - W) // 2
            images[i] = im_[r : r + H, c : c + W]
        elif choice == "noise":
            images[i] = images[i] + noise * rng.normal(size=(H, W, C)).astype(np.float32)
    return images


def get_daparam(dataset: str, model: str, model_eval: str, ipc: int) -> dict:
    """(utils.py:1641-1657)."""
    p = {"crop": 4, "scale": 0.2, "rotate": 45, "noise": 0.001, "strategy": "none"}
    if dataset == "MNIST":
        p["strategy"] = "crop_scale_rotate"
    if model_eval in ("ConvNetBN",):
        p["strategy"] = "crop_noise"
    return p


def get_eval_pool(eval_mode: str, model: str, model_eval: str) -> List[str]:
    """Architecture pools for condensation evaluation (utils.py:1660-1680)."""
    pools = {
        "M": ["MLP", "ConvNet", "LeNet", "AlexNet", "VGG11", "ResNet18"],
        "B": ["ConvNetBN", "ConvNetASwishBN", "AlexNetBN", "VGG11BN", "ResNet18BN"],
        "W": ["ConvNetW32", "ConvNetW64", "ConvNetW128", "ConvNetW256"],
        "D": ["ConvNetD1", "ConvNetD2", "ConvNetD3", "ConvNetD4"],
        "A": ["ConvNetAS", "ConvNetAR", "ConvNetAL", "ConvNetASwish"],
        "P": ["ConvNetNP", "ConvNetMP", "ConvNetAP"],
        "N": ["ConvNetNN", "ConvNetBN", "ConvNetLN", "ConvNetIN", "ConvNetGN"],
    }
    if eval_mode in pools:
        return pools[eval_mode]
    if eval_mode == "S":
        return [model[: model.index("BN")]] if "BN" in model else [model]
    if eval_mode == "SS":
        return [model]
    return [model_eval]


# ---------------------------------------------------------------------------
# condensation train loops (utils.py:1485-1572)
# ---------------------------------------------------------------------------

def run_epoch(
    mode: str,
    ds: ArrayDataset,
    apply_fn: Callable,
    variables,
    optimizer=None,
    opt_state=None,
    batch_size: int = 64,
    aug_fn: Optional[Callable] = None,
    key: Optional[jax.Array] = None,
):
    """One epoch of train/eval (utils.py:1485-1525 ``epoch``). Returns
    (loss_avg, acc_avg, variables, opt_state)."""
    import optax

    key = key if key is not None else jax.random.key(0)

    def loss_fn(params, batch_vars, x, y):
        v = {**batch_vars, "params": params}
        logits = apply_fn(v, x)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32))
        nll = -jnp.take_along_axis(logp, y[:, None], axis=-1)[:, 0]
        acc = jnp.sum(jnp.argmax(logits, -1) == y)
        return jnp.mean(nll), acc

    grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    eval_fn = jax.jit(loss_fn)

    loss_sum, acc_sum, n_seen = 0.0, 0.0, 0
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}
    for i in range(0, len(ds), batch_size):
        x = ds.images[i : i + batch_size]
        y = ds.labels[i : i + batch_size]
        if aug_fn is not None:
            key, sub = jax.random.split(key)
            x = aug_fn(x, sub)
        x = jnp.asarray(x)
        y = jnp.asarray(y)
        if mode == "train":
            (loss, acc), grads = grad_fn(params, rest, x, y)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
        else:
            loss, acc = eval_fn(params, rest, x, y)
        nb = len(y)
        loss_sum += float(loss) * nb
        acc_sum += float(acc)
        n_seen += nb
    return loss_sum / n_seen, acc_sum / n_seen, {**rest, "params": params}, opt_state


def run_epoch_data_weight(
    ds: SynDataset,
    apply_fn: Callable,
    variables,
    optimizer,
    opt_state,
    data_weights: Optional[np.ndarray] = None,
    batch_size: int = 64,
    aug_fn: Optional[Callable] = None,
    key: Optional[jax.Array] = None,
):
    """Weighted condensation training (utils.py:1527-1572
    ``epoch_data_weight``): per-sample weight = data_weights[label][src]."""
    import optax

    key = key if key is not None else jax.random.key(0)

    def loss_fn(params, batch_vars, x, y, w):
        v = {**batch_vars, "params": params}
        logits = apply_fn(v, x)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32))
        nll = -jnp.take_along_axis(logp, y[:, None], axis=-1)[:, 0]
        loss = jnp.sum(nll * w) / y.shape[0] if data_weights is not None else jnp.mean(nll)
        acc = jnp.sum(jnp.argmax(logits, -1) == y)
        return loss, acc

    grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    loss_sum, acc_sum, n_seen = 0.0, 0.0, 0
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}
    for i in range(0, len(ds), batch_size):
        x = ds.images[i : i + batch_size]
        y = ds.labels[i : i + batch_size]
        src = ds.src[i : i + batch_size]
        if aug_fn is not None:
            key, sub = jax.random.split(key)
            x = aug_fn(x, sub)
        if data_weights is not None:
            w = np.asarray([data_weights[y[j]][src[j]] for j in range(len(y))], np.float32)
        else:
            w = np.ones(len(y), np.float32)
        (loss, acc), grads = grad_fn(params, rest, jnp.asarray(x), jnp.asarray(y), jnp.asarray(w))
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        nb = len(y)
        loss_sum += float(loss) * nb
        acc_sum += float(acc)
        n_seen += nb
    return loss_sum / n_seen, acc_sum / n_seen, {**rest, "params": params}, opt_state
