"""Adversarial evaluation — the capability behind the reference's
``--epsilon`` / ``--adv-dataset-mode`` / ``--is-defense`` /
``--use-clean-eval`` / ``--use-multi-epsilon`` flags (opts.py:74-81).

The reference consumes pre-generated adversarial datasets from outside the
repo and defends with the Inception ``Denoise`` front-end
(models/inception.py:261-327); the attack generators themselves are not
in-repo. Here both sides are first-class and jitted:

  * FGSM / PGD attack generation against any ``forward_fn(params, x)``;
  * clean vs. adversarial evaluation, optionally through a defense
    transform, with the multi-epsilon sweep.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

PyTree = jax.typing.ArrayLike


def _ce_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))


def fgsm(
    forward_fn: Callable, params, images: jax.Array, labels: jax.Array,
    epsilon: float, clip: Tuple[float, float] = (0.0, 1.0),
) -> jax.Array:
    """Fast Gradient Sign Method: x' = clip(x + ε·sign(∇ₓ CE))."""
    grad = jax.grad(lambda x: _ce_loss(forward_fn(params, x), labels))(images)
    return jnp.clip(images + epsilon * jnp.sign(grad), *clip)


def pgd(
    forward_fn: Callable, params, images: jax.Array, labels: jax.Array,
    epsilon: float, step_size: Optional[float] = None, steps: int = 10,
    clip: Tuple[float, float] = (0.0, 1.0), key: Optional[jax.Array] = None,
) -> jax.Array:
    """Projected Gradient Descent within the ε-ball (random start)."""
    step_size = step_size if step_size is not None else 2.5 * epsilon / steps
    if key is not None:
        x = images + jax.random.uniform(key, images.shape, minval=-epsilon, maxval=epsilon)
    else:
        x = images

    def body(_, x):
        grad = jax.grad(lambda x: _ce_loss(forward_fn(params, x), labels))(x)
        x = x + step_size * jnp.sign(grad)
        x = jnp.clip(x, images - epsilon, images + epsilon)
        return jnp.clip(x, *clip)

    return jax.lax.fori_loop(0, steps, body, x)


def adversarial_evaluation(
    forward_fn: Callable,
    params,
    batches,
    epsilon: float,
    attack: str = "fgsm",
    defense_fn: Optional[Callable] = None,
    use_clean_eval: bool = True,
    pgd_steps: int = 10,
    key: Optional[jax.Array] = None,
) -> Dict[str, float]:
    """Evaluate clean and/or adversarial accuracy+loss, optionally through a
    defense transform (the ``is_defense`` path: x -> defense_fn(x) -> model).

    Returns {'clean_acc','clean_loss','adv_acc','adv_loss'} (clean keys only
    when ``use_clean_eval``).
    """
    from shapley_vit_tpu.fl.evaluation import eval_step_metrics

    defended = (
        forward_fn if defense_fn is None
        else (lambda p, x: forward_fn(p, defense_fn(x)))
    )

    if attack == "fgsm":
        gen = jax.jit(lambda p, x, y: fgsm(defended, p, x, y, epsilon))
    elif attack == "pgd":
        gen = jax.jit(
            lambda p, x, y: pgd(defended, p, x, y, epsilon, steps=pgd_steps, key=key)
        )
    else:
        raise ValueError(f"unknown attack {attack!r}")

    step = jax.jit(lambda p, x, y: eval_step_metrics(defended(p, x), y))
    clean_c = clean_l = adv_c = adv_l = 0.0
    n = 0
    for images, labels in batches:
        images = jnp.asarray(images)
        labels = jnp.asarray(labels)
        if use_clean_eval:
            c, l = step(params, images, labels)
            clean_c += float(c)
            clean_l += float(l)
        if epsilon > 0:
            adv = gen(params, images, labels)
        else:
            adv = images
        c, l = step(params, adv, labels)
        adv_c += float(c)
        adv_l += float(l)
        n += len(labels)
    out = {"adv_acc": adv_c / n, "adv_loss": adv_l / n}
    if use_clean_eval:
        out.update({"clean_acc": clean_c / n, "clean_loss": clean_l / n})
    return out


def multi_epsilon_evaluation(
    forward_fn: Callable, params, batches, epsilons: Sequence[float], **kw
) -> Dict[float, Dict[str, float]]:
    """The ``--use-multi-epsilon`` sweep (opts.py:81). Clean metrics are
    evaluated once (on the first epsilon) — they don't depend on epsilon."""
    clean = kw.pop("use_clean_eval", True)
    results = {}
    for i, eps in enumerate(epsilons):
        results[float(eps)] = adversarial_evaluation(
            forward_fn, params, batches, eps,
            use_clean_eval=clean and i == 0, **kw,
        )
    return results
