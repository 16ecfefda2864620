"""Local client training — the v1 FL capability.

Reference: ``ClientBase.local_training`` (client.py:44-76) — per-epoch SGD
over the client's shard with an optional label-flipping poisoning attack
(client.py:53-59, probability ``label_flip_prob``), per-epoch loss logging;
plus the centralized-SGD baseline loop (cent_sgd.py:121-129).

TPU-first: the train step is a pure jitted function over (lora, opt_state);
only the LoRA overlay + classifier train (the reference freezes the base via
peft the same way). The label-flip attack is a pure function of a PRNG key —
a data-poisoning *fixture* (SURVEY.md §5 fault injection), applied inside the
step so it vmaps/shards like everything else.

Multi-client parallelism: ``make_multi_client_train_step`` vmaps the update
over a stacked client axis — all clients take their local step in one fused
device program, the analogue of coalition-vmapped evaluation for training.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

PyTree = Any


def label_flip(
    key: jax.Array, labels: jax.Array, num_classes: int, flip_prob: float
) -> jax.Array:
    """Label-flipping attack fixture (reference client.py:53-59: with prob p,
    replace the label with a uniformly random class)."""
    if flip_prob <= 0.0:
        return labels
    kf, kl = jax.random.split(key)
    flip = jax.random.bernoulli(kf, flip_prob, labels.shape)
    rand_labels = jax.random.randint(kl, labels.shape, 0, num_classes)
    return jnp.where(flip, rand_labels, labels)


def make_train_step(
    forward_fn: Callable[[PyTree, PyTree, jax.Array], jax.Array],
    optimizer: optax.GradientTransformation,
    num_classes: int,
    label_flip_prob: float = 0.0,
    remat: bool = False,
):
    """Build the jitted LoRA train step.

    ``forward_fn(base, lora, images) -> logits``. Returns
    ``step(base, lora, opt_state, images, labels, key) ->
    (lora, opt_state, loss)`` with mean-CE loss (reference client.py:64-69
    forward→CE→backward→step). Base params are a jit argument (frozen).

    ``remat=True`` wraps the forward in ``jax.checkpoint`` so the backward
    pass recomputes activations instead of storing them — for full-model
    (non-LoRA) fine-tuning of the zoo/base models whose saved intermediates
    would not fit HBM (for the ViT path, prefer ``ViTSpec.remat`` which
    checkpoints per scanned block at finer granularity).
    """
    fwd = jax.checkpoint(forward_fn) if remat else forward_fn

    def loss_fn(lora, base, images, labels):
        logits = fwd(base, lora, images)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        return jnp.mean(nll)

    @jax.jit
    def step(base, lora, opt_state, images, labels, key):
        labels = label_flip(key, labels, num_classes, label_flip_prob)
        loss, grads = jax.value_and_grad(loss_fn)(lora, base, images, labels)
        updates, opt_state = optimizer.update(grads, opt_state, lora)
        lora = optax.apply_updates(lora, updates)
        return lora, opt_state, loss

    return step


def make_dp_train_step(
    forward_fn: Callable[[PyTree, PyTree, jax.Array], jax.Array],
    learning_rate: float,
    l2_norm_clip: float,
    noise_multiplier: float,
    seed: int,
    num_classes: int,
    momentum: float = 0.0,
):
    """Differentially-private LoRA train step (the capability behind the
    reference's ``--noise-multiplier`` flag, opts.py:87 — a flag with no
    in-repo consumer; here it drives real DP-SGD).

    Per-example gradients (vmapped), per-example L2 clipping to
    ``l2_norm_clip``, Gaussian noise ``noise_multiplier·clip`` on the sum —
    optax.contrib.dpsgd. Returns ``step(base, lora, opt_state, images,
    labels) -> (lora, opt_state, loss)``.
    """
    import optax

    # dpsgd() still takes the deprecated seed arg; compose the aggregate
    # (which accepts a PRNG key) with sgd directly
    optimizer = optax.chain(
        optax.contrib.differentially_private_aggregate(
            l2_norm_clip=l2_norm_clip,
            noise_multiplier=noise_multiplier,
            key=jax.random.key(seed),
        ),
        optax.sgd(learning_rate, momentum=momentum if momentum else None),
    )

    def example_loss(lora, base, image, label):
        logits = forward_fn(base, lora, image[None])
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return -logp[0, label]

    @jax.jit
    def step(base, lora, opt_state, images, labels):
        # per-example grads: leading batch dim, as dpsgd expects
        per_ex = jax.vmap(
            jax.value_and_grad(example_loss), in_axes=(None, None, 0, 0)
        )
        losses, grads = per_ex(lora, base, images, labels)
        updates, opt_state = optimizer.update(grads, opt_state, lora)
        lora = optax.apply_updates(lora, updates)
        return lora, opt_state, jnp.mean(losses)

    return step, optimizer


def refresh_dp_noise_key(opt_state, key):
    """Replace the DP aggregate's PRNG key leaf with ``key``.

    ``optimizer.init`` restores the noise key to the seed it was built
    with, so a caller that re-inits optimizer state (e.g. adopting a new
    global each FL round) would REPLAY the identical Gaussian noise stream
    — an observer differencing two rounds' checkpoints with equal step
    counts cancels the noise and voids the DP guarantee. Call this after
    every re-init with a freshly split key. Detection is by dtype: the
    optax state stores a typed key array (``key<fry>``), the only such
    leaf in the chain."""
    import jax.dtypes

    def repl(leaf):
        if hasattr(leaf, "dtype") and jax.dtypes.issubdtype(
            leaf.dtype, jax.dtypes.prng_key
        ):
            return key
        return leaf

    return jax.tree.map(repl, opt_state)


def make_multi_client_train_step(
    forward_fn: Callable[[PyTree, PyTree, jax.Array], jax.Array],
    optimizer: optax.GradientTransformation,
    num_classes: int,
    label_flip_prob: float = 0.0,
    remat: bool = False,
):
    """All-clients-in-one-program local step: vmap the single-client update
    over a stacked client axis (lora/opt_state/batch all carry a leading
    [n_clients] dim). This is what ``dryrun_multichip`` shards over the mesh
    coalition axis × data axis."""
    single = make_train_step(
        forward_fn, optimizer, num_classes, label_flip_prob, remat=remat
    )

    # vmap over (lora, opt_state, images, labels, key); base shared
    vstep = jax.vmap(
        lambda base, lora, opt, x, y, k: single(base, lora, opt, x, y, k),
        in_axes=(None, 0, 0, 0, 0, 0),
    )
    return jax.jit(vstep)


def local_training(
    step,
    base: PyTree,
    lora: PyTree,
    opt_state,
    epochs: int,
    batches_fn: Callable[[], Any],
    key: jax.Array,
    log_fn: Optional[Callable[[int, float], None]] = None,
) -> Tuple[PyTree, Any]:
    """Epoch loop (client.py:44-76): run ``epochs`` passes over the client's
    batches, logging per-epoch mean loss."""
    for epoch in range(epochs):
        total, count = 0.0, 0
        for images, labels in batches_fn():
            key, sub = jax.random.split(key)
            lora, opt_state, loss = step(base, lora, opt_state, images, labels, sub)
            total += float(loss)
            count += 1
        if log_fn is not None:
            log_fn(epoch, total / max(count, 1))
    return lora, opt_state
