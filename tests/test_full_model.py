"""Full-model (non-LoRA) coalition configs + rematerialization.

The reference aggregates ENTIRE state dicts — whole-model deltas, not
adapter overlays (utils.py:735-749) — so the zoo models must run
coalition-vmapped evaluation over stacked full-variable trees, and
full-model fine-tuning needs jax.checkpoint to bound activation memory
(VERDICT round-1 next #7)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from shapley_vit_tpu.fl import evaluation as ev
from shapley_vit_tpu.fl import training as tr
from shapley_vit_tpu.models import vit as jvit
from shapley_vit_tpu.models.zoo import build_network
from shapley_vit_tpu.ops import tree_math as tm


@pytest.mark.slow
def test_resnet18_full_model_coalition_eval(rng):
    """3 clients, whole-variables deltas, chunked coalition eval == the
    serial FedAvg-apply-evaluate loop (the reference's per-coalition path,
    game2.py:89-110, over full state dicts)."""
    net = build_network("ResNet18", channel=3, num_classes=4, im_size=(32, 32))
    x0 = jnp.zeros((2, 32, 32, 3))
    variables = net.init(jax.random.key(0), x0, train=False)

    n = 3
    leaves, treedef = jax.tree.flatten(variables)
    deltas = [
        treedef.unflatten(
            [0.05 * jax.random.normal(k, l.shape, l.dtype)
             if jnp.issubdtype(l.dtype, jnp.floating) else jnp.zeros_like(l)
             for k, l in zip(jax.random.split(jax.random.key(10 + i), len(leaves)), leaves)]
        )
        for i in range(n)
    ]
    stacked = tm.tree_stack(deltas)
    sizes = [100.0, 300.0, 600.0]
    coalitions = [[0], [1], [2], [0, 1], [0, 2], [1, 2], [0, 1, 2]]
    W = tm.coalition_weight_matrix(coalitions, sizes, n)

    images = rng.normal(size=(16, 32, 32, 3)).astype(np.float32)
    labels = rng.integers(0, 4, size=16)
    data = [(images[:8], labels[:8]), (images[8:], labels[8:])]

    fwd = lambda _shared, v, x: net.apply(v, x, train=False)
    evaluator = ev.make_coalition_evaluator(fwd, coalition_chunk=2)
    batched = evaluator({}, tm.materialize_coalitions(variables, stacked, W), data)
    assert batched.shape == (len(coalitions), 2)

    # serial oracle
    single = lambda v, x: net.apply(v, x, train=False)
    for row, members in enumerate(coalitions):
        ratio = tm.fedavg_ratio([sizes[j] for j in members])
        agg = tm.aggregate_deltas(
            tm.tree_stack([deltas[j] for j in members]), ratio
        )
        coal_vars = tm.apply_deltas(variables, agg)
        acc, loss = ev.evaluate_model(single, coal_vars, data)
        np.testing.assert_allclose(batched[row], [acc, loss], atol=1e-5)


def test_vit_remat_forward_and_grads_match(rng):
    spec = jvit.make_spec("micro", num_classes=4)
    rspec = spec.replace(remat=True)
    base = jvit.init_vit(jax.random.key(0), spec)
    lora = jvit.init_lora(jax.random.key(1), spec, classifier_from=base)
    images = rng.normal(size=(4, spec.image, spec.image, 3)).astype(np.float32)
    labels = rng.integers(0, 4, size=4)

    def loss(sp):
        def f(b, l):
            logits = jvit.vit_forward(b, l, images, sp)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, jnp.asarray(labels)
            ).mean()
        return f

    l0, g0 = jax.value_and_grad(loss(spec), argnums=(0, 1))(base, lora)
    l1, g1 = jax.value_and_grad(loss(rspec), argnums=(0, 1))(base, lora)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_train_step_remat_matches(rng):
    """Full-model training: all params trainable (base=() as the frozen
    tree), remat on/off produce identical updates."""
    net = build_network("ConvNetBN", channel=3, num_classes=4, im_size=(16, 16))
    x0 = jnp.zeros((2, 16, 16, 3))
    variables = net.init(jax.random.key(0), x0, train=False)
    images = rng.normal(size=(8, 16, 16, 3)).astype(np.float32)
    labels = rng.integers(0, 4, size=8)
    opt = optax.sgd(0.1)

    def fwd(_base, v, x):
        return net.apply(v, x, train=False)

    outs = []
    for remat in (False, True):
        step = tr.make_train_step(fwd, opt, num_classes=4, remat=remat)
        new_v, _, loss = step(
            (), variables, opt.init(variables), images, labels, jax.random.key(2)
        )
        outs.append((float(loss), new_v))
    np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=1e-6)
    for a, b in zip(jax.tree.leaves(outs[0][1]), jax.tree.leaves(outs[1][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
