"""Tests: adversarial eval (FGSM/PGD, defense hook, multi-epsilon), DP
training step, and the multi-round FL + Shapley orchestration driver."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from shapley_vit_tpu.fl import adversarial as adv
from shapley_vit_tpu.fl import training as tr
from shapley_vit_tpu.models import vit as jvit
from shapley_vit_tpu.ops import tree_math as tm
from shapley_vit_tpu.data.arrays import ArrayDataset
from shapley_vit_tpu.fl import evaluation as ev
from shapley_vit_tpu.driver.rounds import run_federated_rounds


def linear_forward(params, x):
    return x.reshape(x.shape[0], -1) @ params["w"] + params["b"]


@pytest.fixture
def trained_linear(rng):
    # well-separated 2-class problem, trained weights
    n = 200
    X = rng.normal(size=(n, 2, 2, 1)).astype(np.float32) * 0.1
    y = rng.integers(0, 2, n).astype(np.int32)
    X[:, 0, 0, 0] += y  # feature 0 carries the label
    w = np.zeros((4, 2), np.float32)
    w[0, 1], w[0, 0] = 4.0, -4.0
    params = {"w": jnp.asarray(w), "b": jnp.zeros(2) + jnp.asarray([2.0, -2.0])}
    return params, X, y


def test_fgsm_reduces_accuracy(trained_linear):
    params, X, y = trained_linear
    batches = [(X, y)]
    res = adv.adversarial_evaluation(linear_forward, params, batches, epsilon=0.5)
    assert res["clean_acc"] > 0.8
    assert res["adv_acc"] < res["clean_acc"]
    assert res["adv_loss"] > res["clean_loss"]


def test_pgd_at_least_as_strong_as_fgsm(trained_linear):
    params, X, y = trained_linear
    batches = [(X, y)]
    f = adv.adversarial_evaluation(linear_forward, params, batches, 0.3, attack="fgsm")
    p = adv.adversarial_evaluation(
        linear_forward, params, batches, 0.3, attack="pgd", pgd_steps=10
    )
    assert p["adv_acc"] <= f["adv_acc"] + 0.05
    with pytest.raises(ValueError):
        adv.adversarial_evaluation(linear_forward, params, batches, 0.1, attack="deepfool")


def test_defense_hook_applies(trained_linear):
    params, X, y = trained_linear
    batches = [(X, y)]
    # a "perfect" defense that projects inputs back to the clean manifold
    # (here: identity — just verify the hook wires through)
    res = adv.adversarial_evaluation(
        linear_forward, params, batches, 0.2, defense_fn=lambda x: x * 1.0
    )
    assert "adv_acc" in res


def test_multi_epsilon_sweep(trained_linear):
    params, X, y = trained_linear
    res = adv.multi_epsilon_evaluation(
        linear_forward, params, [(X, y)], epsilons=[0.1, 0.5]
    )
    assert set(res) == {0.1, 0.5}
    # stronger epsilon -> weaker accuracy (monotone for linear models)
    assert res[0.5]["adv_acc"] <= res[0.1]["adv_acc"] + 1e-9


def test_dp_train_step_runs_and_adds_noise(rng):
    spec = jvit.make_spec("micro")
    base = jvit.init_vit(jax.random.key(0), spec)
    lora = jvit.init_lora(jax.random.key(1), spec, classifier_from=base)
    fwd = lambda b, l, x: jvit.vit_forward(b, l, x, spec)
    step, opt = tr.make_dp_train_step(
        fwd, learning_rate=1e-2, l2_norm_clip=1.0, noise_multiplier=1.0,
        seed=0, num_classes=4,
    )
    images = rng.normal(size=(8, 16, 16, 3)).astype(np.float32)
    labels = rng.integers(0, 4, 8)
    opt_state = opt.init(lora)
    new_lora, opt_state, loss = step(base, lora, opt_state, images, labels)
    assert np.isfinite(float(loss))
    moved = tm.tree_sub(new_lora, lora)
    assert sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(moved)) > 0


def test_multi_round_driver_end_to_end(rng):
    """3 clients × 3 rounds of real LoRA training on micro-ViT, partial
    participation, MILP budget of 2 Shapley rounds, exact estimator."""
    spec = jvit.make_spec("micro")
    base = jvit.init_vit(jax.random.key(0), spec)
    lora0 = jvit.init_lora(jax.random.key(1), spec, classifier_from=base)

    n = 3
    clients_data = []
    for cid in range(n):
        X = rng.normal(size=(16, 16, 16, 3)).astype(np.float32)
        y = rng.integers(0, 4, 16)
        clients_data.append((X, y))
    val_X = rng.normal(size=(24, 16, 16, 3)).astype(np.float32)
    val_y = rng.integers(0, 4, 24)
    val_batches = [(val_X, val_y)]

    opt = optax.sgd(5e-2)
    step = tr.make_train_step(
        lambda b, l, x: jvit.vit_forward(b, l, x, spec), opt, spec.num_classes
    )

    def train_client_fn(cid, overlay, data, rnd):
        lora, opt_state = overlay, opt.init(overlay)
        key = jax.random.key(rnd * 10 + cid)
        for _ in range(2):
            lora, opt_state, _ = step(base, lora, opt_state, data[0], data[1], key)
        return lora

    single = lambda p, x: jvit.vit_forward(p[0], p[1], x, spec)

    def evaluate_fn(overlay):
        return ev.evaluate_model(single, (base, overlay), val_batches)

    evaluator = ev.make_coalition_evaluator(
        lambda b, l, x: jvit.vit_forward(b, l, x, spec)
    )

    def eval_factory(start_overlay, stacked):
        def eval_fn(W):
            return evaluator(base, tm.materialize_coalitions(start_overlay, stacked, W), val_batches)
        return eval_fn

    participation = np.array([[1, 1, 1], [1, 0, 1], [1, 1, 1]], dtype=bool)
    records = run_federated_rounds(
        num_rounds=3,
        clients_data=clients_data,
        init_overlay=lora0,
        train_client_fn=train_client_fn,
        evaluate_fn=evaluate_fn,
        eval_coalitions_fn_factory=eval_factory,
        num_local_data=[16, 16, 16],
        participation=participation,
        estimator="exact",
        shapley_budget=2,
    )
    assert len(records) == 3
    valued = [r for r in records if r.shapley is not None]
    assert 1 <= len(valued) <= 2  # MILP budget respected
    for rec in valued:
        assert len(rec.shapley) == 2
        # efficiency: sum of SV over selected clients == grand-coalition delta
        # vs previous round (guaranteed by exact estimator on deltas)
        assert set(rec.shapley[0]) == {0, 1, 2}
    # round 1's non-participant keeps zero SV if that round was valued
    r1 = records[1]
    if r1.shapley is not None:
        assert r1.shapley[0][1] == 0.0


def test_multi_round_driver_gtg_estimator(rng):
    """Same pipeline with the GTG truncated-MC estimator on a tabular game
    stand-in (fast)."""
    lora0 = {"w": jnp.zeros((2, 2))}

    def train_client_fn(cid, overlay, data, rnd):
        return jax.tree.map(lambda x: x + 0.1 * (cid + 1), overlay)

    def evaluate_fn(overlay):
        s = float(jax.tree.leaves(overlay)[0].sum())
        return [min(1.0, 0.1 + 0.05 * s), max(0.0, 2.0 - 0.1 * s)]

    def eval_factory(start_overlay, stacked):
        def eval_fn(W):
            out = []
            for row in W:
                mixed = tm.apply_deltas(
                    start_overlay, tm.tree_weighted_sum(stacked, jnp.asarray(row))
                )
                out.append(evaluate_fn(mixed))
            return np.asarray(out)
        return eval_fn

    records = run_federated_rounds(
        num_rounds=2,
        clients_data=[None] * 3,
        init_overlay=lora0,
        train_client_fn=train_client_fn,
        evaluate_fn=evaluate_fn,
        eval_coalitions_fn_factory=eval_factory,
        num_local_data=[1, 1, 1],
        estimator="gtg",
    )
    assert all(r.shapley is not None for r in records)
    assert len(records[0].shapley) == 2
