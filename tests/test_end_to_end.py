"""Minimum end-to-end slice (SURVEY.md §7 build step 4): micro-ViT, 3 clients
with synthetic LoRA deltas, exact Shapley over all coalitions — the batched
TPU path verified against a pure serial oracle that mimics the reference's
per-coalition loop (game2.py:74-122 + utils_shapley.py:185-203)."""

from itertools import chain, combinations
from math import factorial

import jax
import numpy as np
import pytest

from shapley_vit_tpu.fl import evaluation as ev
from shapley_vit_tpu.models import vit as jvit
from shapley_vit_tpu.ops import tree_math as tm
from shapley_vit_tpu.shapley import Game, shapley_exact, call_shapley_computation_method


@pytest.fixture(scope="module")
def pipeline():
    spec = jvit.make_spec("micro")
    rng = np.random.default_rng(7)
    base = jvit.init_vit(jax.random.key(0), spec)
    lora0 = jvit.init_lora(jax.random.key(1), spec, classifier_from=base)

    n_clients, sizes = 3, [120, 300, 580]
    key = jax.random.key(42)
    deltas = []
    for i in range(n_clients):
        leaves, treedef = jax.tree.flatten(lora0)
        ks = jax.random.split(jax.random.fold_in(key, i), len(leaves))
        deltas.append(
            treedef.unflatten(
                [0.1 * jax.random.normal(k, l.shape) for k, l in zip(ks, leaves)]
            )
        )
    stacked = tm.tree_stack(deltas)

    images = rng.normal(size=(24, 16, 16, 3)).astype(np.float32)
    labels = rng.integers(0, 4, size=24)
    data = [(images[:12], labels[:12]), (images[12:], labels[12:])]

    fwd = lambda b, lora, x: jvit.vit_forward(b, lora, x, spec)
    evaluator = ev.make_coalition_evaluator(fwd)

    def eval_coalitions_fn(W):
        stacked_lora = tm.materialize_coalitions(lora0, stacked, W)
        return evaluator(base, stacked_lora, data)

    single = lambda p, x: jvit.vit_forward(p[0], p[1], x, spec)
    prev_utility = ev.evaluate_model(single, (base, lora0), data)
    return dict(
        spec=spec, base=base, lora0=lora0, deltas=deltas, sizes=sizes,
        data=data, single=single, eval_fn=eval_coalitions_fn, prev=list(prev_utility),
    )


def serial_oracle_sv(p):
    """Pure serial reference-path oracle: per-coalition FedAvg + eval loop,
    factorial-form exact Shapley in numpy."""
    n = 3
    utilities = {}
    subsets = list(
        chain.from_iterable(combinations(range(n), r) for r in range(1, n + 1))
    )
    for S in subsets:
        ratio = tm.fedavg_ratio([p["sizes"][j] for j in S])
        agg = tm.aggregate_deltas(tm.tree_stack([p["deltas"][j] for j in S]), ratio)
        lora_S = tm.apply_deltas(p["lora0"], agg)
        acc, loss = ev.evaluate_model(p["single"], (p["base"], lora_S), p["data"])
        utilities[frozenset(S)] = [acc - p["prev"][0], loss - p["prev"][1]]
    utilities[frozenset()] = [0.0, 0.0]

    coef = {s: factorial(s) * factorial(n - s - 1) / factorial(n) for s in range(n)}
    sv = np.zeros((2, n))
    for S in subsets:
        u = utilities[frozenset(S)]
        for i in range(2):
            for j in S:
                sv[i][j] += coef[len(S) - 1] * u[i]
            for j in set(range(n)) - set(S):
                sv[i][j] -= coef[len(S)] * u[i]
    return sv, utilities


def test_exact_shapley_batched_matches_serial_oracle(pipeline):
    p = pipeline
    game = Game(
        eval_coalitions_fn=p["eval_fn"],
        num_local_data=p["sizes"],
        client_selection_vector=[True] * 3,
        previous_utility=p["prev"],
    )
    sv = shapley_exact(game)
    got = np.array([[sv[i][j] for j in range(3)] for i in range(2)])
    oracle, utilities = serial_oracle_sv(p)
    # north-star parity bar: 1e-4 (BASELINE.json)
    np.testing.assert_allclose(got, oracle, atol=1e-4)
    # exactly 7 distinct coalition evals, all in one batch
    assert game.num_evaluations == 7
    # efficiency axiom vs the grand-coalition utility
    np.testing.assert_allclose(
        got.sum(axis=1), utilities[frozenset(range(3))], atol=1e-5
    )


def test_live_path_comp_contrib_runs(pipeline, capsys):
    p = pipeline
    game = Game(
        eval_coalitions_fn=p["eval_fn"],
        num_local_data=p["sizes"],
        client_selection_vector=[True] * 3,
        previous_utility=p["prev"],
    )
    sv = call_shapley_computation_method({}, game, None, rng=np.random.default_rng(0))
    assert len(sv) == 2 and set(sv[0]) == {0, 1, 2}
    # n=3: at most 7 distinct coalitions regardless of m=150 samples
    assert game.num_evaluations <= 7
    assert "Comp contrib" in capsys.readouterr().out


def test_round0_seed_shapley_semantics(pipeline):
    """Round-0 seeding: SV_i = prev_utility/num_clients per client
    (reference start.py:104-106)."""
    p = pipeline
    seed_sv = [
        {i: p["prev"][d] / 3 for i in range(3)} for d in range(2)
    ]
    for d in range(2):
        np.testing.assert_allclose(
            sum(seed_sv[d].values()), p["prev"][d], atol=1e-9
        )
