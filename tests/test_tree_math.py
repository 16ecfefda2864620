"""Tests for the pytree FedAvg/delta algebra — the L3 foundation.

Oracle: a plain-numpy re-implementation of the reference's state-dict loops
(utils.py:689-792, server2.py:121-127)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shapley_vit_tpu.ops import tree_math as tm


def make_tree(rng, scale=1.0):
    return {
        "w": {"kernel": rng.normal(size=(4, 3)).astype(np.float32) * scale,
              "bias": rng.normal(size=(3,)).astype(np.float32) * scale},
        "head": rng.normal(size=(3, 2)).astype(np.float32) * scale,
    }


def test_tree_sub_add_roundtrip(rng):
    a, b = make_tree(rng), make_tree(rng)
    delta = tm.tree_sub(a, b)
    back = tm.tree_add(b, delta)
    assert tm.tree_allclose(a, back, atol=1e-6)


def test_fedavg_ratio_matches_reference_formula():
    # reference server2.py:68-81: ratio = n_i / sum(n)
    ratio = tm.fedavg_ratio([10, 30, 60])
    np.testing.assert_allclose(ratio, [0.1, 0.3, 0.6], atol=1e-7)
    assert ratio.sum() == pytest.approx(1.0)


def test_fedavg_ratio_rejects_zero_total():
    with pytest.raises(ValueError):
        tm.fedavg_ratio([0, 0])


def test_tree_weighted_sum_vs_numpy_oracle(rng):
    trees = [make_tree(rng) for _ in range(3)]
    stacked = tm.tree_stack(trees)
    w = np.array([0.2, 0.3, 0.5], dtype=np.float32)
    got = tm.tree_weighted_sum(stacked, w)
    # numpy oracle: explicit loop like reference add_net_state (utils.py:689-733)
    expect = {
        "w": {
            "kernel": sum(w[i] * trees[i]["w"]["kernel"] for i in range(3)),
            "bias": sum(w[i] * trees[i]["w"]["bias"] for i in range(3)),
        },
        "head": sum(w[i] * trees[i]["head"] for i in range(3)),
    }
    assert tm.tree_allclose(got, expect, atol=1e-5)


def test_apply_deltas_is_lazy_agg(rng):
    # reference model_agg_lazy: global = init + sum(deltas) (server2.py:121-127)
    init = make_tree(rng)
    d1, d2 = make_tree(rng, 0.1), make_tree(rng, 0.1)
    out = tm.apply_deltas(init, d1, d2)
    expect = jax.tree.map(lambda a, b, c: a + b + c, init, d1, d2)
    assert tm.tree_allclose(out, expect, atol=1e-6)


def test_tree_stack_unstack_roundtrip(rng):
    trees = [make_tree(rng) for _ in range(4)]
    stacked = tm.tree_stack(trees)
    assert stacked["head"].shape == (4, 3, 2)
    back = tm.tree_unstack(stacked)
    for orig, rec in zip(trees, back):
        assert tm.tree_allclose(orig, rec)


def test_tree_param_difference(rng):
    a = make_tree(rng)
    assert tm.tree_param_difference(a, a) == 0.0
    b = jax.tree.map(lambda x: x + 0.5, a)
    total = sum(x.size for x in jax.tree.leaves(a))
    np.testing.assert_allclose(tm.tree_param_difference(a, b), 0.5 * total, rtol=1e-5)


def test_server_init_net_from_checkpoint(tmp_path, rng):
    from shapley_vit_tpu.fl.ingestion import atomic_save_npz
    from shapley_vit_tpu.fl.server import EvalServer

    params = make_tree(rng)
    flat = {
        "w.kernel": np.asarray(params["w"]["kernel"]),
        "w.bias": np.asarray(params["w"]["bias"]),
        "head": np.asarray(params["head"]),
    }
    p = str(tmp_path / "global.npz")
    atomic_save_npz(p, flat)
    server = EvalServer(global_params=None, clients=[])
    restored = server.init_net(p)
    assert tm.tree_allclose(restored, params, atol=1e-7)
    # functional re-init path
    server.init_net(init_fn=lambda: {"x": np.zeros(2)})
    assert server.global_params["x"].shape == (2,)
    with pytest.raises(ValueError):
        server.init_net()


def test_coalition_weight_matrix_rows():
    # 3 clients with data sizes 10/30/60; coalition {0,2} -> 10/70, 0, 60/70
    W = tm.coalition_weight_matrix(
        [[], [0], [0, 2], [0, 1, 2]], [10, 30, 60], 3
    )
    np.testing.assert_allclose(W[0], [0, 0, 0])
    np.testing.assert_allclose(W[1], [1, 0, 0], atol=1e-7)
    np.testing.assert_allclose(W[2], [10 / 70, 0, 60 / 70], atol=1e-6)
    np.testing.assert_allclose(W[3], [0.1, 0.3, 0.6], atol=1e-6)
    # non-empty rows are normalized
    np.testing.assert_allclose(W[1:].sum(axis=1), np.ones(3), atol=1e-6)


def test_materialize_coalitions_matches_serial_reference_path(rng):
    """The batched primitive must equal the reference's serial per-coalition
    get_aggregated_model + model_agg_lazy (game2.py:97-106)."""
    n = 3
    init = make_tree(rng)
    deltas = [make_tree(rng, 0.05) for _ in range(n)]
    stacked = tm.tree_stack(deltas)
    sizes = [10, 30, 60]
    coalitions = [[], [0], [1], [2], [0, 1], [0, 2], [1, 2], [0, 1, 2]]
    W = tm.coalition_weight_matrix(coalitions, sizes, n)

    batched = tm.materialize_coalitions(init, stacked, W)

    for c, members in enumerate(coalitions):
        if members:
            ratio = tm.fedavg_ratio([sizes[j] for j in members])
            agg = tm.aggregate_deltas(tm.tree_stack([deltas[j] for j in members]), ratio)
            serial = tm.apply_deltas(init, agg)
        else:
            serial = init  # empty coalition leaves the init model untouched
        got = jax.tree.map(lambda leaf: leaf[c], batched)
        assert tm.tree_allclose(got, serial, atol=1e-5), f"coalition {members}"


def test_materialize_coalitions_jits_and_preserves_dtype(rng):
    init = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), make_tree(rng))
    stacked = tm.tree_stack([jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), make_tree(rng, 0.1)) for _ in range(3)])
    W = tm.coalition_weight_matrix([[0], [0, 1, 2]], [1, 1, 1], 3)
    fn = jax.jit(tm.materialize_coalitions)
    out = fn(init, stacked, W)
    assert out["head"].dtype == jnp.bfloat16
    assert out["head"].shape == (2, 3, 2)
