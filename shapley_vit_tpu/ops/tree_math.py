"""Pure-functional pytree algebra for federated aggregation.

This is the TPU-native replacement for the reference's torch state-dict
mutation utilities (reference ``federated_learning/utils.py``):

  * ``get_difference_between_network_weights`` (utils.py:735-749)  -> :func:`tree_sub`
  * ``get_aggregated_model(delta_dicts, ratio)`` (utils.py:781-792) -> :func:`aggregate_deltas`
  * ``add_net_state`` FedAvg family (utils.py:689-733)              -> :func:`tree_weighted_sum`
  * ``ServerBase.model_agg_lazy`` init + Σ deltas (server2.py:121-127)
                                                                    -> :func:`apply_deltas`

Idiomatic inversion (SURVEY.md §7): instead of looping Python dicts and calling
``load_state_dict``, client deltas live as a *stacked* pytree with a leading
client axis ``[n_clients, ...]``; any FedAvg combination is then one einsum per
leaf, and materializing all coalition models at once is a single
``[C, n] @ [n, ...]`` contraction per leaf (:func:`materialize_coalitions`) that
XLA maps straight onto the MXU. All functions are pure and jit/vmap-safe.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

PyTree = Any


# ---------------------------------------------------------------------------
# Elementwise pytree arithmetic
# ---------------------------------------------------------------------------

def tree_add(a: PyTree, b: PyTree) -> PyTree:
    """Leafwise a + b."""
    return jax.tree.map(jnp.add, a, b)


def tree_sub(a: PyTree, b: PyTree) -> PyTree:
    """Leafwise a - b: client delta vs. the initial global model
    (reference utils.py:735-749, which iterates the full state dict — here all
    leaves of the param pytree, so non-trainable state participates the same way)."""
    return jax.tree.map(jnp.subtract, a, b)


def tree_scale(a: PyTree, s) -> PyTree:
    """Leafwise s * a."""
    return jax.tree.map(lambda x: x * s, a)


def tree_zeros_like(a: PyTree) -> PyTree:
    return jax.tree.map(jnp.zeros_like, a)


def tree_param_difference(a: PyTree, b: PyTree) -> float:
    """Total absolute parameter difference Σ|a−b| (reference
    ``net_param_difference``/``net_param_difference_dic``, utils.py:846-858 —
    the manual-debugging companion to ``compare_model_param``)."""
    return float(
        sum(
            np.abs(np.asarray(x) - np.asarray(y)).sum()
            for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
        )
    )


def tree_allclose(a: PyTree, b: PyTree, atol: float = 1e-6, rtol: float = 1e-5) -> bool:
    """Equality probe (reference ``compare_model_param``, utils.py:825-844).

    Structure counts: two trees with the same leaf SEQUENCE but different
    shapes ({'a': x, 'b': y} vs [x, y], or renamed keys) are different
    checkpoints and must not compare equal."""
    if jax.tree.structure(a) != jax.tree.structure(b):
        return False
    return all(
        np.allclose(np.asarray(x), np.asarray(y), atol=atol, rtol=rtol)
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )


# ---------------------------------------------------------------------------
# Stacking: the client axis
# ---------------------------------------------------------------------------

def tree_stack(trees: Sequence[PyTree]) -> PyTree:
    """Stack n structurally-identical pytrees into one pytree whose leaves have
    a new leading axis of size n. This is how per-client deltas become a
    device-resident ``[n_clients, ...]`` array family."""
    return jax.tree.map(lambda *leaves: jnp.stack(leaves, axis=0), *trees)


def tree_stack_host(trees: Sequence[PyTree]) -> PyTree:
    """:func:`tree_stack` computed entirely on the host (numpy).

    The serving ingest path loads client checkpoints as numpy trees and
    computes their deltas on the host; stacking them with numpy and then
    doing ONE batched ``jax.device_put`` of the ``[n_clients, ...]`` tree
    replaces n_clients × n_leaves small host→device transfers with
    n_leaves large ones — through the TPU tunnel, transfers and dispatches
    dominate (BENCH_NOTES round 2), so the batched upload is the whole win.
    Device-array leaves are accepted (``np.asarray`` pulls them back), but
    the intended inputs are host trees."""
    return jax.tree.map(
        lambda *leaves: np.stack([np.asarray(l) for l in leaves], axis=0), *trees
    )


def tree_unstack(tree: PyTree) -> list:
    """Inverse of :func:`tree_stack` (host-side convenience)."""
    leaves, treedef = jax.tree.flatten(tree)
    n = leaves[0].shape[0]
    return [treedef.unflatten([leaf[i] for leaf in leaves]) for i in range(n)]


# ---------------------------------------------------------------------------
# FedAvg
# ---------------------------------------------------------------------------

def fedavg_ratio(num_local_data: Sequence[float]) -> np.ndarray:
    """FedAvg weights n_i / Σ n_j (reference server2.py:68-81 ``get_agg_ratio``
    and game2.py:129-139)."""
    n = np.asarray(num_local_data, dtype=np.float64)
    if n.sum() <= 0:
        raise ValueError("total client data size must be positive")
    return (n / n.sum()).astype(np.float32)


def tree_weighted_sum(stacked: PyTree, weights: jax.Array) -> PyTree:
    """Σ_i weights[i] · stacked[i] per leaf — one contraction on the client
    axis. Equivalent to the reference's ``add_net_state*`` loops
    (utils.py:689-733) and ``get_aggregated_model`` (utils.py:781-792)."""
    w = jnp.asarray(weights)

    def combine(leaf):
        wl = w.astype(jnp.promote_types(leaf.dtype, w.dtype))
        # precision='highest': aggregation is negligible FLOPs next to the
        # forward pass, but SV parity (≤1e-4 vs CPU reference) requires the
        # weight mixing itself to be f32-exact, not bf16 MXU default.
        return jnp.tensordot(
            wl, leaf.astype(wl.dtype), axes=(0, 0), precision="highest"
        ).astype(leaf.dtype)

    return jax.tree.map(combine, stacked)


def aggregate_deltas(stacked_deltas: PyTree, ratio: jax.Array) -> PyTree:
    """FedAvg-combine client deltas with data-size ratios
    (reference ``get_aggregated_model``, utils.py:781-792)."""
    return tree_weighted_sum(stacked_deltas, ratio)


def apply_deltas(init_params: PyTree, *aggregated_deltas: PyTree) -> PyTree:
    """global = init + Σ aggregated-deltas
    (reference ``ServerBase.model_agg_lazy``, server2.py:121-127 — but pure:
    returns new params instead of mutating a module)."""
    out = init_params
    for d in aggregated_deltas:
        out = tree_add(out, d)
    return out


# ---------------------------------------------------------------------------
# Coalition materialization — the batched primitive
# ---------------------------------------------------------------------------

def coalition_weight_matrix(
    coalitions: Sequence[Sequence[int]],
    num_local_data: Sequence[float],
    n_clients: int,
) -> np.ndarray:
    """Build W[C, n]: row c holds FedAvg ratios of coalition c's members
    (zero for non-members, n_i/Σ_{j∈S} n_j for members — matching
    game2.py:89-100's per-coalition ``get_agg_ratio`` over participating
    clients). An empty coalition yields an all-zero row (init model unchanged,
    matching game2.py:80-81's null utility path)."""
    n = np.asarray(num_local_data, dtype=np.float64)
    if len(n) != n_clients:
        raise ValueError("num_local_data must have one entry per client")
    W = np.zeros((len(coalitions), n_clients), dtype=np.float32)
    for c, members in enumerate(coalitions):
        members = list(members)
        if not members:
            continue
        total = n[members].sum()
        if total <= 0:
            raise ValueError(f"coalition {members} has zero total data")
        for j in members:
            W[c, j] = n[j] / total
    return W


def materialize_coalitions(
    init_params: PyTree, stacked_deltas: PyTree, weight_matrix: jax.Array
) -> PyTree:
    """Materialize all coalition models at once.

    For each leaf: ``out[c] = init + Σ_j W[c, j] · delta[j]`` — i.e. one
    ``[C, n] × [n, ...]`` tensordot per leaf, the fused equivalent of the
    reference's per-coalition ``get_aggregated_model`` + ``model_agg_lazy``
    sequence (game2.py:97-106). Returns a pytree whose leaves have a leading
    coalition axis ``[C, ...]`` ready to be vmapped over.

    Memory note (SURVEY.md §7 "hard parts"): call this only on the
    delta-bearing subtree (LoRA + classifier for the live config) with base
    weights applied once outside; for full-delta model zoos chunk the C axis.
    """
    W = jnp.asarray(weight_matrix)

    def combine(init_leaf, delta_leaf):
        Wl = W.astype(jnp.promote_types(delta_leaf.dtype, W.dtype))
        mixed = jnp.tensordot(
            Wl, delta_leaf.astype(Wl.dtype), axes=(1, 0), precision="highest"
        )
        return (init_leaf[None].astype(Wl.dtype) + mixed).astype(init_leaf.dtype)

    return jax.tree.map(combine, init_params, stacked_deltas)
