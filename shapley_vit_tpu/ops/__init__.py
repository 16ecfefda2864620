"""Compute-path ops: pure pytree algebra for FL aggregation plus Pallas TPU
kernels for the ViT hot path (patch-embed, fused attention, MLP)."""

from shapley_vit_tpu.ops.tree_math import (  # noqa: F401
    tree_add,
    tree_sub,
    tree_scale,
    tree_stack,
    tree_unstack,
    tree_weighted_sum,
    tree_zeros_like,
    fedavg_ratio,
    aggregate_deltas,
    apply_deltas,
    coalition_weight_matrix,
    materialize_coalitions,
    tree_allclose,
)
