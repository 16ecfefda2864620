"""Mesh-sharded coalition evaluation.

The single-chip primitive (``fl.evaluation.make_coalition_evaluator``) vmaps
the forward over the coalition axis; this module adds the multi-chip layout:
coalition axis sharded over mesh ``coalition``, batch over mesh ``data``,
base replicated. The jitted step carries explicit ``out_shardings`` so the
per-coalition (correct, loss) accumulators land sharded over ``coalition``
and replicated over ``data`` (XLA inserts the ``psum`` over the batch shards).

This is the TPU-native replacement for the reference's serial coalition loop
plus ``nn.DataParallel`` scatter/gather (SURVEY.md §2.3 rows 1 and 3).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from shapley_vit_tpu.fl.evaluation import eval_step_metrics
from shapley_vit_tpu.parallel.mesh import (
    COALITION_AXIS,
    put_batch,
    put_coalition_stacked,
    put_replicated,
)

PyTree = Any


def make_sharded_coalition_evaluator(
    forward_fn: Callable[[PyTree, PyTree, jax.Array], jax.Array],
    mesh: Mesh,
):
    """Build a mesh-sharded batched evaluator.

    ``forward_fn(shared, varying, images) -> logits`` as in the single-chip
    evaluator. Returns ``evaluate(shared, stacked_varying, batches,
    dataset_size=None) -> np.ndarray [C, 2]``.

    The coalition count C must be a multiple of the mesh's coalition-axis
    size (pad with repeated rows if needed); batch sizes must be multiples of
    the data-axis size.
    """
    coalition_sharding = NamedSharding(mesh, P(COALITION_AXIS))

    vstep = jax.vmap(
        lambda s, p, x, y: eval_step_metrics(forward_fn(s, p, x), y),
        in_axes=(None, 0, None, None),
    )
    jstep = jax.jit(
        vstep,
        out_shardings=(coalition_sharding, coalition_sharding),
    )

    def evaluate(
        shared: PyTree,
        stacked_varying: PyTree,
        batches,
        dataset_size: Optional[int] = None,
    ) -> np.ndarray:
        shared_d = put_replicated(mesh, shared)
        stacked_d = put_coalition_stacked(mesh, stacked_varying)
        C = jax.tree.leaves(stacked_d)[0].shape[0]
        correct = jnp.zeros((C,), jnp.float32)
        loss = jnp.zeros((C,), jnp.float32)
        seen = 0
        for images, labels in batches() if callable(batches) else batches:
            if not isinstance(images, jax.Array) or images.sharding.is_fully_replicated:
                images, labels = put_batch(mesh, images, labels)
            c, l = jstep(shared_d, stacked_d, images, labels)
            correct = correct + c
            loss = loss + l
            seen += labels.shape[0]
        n = dataset_size if dataset_size is not None else seen
        if jax.process_count() > 1:
            # the coalition-sharded accumulators span non-addressable devices
            # in multi-process runs; allgather assembles the global [C] rows
            # on every host (rides the same collective fabric as the psum)
            from jax.experimental import multihost_utils

            correct = multihost_utils.process_allgather(correct, tiled=True)
            loss = multihost_utils.process_allgather(loss, tiled=True)
        acc = np.asarray(jax.device_get(correct)) / n
        mean_loss = np.asarray(jax.device_get(loss)) / n
        if np.isnan(mean_loss).any():
            bad = np.nonzero(np.isnan(mean_loss))[0].tolist()
            raise FloatingPointError(f"NaN validation loss for coalitions {bad}")
        return np.stack([acc, mean_loss], axis=1)

    return evaluate
