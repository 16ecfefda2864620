"""Mesh-sharded coalition evaluation.

The single-chip primitive (``fl.evaluation.make_coalition_evaluator``) vmaps
the forward over the coalition axis; this module adds the multi-chip layout:
coalition axis sharded over mesh ``coalition``, batch over mesh ``data``,
base replicated. The jitted step carries explicit ``out_shardings`` so the
per-coalition (correct, loss) accumulators land sharded over ``coalition``
and replicated over ``data`` (XLA inserts the ``psum`` over the batch shards).

This is the TPU-native replacement for the reference's serial coalition loop
plus ``nn.DataParallel`` scatter/gather (SURVEY.md §2.3 rows 1 and 3). The
reference's DataParallel is ALWAYS ON in its driver (start.py:283,
utils.py:1394-1398); :func:`make_eval_backend` is the equivalent always-on
gate for ours — production drivers go through it and shard automatically
whenever more than one device is visible.

Shape handling is self-contained (round-2 VERDICT weak #3): the evaluator
pads the coalition axis up to a multiple of the mesh's coalition-axis size
(repeating row 0, dropping padded outputs — same scheme as the single-chip
``run_chunk``) and pads remainder validation batches up to a multiple of the
data-axis size with zero-WEIGHTED rows, so callers never hand-align shapes.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from shapley_vit_tpu.fl.evaluation import (
    _bucket_target,
    eval_step_metrics,
)
from shapley_vit_tpu.parallel.mesh import (
    COALITION_AXIS,
    DATA_AXIS,
    make_mesh,
    put_coalition_stacked,
    put_replicated,
    shard_batch,
)

PyTree = Any


def masked_eval_step_metrics(
    logits: jax.Array, labels: jax.Array, weights: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """``eval_step_metrics`` with a per-example weight (1.0 real, 0.0 pad).

    With all-ones weights this is bit-identical to the unmasked step
    (IEEE: ``1.0 * x == x``), so padded and unpadded batches share one
    compiled program per batch shape and identical numerics."""
    logits = logits.astype(jnp.float32)
    correct = jnp.sum(weights * (jnp.argmax(logits, axis=-1) == labels))
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return correct, jnp.sum(weights * nll)


def _prep_batch(mesh: Mesh, images, labels, weights=None):
    """Pad a batch up to a multiple of the data-axis size (zero-weighted
    repeats of row 0) and device-put it sharded over ``data``."""
    n_d = mesh.shape[DATA_AXIS]
    B = int(labels.shape[0])
    if weights is None:
        weights = np.ones(B, np.float32)
    pad = (-B) % n_d
    if pad:
        images = np.concatenate(
            [np.asarray(images)] + [np.asarray(images[:1])] * pad, axis=0
        )
        labels = np.concatenate(
            [np.asarray(labels)] + [np.asarray(labels[:1])] * pad, axis=0
        )
        weights = np.concatenate(
            [np.asarray(weights, np.float32), np.zeros(pad, np.float32)]
        )
    s = shard_batch(mesh)
    return (
        jax.device_put(images, s),
        jax.device_put(labels, s),
        jax.device_put(weights, s),
    )


class ShardedBatches(list):
    """List of sharded (images, labels, weights) triples that also carries
    the host-known real-example count (``real_examples``). The evaluator
    reads the count from here instead of summing a mesh-sharded weights
    array — which spans non-addressable devices in multi-process runs,
    where ``np.asarray`` would raise."""

    # annotation only, NO class-level default: a hand-built instance that
    # never set the count must read as "count unknown" (getattr -> None ->
    # the evaluator falls back to counting), not as 0.0 examples — which
    # would silently normalize metrics to inf/nan
    real_examples: float


def shard_batches(mesh: Mesh, batches) -> ShardedBatches:
    """Prepare a validation stream ONCE for a mesh: returns a list of
    (images, labels, weights) triples sharded over the ``data`` axis.
    Drivers call this at bring-up and reuse the result every round — the
    sharded evaluator skips per-call resharding for triples it produced.
    The returned list's ``real_examples`` records the unpadded example
    count (weighted), captured on the host before device placement."""
    out = ShardedBatches()
    total = 0.0
    for b in (batches() if callable(batches) else batches):
        if len(b) == 3 and b[2] is not None:
            total += float(np.asarray(b[2], np.float32).sum())
        else:
            total += float(len(b[1]))
        out.append(_prep_batch(mesh, *b))
    out.real_examples = total
    return out


def make_sharded_coalition_evaluator(
    forward_fn: Callable[[PyTree, PyTree, jax.Array], jax.Array],
    mesh: Mesh,
    coalition_chunk: int = 0,
    pad_buckets: bool = False,
    shape_hints: Sequence[int] = (),
):
    """Build a mesh-sharded batched evaluator.

    ``forward_fn(shared, varying, images) -> logits`` as in the single-chip
    evaluator. Returns ``evaluate(shared, stacked_varying, batches,
    dataset_size=None) -> np.ndarray [C, 2]``.

    Any coalition count C and any batch size work: the evaluator pads the
    coalition axis to a multiple of the mesh's coalition-axis size (dropping
    padded rows from the output) and pads remainder batches with
    zero-weighted rows. ``coalition_chunk`` / ``pad_buckets`` /
    ``shape_hints`` mirror the single-chip evaluator's semantics (chunked
    coalition axis for memory; power-of-two compile-count bounding; exact
    hot shapes exempt from padding) — a bucket target is still rounded up to
    the coalition-axis multiple.

    ``batches`` may yield (images, labels) pairs (device-put + padded per
    call) or (images, labels, weights) triples from :func:`shard_batches`
    (already sharded; reused as-is — the fast path for a service that
    evaluates the same validation stream every round).
    """
    n_cshards = mesh.shape[COALITION_AXIS]
    coalition_sharding = NamedSharding(mesh, P(COALITION_AXIS))
    if coalition_chunk:
        # honor the memory-derived cap UNDER padding: a chunk that is not
        # an axis multiple gets padded up past the cap inside run_chunk
        # (chunk 12 on an 8-way coalition axis would evaluate 16 resident
        # coalition trees — 33% over what suggest_coalition_chunk sized);
        # round the chunk DOWN to the axis multiple instead (floor: one
        # coalition per shard — the mesh cannot go below that)
        coalition_chunk = max(
            n_cshards, (coalition_chunk // n_cshards) * n_cshards
        )

    # one-slot identity cache for the replicated shared tree: the drivers
    # pass the SAME frozen base tree every round, and re-broadcasting it
    # (172MB bf16 ViT-B -> every device) on each evaluate() call would be
    # several full-tree transfers per serve round for nothing (count
    # DISPATCHES and TRANSFERS — BENCH_NOTES). The strong ref to the keying
    # object makes id-reuse-after-gc impossible; a different tree simply
    # replaces the slot.
    _rep = {"obj": None, "rep": None}

    def _replicated(shared: PyTree) -> PyTree:
        if _rep["obj"] is shared:
            return _rep["rep"]
        rep = put_replicated(mesh, shared)
        _rep["obj"], _rep["rep"] = shared, rep
        return rep

    vstep = jax.vmap(
        lambda s, p, x, y, w: masked_eval_step_metrics(forward_fn(s, p, x), y, w),
        in_axes=(None, 0, None, None, None),
    )
    jstep = jax.jit(
        vstep,
        out_shardings=(coalition_sharding, coalition_sharding),
    )

    def _target(cc: int) -> int:
        t = _bucket_target(cc, pad_buckets, coalition_chunk, shape_hints)
        return -(-t // n_cshards) * n_cshards  # round up to the axis multiple

    def evaluate(
        shared: PyTree,
        stacked_varying: PyTree,
        batches,
        dataset_size: Optional[int] = None,
    ) -> np.ndarray:
        shared_d = _replicated(shared)
        C = jax.tree.leaves(stacked_varying)[0].shape[0]
        if callable(batches):
            batches = batches()
        if not isinstance(batches, (list, tuple)):
            # a one-shot generator would be exhausted by the first chunk
            # (ShardedBatches IS a list and passes through, keeping its
            # real_examples attribute)
            batches = list(batches)
        # real-example count accumulates at PREP time (host-known for pairs;
        # shard_batches carries it for triples) — never inside the chunk
        # loop, where it would cost a blocking per-batch-per-chunk transfer
        # (count DISPATCHES and TRANSFERS — BENCH_NOTES)
        prepped = []
        seen = getattr(batches, "real_examples", None)
        if seen is None:
            seen = 0.0
            for b in batches:
                if len(b) == 3 and b[2] is not None:
                    prepped.append(b)
                    if dataset_size is not None:
                        continue
                    if jax.process_count() > 1:
                        # a mesh-sharded weights array spans non-addressable
                        # devices here; reading it back would raise deep in
                        # np.asarray — fail with the actionable contract
                        raise ValueError(
                            "multi-process evaluate() with pre-sharded "
                            "triples needs dataset_size= (or use "
                            "shard_batches, which records the count)"
                        )
                    seen += float(np.asarray(b[2]).sum())
                else:
                    # pairs AND (images, labels, None) triples — the shape
                    # shard_batches accepts must not crash here either
                    # (_prep_batch defaults a None weights to ones)
                    if dataset_size is None:
                        seen += float(len(b[1]))
                    prepped.append(_prep_batch(mesh, *b))
        else:
            prepped = list(batches)

        def run_chunk(params_chunk) -> Tuple[np.ndarray, np.ndarray]:
            cc = jax.tree.leaves(params_chunk)[0].shape[0]
            target = _target(cc)
            if target != cc:
                params_chunk = jax.tree.map(
                    lambda leaf: jnp.concatenate(
                        [leaf] + [leaf[:1]] * (target - cc), axis=0
                    ),
                    params_chunk,
                )
            params_d = put_coalition_stacked(mesh, params_chunk)
            correct = jnp.zeros((target,), jnp.float32)
            loss = jnp.zeros((target,), jnp.float32)
            for images, labels, weights in prepped:
                c, l = jstep(shared_d, params_d, images, labels, weights)
                correct = correct + c
                loss = loss + l
            if jax.process_count() > 1:
                # the coalition-sharded accumulators span non-addressable
                # devices in multi-process runs; allgather assembles the
                # global rows on every host (rides the same collective
                # fabric as the psum)
                from jax.experimental import multihost_utils

                correct = multihost_utils.process_allgather(correct, tiled=True)
                loss = multihost_utils.process_allgather(loss, tiled=True)
            return (
                np.asarray(jax.device_get(correct))[:cc],
                np.asarray(jax.device_get(loss))[:cc],
            )

        if coalition_chunk and C > coalition_chunk:
            outs = []
            for s in range(0, C, coalition_chunk):
                chunk = jax.tree.map(
                    lambda leaf: leaf[s : s + coalition_chunk], stacked_varying
                )
                outs.append(run_chunk(chunk))
            correct = np.concatenate([o[0] for o in outs])
            loss = np.concatenate([o[1] for o in outs])
        else:
            correct, loss = run_chunk(stacked_varying)

        n = dataset_size if dataset_size is not None else seen
        acc = correct / n
        mean_loss = loss / n
        if np.isnan(mean_loss).any():
            bad = np.nonzero(np.isnan(mean_loss))[0].tolist()
            raise FloatingPointError(f"NaN validation loss for coalitions {bad}")
        return np.stack([acc, mean_loss], axis=1)

    return evaluate


class EvalBackend:
    """The production drivers' evaluation surface, device-count-gated.

    One object owns the (single-chip or mesh-sharded) coalition evaluator,
    the matching batch preparation, and single-model evaluation, so
    ``driver/serve.py`` / ``driver/start.py`` / ``benchmarks/run.py`` run
    the SAME code path on one chip (bit-identical to the direct single-chip
    evaluator) and on a v5e-8 (sharded over the mesh). The reference's
    equivalent is the always-on ``nn.DataParallel`` wrap (start.py:283).

    ``mesh`` is None on a single device.
    """

    def __init__(
        self,
        forward_fn: Callable[[PyTree, PyTree, jax.Array], jax.Array],
        coalition_chunk: int = 0,
        pad_buckets: bool = False,
        shape_hints: Sequence[int] = (),
        mesh: Optional[Mesh] = None,
        stack_single: Optional[Callable[[PyTree], PyTree]] = None,
    ):
        self.mesh = mesh
        self._forward_fn = forward_fn
        # ``stack_single`` maps one model's overlay to a C=1 stacked varying
        # tree for forward_fn — needed when forward_fn does NOT take the
        # overlay directly (e.g. merged-weights mode, where the varying tree
        # is the folded q/v kernels). None = forward_fn(shared, overlay, x)
        # works as-is and single-model evals keep the plain evaluate_model
        # path (bit-identical to the pre-backend drivers on one device).
        self._stack_single = stack_single
        # one stable single-model forward per backend: fl.evaluation caches
        # the jitted eval step per-callable, so this must not be a fresh
        # lambda per call
        self._single_fwd = lambda p, x: forward_fn(p[0], p[1], x)
        if mesh is None:
            from shapley_vit_tpu.fl.evaluation import make_coalition_evaluator

            self.evaluate = make_coalition_evaluator(
                forward_fn,
                coalition_chunk=coalition_chunk,
                pad_buckets=pad_buckets,
                shape_hints=shape_hints,
            )
        else:
            self.evaluate = make_sharded_coalition_evaluator(
                forward_fn,
                mesh,
                coalition_chunk=coalition_chunk,
                pad_buckets=pad_buckets,
                shape_hints=shape_hints,
            )

    def device_batches(self, ds, batch_size: int) -> list:
        """Upload a validation set once, laid out for this backend: plain
        device-resident slices on one chip, data-axis-sharded (and
        remainder-padded) triples on a mesh."""
        if self.mesh is None:
            from shapley_vit_tpu.data.arrays import device_batches

            return device_batches(ds, batch_size)
        return shard_batches(
            self.mesh,
            [
                (ds.images[i : i + batch_size], ds.labels[i : i + batch_size])
                for i in range(0, len(ds), batch_size)
            ],
        )

    def evaluate_single(
        self, shared: PyTree, varying: PyTree, batches, dataset_size: Optional[int] = None
    ) -> Tuple[float, float]:
        """Single-model (accuracy, mean_loss) through the backend's layout:
        ``evaluate_model`` on one chip, a C=1 coalition stack on a mesh (the
        batch still shards over ``data``, so the pass uses every chip). With
        ``stack_single`` set, the C=1 path is used everywhere (the overlay
        cannot be fed to forward_fn directly)."""
        if self._stack_single is not None:
            row = self.evaluate(
                shared, self._stack_single(varying), batches,
                dataset_size=dataset_size,
            )[0]
            return float(row[0]), float(row[1])
        if self.mesh is None:
            from shapley_vit_tpu.fl.evaluation import evaluate_model

            return evaluate_model(
                self._single_fwd, (shared, varying), batches, dataset_size=dataset_size
            )
        from shapley_vit_tpu.ops.tree_math import tree_stack

        row = self.evaluate(
            shared, tree_stack([varying]), batches, dataset_size=dataset_size
        )[0]
        return float(row[0]), float(row[1])


def make_eval_backend(
    forward_fn: Callable[[PyTree, PyTree, jax.Array], jax.Array],
    coalition_chunk: int = 0,
    pad_buckets: bool = False,
    shape_hints: Sequence[int] = (),
    dist_cfg=None,
    devices=None,
    log_fn: Optional[Callable[[str], None]] = None,
    stack_single: Optional[Callable[[PyTree], PyTree]] = None,
    typical_coalitions: int = 0,
    eval_batch: int = 0,
    coalition_bytes: int = 0,
    model_bytes: int = 0,
) -> EvalBackend:
    """Device-count-gated backend factory for the drivers.

    More than one visible device -> a ``(coalition, data)`` mesh over ALL of
    them. ``cfg.dist.mesh_coalition_shards`` >= 1 forces that coalition-axis
    size; 0 (the default) auto-selects it from the workload hints
    (``typical_coalitions`` — the dominant per-call coalition count —
    and ``eval_batch``; see ``parallel.autoshape``), falling back to pure
    data-parallel when the driver passes no hints. One device (or
    ``cfg.dist.mesh = "off"``) -> the single-chip evaluator, bit-identical
    to the pre-mesh drivers."""
    devices = list(devices) if devices is not None else jax.devices()
    mode = getattr(dist_cfg, "mesh", "auto") if dist_cfg is not None else "auto"
    if mode not in ("auto", "off"):
        raise ValueError(f"dist.mesh must be 'auto' or 'off', got {mode!r}")
    mesh = None
    if mode != "off" and len(devices) > 1:
        n_c = getattr(dist_cfg, "mesh_coalition_shards", 0) if dist_cfg else 0
        why = f"mesh_coalition_shards={n_c} (operator override)" if n_c else ""
        if not n_c:
            if typical_coalitions and eval_batch:
                from shapley_vit_tpu.parallel.autoshape import (
                    choose_coalition_shards,
                )

                hbm = 0
                try:
                    stats = devices[0].memory_stats()
                    hbm = int((stats or {}).get("bytes_limit", 0))
                except Exception:
                    pass
                choice = choose_coalition_shards(
                    len(devices),
                    typical_coalitions,
                    eval_batch,
                    coalition_bytes=coalition_bytes,
                    hbm_bytes=hbm,
                    model_bytes=model_bytes,
                )
                n_c, why = choice.n_coalition, choice.rationale
            else:
                n_c, why = 1, "pure data-parallel (no workload hints)"
        if len(devices) % n_c:
            raise ValueError(
                f"mesh_coalition_shards={n_c} does not divide {len(devices)} devices"
            )
        mesh = make_mesh(n_coalition=n_c, devices=devices)
        if log_fn is not None:
            log_fn(
                f"coalition eval sharded over {len(devices)} devices "
                f"(mesh {n_c}x{len(devices) // n_c} [{COALITION_AXIS},{DATA_AXIS}]): "
                + why
            )
    return EvalBackend(
        forward_fn,
        coalition_chunk=coalition_chunk,
        pad_buckets=pad_buckets,
        shape_hints=shape_hints,
        mesh=mesh,
        stack_single=stack_single,
    )
