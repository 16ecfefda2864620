"""Validation-set evaluation: the hot path.

Reference equivalent: ``evaluation(args, net, eval_loader)``
(federated_learning/utils.py:864-926) — per 128-batch ``net(img).logits`` →
argmax-accuracy count + sum-reduction cross-entropy, both normalized by the
*dataset* size at the end (utils.py:924-926).

TPU-first inversions (SURVEY.md §7):
  * gradients are never retained (the reference forgets ``torch.no_grad()`` on
    the live branch — a memory bug we do not replicate);
  * the correct/loss accumulators stay on device across batches (the reference
    calls ``.item()`` per batch, utils.py:891-894);
  * the *coalition-batched* evaluator vmaps the forward over stacked LoRA
    trees, turning the reference's serial coalition loop into one pass.

API note: model parameters are always threaded as ARGUMENTS of the jitted
step, never captured by closure — closed-over arrays become compile-time
constants embedded in the HLO, which for an 86M-param ViT base inflates the
compile payload by ~343MB (and overflows remote-compile request limits).
``forward_fn`` therefore takes the shared (frozen) tree and the per-coalition
(varying) tree separately.

The NaN guard mirrors utils.py:918-922 (which dumps all parameters and
raises): we raise with the offending coalition indices instead.
"""

from __future__ import annotations

import weakref
from typing import Any, Callable, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

PyTree = Any

# One jitted eval step per forward_fn: repeated evaluate_model calls (e.g.
# driver/serve.py calls it twice per round) must not rebuild a fresh jitted
# callable each time — that costs a retrace-equality check + cache lookup per
# call and defeats jit's own cache when the lambda identity changes.
_EVAL_STEP_CACHE: "weakref.WeakKeyDictionary[Callable, Callable]" = (
    weakref.WeakKeyDictionary()
)


def _cached_eval_step(forward_fn: Callable) -> Callable:
    step = _EVAL_STEP_CACHE.get(forward_fn)
    if step is None:
        # the step must not close over forward_fn strongly: the cache VALUE
        # would then keep its own KEY alive and the WeakKeyDictionary could
        # never evict (a permanent executable leak). Close over a weakref;
        # the entry becomes unreachable the moment the key dies, so the ref
        # is always live when the step actually runs.
        try:
            fn_ref = weakref.ref(forward_fn)
        except TypeError:
            # non-weakref-able callable: per-call jit (uncached)
            return jax.jit(lambda p, x, y: eval_step_metrics(forward_fn(p, x), y))
        step = jax.jit(lambda p, x, y: eval_step_metrics(fn_ref()(p, x), y))
        _EVAL_STEP_CACHE[forward_fn] = step
    return step


def eval_step_metrics(logits: jax.Array, labels: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-batch (correct_count, ce_loss_sum), both f32 scalars on device.

    CE matches torch ``CrossEntropyLoss(reduction='sum')`` (utils.py:873):
    sum over batch of -log_softmax(logits)[label], computed in f32.
    """
    logits = logits.astype(jnp.float32)
    correct = jnp.sum(jnp.argmax(logits, axis=-1) == labels)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return correct.astype(jnp.float32), jnp.sum(nll)


def evaluate_model(
    forward_fn: Callable[[PyTree, jax.Array], jax.Array],
    params: PyTree,
    batches: Iterable[Tuple[np.ndarray, np.ndarray]],
    dataset_size: Optional[int] = None,
) -> Tuple[float, float]:
    """Single-model evaluation -> (accuracy, mean_loss).

    ``forward_fn(params, images) -> logits``; ``params`` is an arbitrary
    pytree passed through jit as an argument (e.g. a ``(base, lora)`` tuple).
    ``batches`` yields (images, labels). Accumulators stay on device; one
    host transfer at the end. Normalization is by ``dataset_size`` (the
    reference divides by ``len(eval_loader.dataset)``, utils.py:924-926);
    defaults to the number of examples seen.
    """
    step = _cached_eval_step(forward_fn)
    correct = jnp.zeros((), jnp.float32)
    loss = jnp.zeros((), jnp.float32)
    seen = 0
    for images, labels in batches:
        c, l = step(params, images, labels)
        correct = correct + c
        loss = loss + l
        seen += len(labels)
    n = dataset_size if dataset_size is not None else seen
    acc = float(correct) / n
    mean_loss = float(loss) / n
    if np.isnan(mean_loss):
        # reference NaN guard (utils.py:918-922)
        raise FloatingPointError(f"NaN validation loss (acc={acc}, n={n})")
    return acc, mean_loss


def device_hbm_bytes(default: float = 16e9) -> float:
    """The accelerator's memory limit, from the runtime when it reports one
    (v5e: 16GB; CPU/interpret backends report nothing -> ``default``)."""
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats and stats.get("bytes_limit"):
            return float(stats["bytes_limit"])
    except Exception:
        pass
    return default


def suggest_coalition_chunk(
    seq_len: int,
    hidden: int,
    batch_size: int,
    hbm_bytes: Optional[float] = None,
    activation_multiplier: float = 20.0,
    safety: float = 0.6,
    act_bytes: int = 2,
) -> int:
    """HBM-aware coalition-axis chunk size.

    Live activations under the vmapped forward scale as roughly
    C·B·N·D·act_bytes·multiplier (multiplier ≈ 20 covers the residual
    stream, attention probs, and MLP intermediates surviving XLA liveness
    analysis — calibrated on ViT-B/224 @ B=128, where chunk 16 fits a 16GB
    v5e and 101 coalitions OOM). Always returns >= 1; the evaluator only
    splits when the coalition count exceeds the returned chunk, so a large
    return value means "no chunking needed". Validated against the
    compiler's own memory_analysis at TWO points (tools/chunk_calibration.py,
    BENCH_NOTES round 3): ViT-B/B=128 suggests 12 vs compiler max 34,
    ViT-L/B=128 suggests 9 vs 25 — conservative with ~2.8x margin at both,
    deliberately kept (the margin absorbs fragmentation and the resident
    validation set, and under-chunking costs nothing measurable).
    ``hbm_bytes=None`` reads the device's reported memory limit (falls back
    to the 16GB v5e figure when the backend reports none)."""
    if hbm_bytes is None:
        hbm_bytes = device_hbm_bytes()
    per_coalition = batch_size * seq_len * hidden * act_bytes * activation_multiplier
    chunk = int(safety * hbm_bytes / per_coalition)
    return max(1, chunk)


def _next_pow2(n: int) -> int:
    b = 1
    while b < n:
        b *= 2
    return b


def powerset_shape_hints(n: int):
    """Shape hints for a service valuing up to ``n`` clients: one exact
    compiled shape per participation level's full powerset (2^k − 1 — the
    dominant per-round coalition batch; stragglers shrink k). Hints compile
    lazily, so unused levels are free."""
    return tuple(2**k - 1 for k in range(1, n + 1))


def _bucket_target(cc: int, pad_buckets: bool, coalition_chunk: int, shape_hints=()) -> int:
    """Coalition-batch size actually compiled for a chunk of ``cc`` rows.
    ``shape_hints`` lists exact counts that earn their own compiled shape
    (e.g. the full powerset 2^n - 1, the dominant size in a service round)
    so the hot case pays no padding while the compile count stays bounded."""
    if not pad_buckets or cc in shape_hints:
        return cc
    target = _next_pow2(cc)
    if coalition_chunk:
        target = min(target, max(coalition_chunk, 1))
    return max(target, cc)


def make_coalition_evaluator(
    forward_fn: Callable[[PyTree, PyTree, jax.Array], jax.Array],
    coalition_chunk: int = 0,
    pad_buckets: bool = False,
    shape_hints=(),
):
    """Build the batched primitive: evaluate C coalition models in one pass.

    ``forward_fn(shared, varying, images) -> logits`` runs ONE coalition's
    model; ``shared`` is the frozen base tree (passed once, never stacked),
    ``varying`` is the per-coalition tree (LoRA + classifier for the live
    config). The returned evaluator vmaps over a stacked ``varying`` pytree
    (leading coalition axis on every leaf — typically produced by
    ``ops.materialize_coalitions``).

    Returns ``evaluate(shared, stacked_varying, batches, dataset_size=None)
    -> np.ndarray [C, 2]`` of (accuracy, mean_loss) rows — the TPU
    replacement for the reference's one-validation-pass-per-coalition loop
    (game2.py:106-110 under utils_shapley.py:284-301).

    ``coalition_chunk > 0`` chunks the coalition axis to bound memory for
    full-delta (non-LoRA) configs (SURVEY.md §7 "hard parts"). A one-shot
    generator passed as ``batches`` is materialized into a list up front so
    every coalition chunk sees the full validation stream.

    ``pad_buckets=True`` pads each coalition chunk up to the next power of
    two (capped at ``coalition_chunk``) by repeating the first row, then
    drops the padded outputs. Sequential estimators (GTG/Fed-SV blocks)
    submit a DIFFERENT coalition count per call; without bucketing every
    distinct count compiles a fresh XLA program — on a remote-compile TPU
    that dwarfs the eval itself. Buckets bound the compile count to
    log2(chunk) shapes at the cost of ≤2× padded work on odd-sized chunks
    (free in practice: the padded rows ride the same vmapped pass).

    ``shape_hints`` exempts exact coalition counts from padding (each earns
    its own compiled shape). The service passes the full powerset size
    2^n − 1 — the dominant per-round batch — which removes the measured
    ~14% padding tax (tools/serve_profile.py) for one extra compile.
    """
    vstep = jax.vmap(
        lambda s, p, x, y: eval_step_metrics(forward_fn(s, p, x), y),
        in_axes=(None, 0, None, None),
    )
    jstep = jax.jit(vstep)

    def evaluate(
        shared: PyTree,
        stacked_varying: PyTree,
        batches,
        dataset_size: Optional[int] = None,
    ) -> np.ndarray:
        C = jax.tree.leaves(stacked_varying)[0].shape[0]
        if (
            coalition_chunk
            and C > coalition_chunk
            and not callable(batches)
            and not isinstance(batches, (list, tuple))
        ):
            # a one-shot generator would be exhausted by the first chunk,
            # silently zeroing later chunks' accumulators
            batches = list(batches)

        def run_chunk(params_chunk):
            cc = jax.tree.leaves(params_chunk)[0].shape[0]
            target = _bucket_target(cc, pad_buckets, coalition_chunk, shape_hints)
            if target != cc:
                params_chunk = jax.tree.map(
                    lambda leaf: jnp.concatenate(
                        [leaf]
                        + [leaf[:1]] * (target - cc),
                        axis=0,
                    ),
                    params_chunk,
                )
            correct = jnp.zeros((target,), jnp.float32)
            loss = jnp.zeros((target,), jnp.float32)
            seen = 0
            for images, labels in batches() if callable(batches) else batches:
                c, l = jstep(shared, params_chunk, images, labels)
                correct = correct + c
                loss = loss + l
                seen += len(labels)
            return correct[:cc], loss[:cc], seen

        if coalition_chunk and C > coalition_chunk:
            outs = []
            for s in range(0, C, coalition_chunk):
                chunk = jax.tree.map(
                    lambda leaf: leaf[s : s + coalition_chunk], stacked_varying
                )
                outs.append(run_chunk(chunk))
            correct = jnp.concatenate([o[0] for o in outs])
            loss = jnp.concatenate([o[1] for o in outs])
            seen = outs[0][2]
        else:
            correct, loss, seen = run_chunk(stacked_varying)

        n = dataset_size if dataset_size is not None else seen
        acc = np.asarray(correct) / n
        mean_loss = np.asarray(loss) / n
        if np.isnan(mean_loss).any():
            bad = np.nonzero(np.isnan(mean_loss))[0].tolist()
            raise FloatingPointError(f"NaN validation loss for coalitions {bad}")
        return np.stack([acc, mean_loss], axis=1)

    return evaluate
