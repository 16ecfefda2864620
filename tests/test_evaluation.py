"""Evaluation-primitive tests: single-model eval parity with torch CE
semantics, and the coalition-batched evaluator vs. serial evaluation."""

import jax
import numpy as np
import pytest

from shapley_vit_tpu.fl import evaluation as ev
from shapley_vit_tpu.models import vit as jvit
from shapley_vit_tpu.ops import tree_math as tm


def batches_of(images, labels, bs):
    return [
        (images[i : i + bs], labels[i : i + bs]) for i in range(0, len(labels), bs)
    ]


def test_eval_step_metrics_matches_torch_ce(rng):
    torch = pytest.importorskip("torch")
    logits = rng.normal(size=(16, 4)).astype(np.float32)
    labels = rng.integers(0, 4, size=16)
    correct, loss = ev.eval_step_metrics(np.asarray(logits), np.asarray(labels))
    tl = torch.nn.CrossEntropyLoss(reduction="sum")(
        torch.from_numpy(logits), torch.from_numpy(labels.astype(np.int64))
    )
    # reference: criterion = CrossEntropyLoss(reduction='sum') (utils.py:873)
    np.testing.assert_allclose(float(loss), float(tl), rtol=1e-6)
    assert float(correct) == (logits.argmax(1) == labels).sum()


def test_evaluate_model_normalizes_by_dataset_size(rng):
    spec = jvit.make_spec("micro")
    base = jvit.init_vit(jax.random.key(0), spec)
    images = rng.normal(size=(10, 16, 16, 3)).astype(np.float32)
    labels = rng.integers(0, 4, size=10)
    # params threaded as a jit argument, not a closure
    fwd = lambda p, x: jvit.vit_forward(p, None, x, spec)
    acc, loss = ev.evaluate_model(fwd, base, batches_of(images, labels, 4))
    assert 0.0 <= acc <= 1.0 and loss > 0
    # uneven final batch (10 = 4+4+2) must still normalize by 10
    acc2, loss2 = ev.evaluate_model(fwd, base, batches_of(images, labels, 3), dataset_size=10)
    np.testing.assert_allclose(acc, acc2, atol=1e-6)
    np.testing.assert_allclose(loss, loss2, rtol=1e-5)


def test_coalition_evaluator_matches_serial(rng):
    """The vmapped C-coalition pass must equal C serial evaluations —
    the core correctness claim of the TPU design."""
    spec = jvit.make_spec("micro")
    base = jvit.init_vit(jax.random.key(0), spec)
    lora0 = jvit.init_lora(jax.random.key(1), spec, classifier_from=base)

    # three clients with random LoRA deltas
    deltas = []
    for i in range(3):
        k = jax.random.key(10 + i)
        noise = jax.tree.map(
            lambda leaf: 0.05 * jax.random.normal(jax.random.fold_in(k, hash(leaf.shape) % 1000), leaf.shape),
            lora0,
        )
        deltas.append(noise)
    stacked = tm.tree_stack(deltas)
    coalitions = [[0], [1], [2], [0, 1], [0, 2], [1, 2], [0, 1, 2]]
    W = tm.coalition_weight_matrix(coalitions, [100, 200, 700], 3)
    stacked_lora = tm.materialize_coalitions(lora0, stacked, W)

    images = rng.normal(size=(12, 16, 16, 3)).astype(np.float32)
    labels = rng.integers(0, 4, size=12)
    data = batches_of(images, labels, 5)

    fwd = lambda b, lora, x: jvit.vit_forward(b, lora, x, spec)
    evaluator = ev.make_coalition_evaluator(fwd)
    batched = evaluator(base, stacked_lora, data)
    assert batched.shape == (7, 2)

    for c in range(7):
        lora_c = jax.tree.map(lambda leaf: leaf[c], stacked_lora)
        acc, loss = ev.evaluate_model(
            lambda p, x: jvit.vit_forward(p[0], p[1], x, spec), (base, lora_c), data
        )
        np.testing.assert_allclose(batched[c, 0], acc, atol=1e-6)
        np.testing.assert_allclose(batched[c, 1], loss, rtol=1e-5)


def test_nan_guard_raises(rng):
    """Reference NaN guard (utils.py:918-922): a NaN validation loss must
    raise, not silently poison the utility table."""
    import jax.numpy as jnp

    images = rng.normal(size=(4, 2)).astype(np.float32)
    labels = rng.integers(0, 2, size=4)
    nan_forward = lambda p, x: x @ p * jnp.nan
    with pytest.raises(FloatingPointError):
        ev.evaluate_model(nan_forward, jnp.ones((2, 2)), [(images, labels)])

    evaluator = ev.make_coalition_evaluator(lambda s, p, x: x @ p * jnp.nan)
    stacked = jnp.ones((3, 2, 2))
    with pytest.raises(FloatingPointError) as e:
        evaluator(None, stacked, [(images, labels)])
    assert "coalitions" in str(e.value)


def test_suggest_coalition_chunk_calibration():
    # calibrated so ViT-B/224 @ B=128 suggests ~12 (chunk 16 fit, 101 OOMed)
    c = ev.suggest_coalition_chunk(197, 768, 128)
    assert 8 <= c <= 24
    # tiny models: effectively unbounded chunk
    assert ev.suggest_coalition_chunk(17, 32, 16) > 1000
    assert ev.suggest_coalition_chunk(197, 768, 128, hbm_bytes=1e6) == 1


def test_fused_bench_round_matches_evaluator(rng):
    """bench.py's fused merged-weights scan round must equal the
    serial-compatible evaluator (micro scale, CPU)."""
    import jax.numpy as jnp

    spec = jvit.make_spec("micro")
    base = jvit.init_vit(jax.random.key(0), spec)
    lora0 = jvit.init_lora(jax.random.key(1), spec, classifier_from=base)
    leaves, treedef = jax.tree.flatten(lora0)
    deltas = [
        treedef.unflatten([
            0.05 * jax.random.normal(k, l.shape)
            for k, l in zip(jax.random.split(jax.random.key(i), len(leaves)), leaves)
        ])
        for i in range(3)
    ]
    stacked = tm.tree_stack(deltas)
    W = tm.coalition_weight_matrix(
        [[0], [1], [2], [0, 1], [0, 2], [1, 2], [0, 1, 2]], [12, 30, 58], 3
    )
    nb, bs = 2, 8
    images = jnp.asarray(rng.normal(size=(nb, bs, 16, 16, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 4, size=(nb, bs)))
    n_total = nb * bs

    @jax.jit
    def fused_round(base, lora0, stacked, Wm, ims, labs):
        stacked_lora = tm.materialize_coalitions(lora0, stacked, Wm)
        merged = jvit.merge_coalition_weights(base, stacked_lora, spec)
        vstep = jax.vmap(
            lambda b, m, x, y: ev.eval_step_metrics(
                jvit.vit_forward_merged(b, m, x, spec), y
            ),
            in_axes=(None, 0, None, None),
        )

        def body(carry, xy):
            c, l = vstep(base, merged, xy[0], xy[1])
            return (carry[0] + c, carry[1] + l), None

        C = Wm.shape[0]
        (correct, loss), _ = jax.lax.scan(
            body, (jnp.zeros(C), jnp.zeros(C)), (ims, labs)
        )
        return correct / n_total, loss / n_total

    acc, loss = fused_round(base, lora0, stacked, jnp.asarray(W), images, labels)
    fused = np.stack([np.asarray(acc), np.asarray(loss)], axis=1)

    evaluator = ev.make_coalition_evaluator(
        lambda b, l, x: jvit.vit_forward(b, l, x, spec)
    )
    check = evaluator(
        base,
        tm.materialize_coalitions(lora0, stacked, W),
        [(images[i], labels[i]) for i in range(nb)],
        dataset_size=n_total,
    )
    np.testing.assert_allclose(fused, check, atol=1e-5, rtol=1e-4)


def test_coalition_evaluator_chunking_equivalence(rng):
    spec = jvit.make_spec("micro")
    base = jvit.init_vit(jax.random.key(0), spec)
    lora0 = jvit.init_lora(jax.random.key(1), spec, classifier_from=base)
    deltas = [jax.tree.map(lambda l: l + 0.01 * (i + 1), lora0) for i in range(3)]
    stacked = tm.tree_stack(deltas)
    W = tm.coalition_weight_matrix([[0], [1], [2], [0, 1, 2], [1, 2]], [1, 1, 1], 3)
    stacked_lora = tm.materialize_coalitions(lora0, stacked, W)
    images = rng.normal(size=(8, 16, 16, 3)).astype(np.float32)
    labels = rng.integers(0, 4, size=8)
    data = batches_of(images, labels, 8)
    fwd = lambda b, lora, x: jvit.vit_forward(b, lora, x, spec)
    full = ev.make_coalition_evaluator(fwd)(base, stacked_lora, data)
    chunked = ev.make_coalition_evaluator(fwd, coalition_chunk=2)(base, stacked_lora, data)
    np.testing.assert_allclose(full, chunked, atol=1e-6)


def test_bucket_target_shape_hints():
    from shapley_vit_tpu.fl.evaluation import _bucket_target

    # plain bucketing: next pow2 capped at the chunk
    assert _bucket_target(7, True, 16) == 8
    assert _bucket_target(5, True, 16) == 8
    assert _bucket_target(9, True, 8) == 9  # cap keeps >= cc
    assert _bucket_target(7, False, 16) == 7
    # hinted sizes compile exactly — no padding tax for the hot case
    assert _bucket_target(7, True, 16, shape_hints=(7,)) == 7
    assert _bucket_target(5, True, 16, shape_hints=(7,)) == 8
    assert _bucket_target(3, True, 0, shape_hints=(3,)) == 3


def test_evaluator_shape_hints_results_match(rng):
    """Hinted (unpadded) and padded evaluation agree exactly."""
    spec = jvit.make_spec("micro")
    base = jvit.init_vit(jax.random.key(0), spec)
    lora0 = jvit.init_lora(jax.random.key(1), spec, classifier_from=base)
    deltas = [
        jax.tree.map(
            lambda leaf: 0.05 * jax.random.normal(jax.random.key(20 + i), leaf.shape),
            lora0,
        )
        for i in range(3)
    ]
    stacked = tm.tree_stack(deltas)
    coalitions = [[0], [1], [2], [0, 1], [0, 2], [1, 2], [0, 1, 2]]
    W = tm.coalition_weight_matrix(coalitions, [100, 200, 700], 3)
    stacked_lora = tm.materialize_coalitions(lora0, stacked, W)
    images = rng.normal(size=(10, 16, 16, 3)).astype(np.float32)
    labels = rng.integers(0, 4, size=10)
    data = batches_of(images, labels, 5)
    fwd = lambda b, lora, x: jvit.vit_forward(b, lora, x, spec)

    e_pad = ev.make_coalition_evaluator(fwd, coalition_chunk=8, pad_buckets=True)
    e_hint = ev.make_coalition_evaluator(
        fwd, coalition_chunk=8, pad_buckets=True, shape_hints=(7,)
    )
    out_pad = e_pad(base, stacked_lora, data, dataset_size=10)
    out_hint = e_hint(base, stacked_lora, data, dataset_size=10)
    np.testing.assert_allclose(out_pad, out_hint, rtol=0, atol=0)
