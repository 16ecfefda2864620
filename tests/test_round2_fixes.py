"""Regression tests for the round-2 ADVICE/VERDICT fixes.

Covers: masked per-round Shapley scoring over a full-powerset utility dict
(ADVICE medium #1), the 'x-ray'/'cell' synthetic fallback alias (ADVICE
medium #2), the cached jitted eval step (VERDICT weak #3), the one-shot
generator guard in the chunked coalition evaluator (ADVICE low), and the
peft classifier key-order independence (ADVICE low).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from shapley_vit_tpu.fl import evaluation as ev
from shapley_vit_tpu.shapley import fed_shapley as fs


# ---------------------------------------------------------------- fed_shapley
def test_masked_per_round_scoring_full_powerset():
    # utilities over the FULL 3-client powerset (as compute_utilities_lazy
    # produces) but only clients {0,1} participate: must not KeyError, and
    # must equal the SV of the restricted 2-player game.
    vals = {0: 0.5, 1: 0.3, 2: 0.9}
    full = {
        S: sum(vals[c] for c in S)
        for S in [(), (0,), (1,), (2,), (0, 1), (0, 2), (1, 2), (0, 1, 2)]
    }
    mask = np.array([[1, 1, 0]])
    out = fs.compute_shapley_value_for_participating_clients(
        rounds=1,
        num_clients=3,
        utilities_dict_list=[full],
        mask=mask,
        shapley_non_participating_clients=False,
    )
    sv = out[0]
    assert set(sv) == {0, 1}
    # additive game -> SV == individual value
    assert sv[0] == pytest.approx(0.5)
    assert sv[1] == pytest.approx(0.3)


def test_compute_shapley_corrected_all_participating_unchanged():
    vals = {0: 0.2, 1: 0.7}
    full = {S: sum(vals[c] for c in S) for S in [(), (0,), (1,), (0, 1)]}
    sv = fs.compute_shapley_corrected(full, [0, 1])
    assert sv[0] == pytest.approx(0.2)
    assert sv[1] == pytest.approx(0.7)


# ------------------------------------------------------------------- registry
@pytest.mark.parametrize("alias", ["x-ray", "cell"])
def test_registry_alias_synthetic_fallback(alias, tmp_path):
    from shapley_vit_tpu.data.registry import get_dataset

    splits, info = get_dataset(alias, data_dir=str(tmp_path / "nope"))
    assert info["num_classes"] == 4
    assert splits["train"].images.shape[1:] == (256, 256, 3)


# ----------------------------------------------------------------- evaluation
def test_evaluate_model_traces_once_across_calls():
    traces = []

    def forward(params, x):
        traces.append(1)  # traced side effect: runs once per (re)trace
        return x @ params

    params = np.eye(4, dtype=np.float32)
    batch = (np.ones((8, 4), np.float32), np.zeros(8, np.int64))
    ev.evaluate_model(forward, params, [batch])
    ev.evaluate_model(forward, params, [batch])
    ev.evaluate_model(forward, params, [batch, batch])
    assert sum(traces) == 1, f"expected one trace, got {sum(traces)}"


def test_chunked_evaluator_accepts_oneshot_generator():
    def forward(shared, varying, x):
        return x @ varying + shared

    C = 5
    stacked = np.stack([np.eye(3, dtype=np.float32) * (i + 1) for i in range(C)])
    shared = np.zeros((3,), np.float32)
    images = np.random.default_rng(0).normal(size=(12, 3)).astype(np.float32)
    labels = np.random.default_rng(1).integers(0, 3, size=12)
    batches = [(images[:6], labels[:6]), (images[6:], labels[6:])]

    evaluator = ev.make_coalition_evaluator(forward, coalition_chunk=2)
    ref = evaluator(shared, stacked, batches)
    gen = evaluator(shared, stacked, (b for b in batches))  # one-shot generator
    np.testing.assert_allclose(gen, ref, rtol=1e-6)


# -------------------------------------------------------------------- convert
def test_peft_classifier_trainable_copy_wins_any_order():
    from shapley_vit_tpu.models.convert import peft_lora_to_tree
    from shapley_vit_tpu.models.vit import make_spec

    spec = make_spec("micro", num_classes=4)
    L, D, r = spec.depth, spec.hidden, spec.lora_r
    trained_w = np.full((4, D), 2.0, np.float32)
    frozen_w = np.full((4, D), -1.0, np.float32)

    def build(frozen_first):
        sd = {}
        cls = [
            ("classifier.modules_to_save.default.weight", trained_w),
            ("classifier.modules_to_save.default.bias", np.ones(4, np.float32)),
            ("classifier.original_module.weight", frozen_w),
            ("classifier.original_module.bias", np.zeros(4, np.float32)),
        ]
        if frozen_first:
            cls = cls[2:] + cls[:2]
        for k, v in cls:
            sd[k] = v
        for i in range(L):
            for t in ("query", "value"):
                stem = f"vit.encoder.layer.{i}.attention.attention.{t}"
                sd[f"{stem}.lora_A.default.weight"] = np.zeros((r, D), np.float32)
                sd[f"{stem}.lora_B.default.weight"] = np.zeros((D, r), np.float32)
        return sd

    for frozen_first in (False, True):
        tree = peft_lora_to_tree(build(frozen_first), spec)
        np.testing.assert_array_equal(tree["classifier"]["kernel"], trained_w.T)
        assert tree["classifier"]["bias"][0] == 1.0


def test_pad_buckets_matches_unpadded():
    """Bucket-padded evaluation returns identical utilities (padding rows are
    computed and dropped); shapes submitted to XLA are bounded."""
    def forward(shared, varying, x):
        return x @ varying + shared

    rng = np.random.default_rng(2)
    images = rng.normal(size=(10, 3)).astype(np.float32)
    labels = rng.integers(0, 3, size=10)
    shared = np.zeros((3,), np.float32)
    batches = [(images, labels)]
    for C in (1, 3, 5, 7, 9):
        stacked = np.stack([np.eye(3, dtype=np.float32) * (i + 1) for i in range(C)])
        plain = ev.make_coalition_evaluator(forward, coalition_chunk=4)(
            shared, stacked, batches
        )
        padded = ev.make_coalition_evaluator(
            forward, coalition_chunk=4, pad_buckets=True
        )(shared, stacked, batches)
        np.testing.assert_allclose(padded, plain, rtol=1e-6)


def test_eval_step_cache_evicts_dead_forward_fns():
    """The cached jitted step must not keep its forward_fn key alive
    (self-review finding: a strong closure made the WeakKeyDictionary
    permanent)."""
    import gc

    before = len(ev._EVAL_STEP_CACHE)

    def forward(params, x):
        return x @ params

    params = np.eye(4, dtype=np.float32)
    batch = (np.ones((8, 4), np.float32), np.zeros(8, np.int64))
    ev.evaluate_model(forward, params, [batch])
    assert len(ev._EVAL_STEP_CACHE) == before + 1
    del forward
    gc.collect()
    assert len(ev._EVAL_STEP_CACHE) == before


def test_resolve_data_sizes_policies():
    from shapley_vit_tpu.fl.ingestion import resolve_data_sizes

    # full metadata -> absolute sizes
    assert resolve_data_sizes([120, 300, 580], [True] * 3) == [120.0, 300.0, 580.0]
    # partial metadata -> equal weights for the whole round (not 1.0 mixed
    # with absolute sizes, which would near-zero the legacy client)
    logs = []
    assert resolve_data_sizes([5000, None, 5000], [True] * 3, logs.append) == [1.0] * 3
    assert logs, "partial-metadata fallback must be logged"
    # no metadata at all -> equal weights, no log
    assert resolve_data_sizes([None, None], [True, True]) == [1.0, 1.0]
    # absent clients don't block the sized path
    assert resolve_data_sizes([100, None, 200], [True, False, True]) == [100.0, 1.0, 200.0]
