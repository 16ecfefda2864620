"""Mesh/sharding tests on the 8-device virtual CPU mesh: the sharded
coalition evaluator must match the single-chip path exactly, and the
multi-client train step must run sharded."""

import jax
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from shapley_vit_tpu.config import DistConfig
from shapley_vit_tpu.data.arrays import ArrayDataset
from shapley_vit_tpu.fl import evaluation as ev
from shapley_vit_tpu.fl import training as tr
from shapley_vit_tpu.models import vit as jvit
from shapley_vit_tpu.ops import tree_math as tm
from shapley_vit_tpu.parallel import mesh as pmesh
from shapley_vit_tpu.parallel.coalition_eval import (
    make_eval_backend,
    make_sharded_coalition_evaluator,
    shard_batches,
)


@pytest.fixture(scope="module")
def setup():
    spec = jvit.make_spec("micro")
    base = jvit.init_vit(jax.random.key(0), spec)
    lora0 = jvit.init_lora(jax.random.key(1), spec, classifier_from=base)
    leaves, treedef = jax.tree.flatten(lora0)
    deltas = [
        treedef.unflatten(
            [
                0.05 * jax.random.normal(k, l.shape)
                for k, l in zip(jax.random.split(jax.random.key(i), len(leaves)), leaves)
            ]
        )
        for i in range(4)
    ]
    stacked = tm.tree_stack(deltas)
    coalitions = [[0], [1], [2], [3], [0, 1], [2, 3], [0, 1, 2, 3], [1, 2]]
    W = tm.coalition_weight_matrix(coalitions, [10, 20, 30, 40], 4)
    stacked_lora = tm.materialize_coalitions(lora0, stacked, W)
    rng = np.random.default_rng(0)
    images = rng.normal(size=(16, 16, 16, 3)).astype(np.float32)
    labels = rng.integers(0, 4, size=16)
    fwd = lambda b, l, x: jvit.vit_forward(b, l, x, spec)
    return dict(
        spec=spec, base=base, stacked_lora=stacked_lora, fwd=fwd,
        data=[(images[:8], labels[:8]), (images[8:], labels[8:])],
    )


def test_make_mesh_shapes():
    mesh = pmesh.make_mesh(n_coalition=2)
    assert mesh.devices.shape == (2, 4)
    assert mesh.axis_names == ("coalition", "data")
    mesh1 = pmesh.make_mesh(n_coalition=1, n_data=1, devices=jax.devices()[:1])
    assert mesh1.devices.shape == (1, 1)
    with pytest.raises(ValueError):
        pmesh.make_mesh(n_coalition=3)  # 8 % 3 != 0


def test_sharded_evaluator_matches_single_chip(setup):
    s = setup
    mesh = pmesh.make_mesh(n_coalition=2)  # 2x4 over 8 virtual devices
    sharded = make_sharded_coalition_evaluator(s["fwd"], mesh)
    got = sharded(s["base"], s["stacked_lora"], s["data"])
    single = ev.make_coalition_evaluator(s["fwd"])
    want = single(s["base"], s["stacked_lora"], s["data"])
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_sharded_evaluator_1x8_data_parallel(setup):
    # pure data-parallel layout (the reference's DataParallel analogue)
    s = setup
    mesh = pmesh.make_mesh(n_coalition=1)
    sharded = make_sharded_coalition_evaluator(s["fwd"], mesh)
    got = sharded(s["base"], s["stacked_lora"], s["data"])
    want = ev.make_coalition_evaluator(s["fwd"])(s["base"], s["stacked_lora"], s["data"])
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_sharded_evaluator_int8_quant_mode(setup):
    """The int8 fast-eval path must compile and run under mesh sharding
    (dot_general int8 with sharded operands) and stay close to the sharded
    f32 result."""
    s = setup
    qspec = s["spec"].replace(quant="int8")
    qfwd = lambda b, l, x: jvit.vit_forward(b, l, x, qspec)
    mesh = pmesh.make_mesh(n_coalition=2)
    got = make_sharded_coalition_evaluator(qfwd, mesh)(
        s["base"], s["stacked_lora"], s["data"]
    )
    want = make_sharded_coalition_evaluator(s["fwd"], mesh)(
        s["base"], s["stacked_lora"], s["data"]
    )
    assert np.isfinite(got).all()
    # quantized utilities track f32 within quantization noise
    np.testing.assert_allclose(got[:, 1], want[:, 1], atol=0.05)  # loss dim
    assert np.corrcoef(got.ravel(), want.ravel())[0, 1] > 0.99


def test_sharded_full_delta_coalition_eval(setup):
    """Whole-tree (non-LoRA) coalition stacking shards over the mesh the
    same way the overlay path does — the full-delta configuration's
    multi-chip story (reference aggregates entire state dicts,
    utils.py:735-749)."""
    s = setup
    spec = s["spec"]
    base = s["base"]
    leaves, treedef = jax.tree.flatten(base)
    deltas = [
        treedef.unflatten(
            [0.02 * jax.random.normal(k, l.shape)
             for k, l in zip(jax.random.split(jax.random.key(50 + i), len(leaves)), leaves)]
        )
        for i in range(4)
    ]
    stacked = tm.tree_stack(deltas)
    coalitions = [[0], [1], [2], [3], [0, 1], [2, 3], [0, 1, 2, 3], [1, 2]]
    W = tm.coalition_weight_matrix(coalitions, [10, 20, 30, 40], 4)
    full_trees = tm.materialize_coalitions(base, stacked, W)

    fwd = lambda _shared, v, x: jvit.vit_forward(v, None, x, spec)
    mesh = pmesh.make_mesh(n_coalition=2)
    got = make_sharded_coalition_evaluator(fwd, mesh)({}, full_trees, s["data"])
    want = ev.make_coalition_evaluator(fwd)({}, full_trees, s["data"])
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_sharded_evaluator_self_pads_coalitions(setup):
    """C=7 is not a multiple of the coalition axis (2): the evaluator must
    pad internally (repeat row 0, drop padded outputs) and match the
    single-chip result — callers never hand-align the coalition count
    (round-2 VERDICT weak #3)."""
    s = setup
    mesh = pmesh.make_mesh(n_coalition=2)
    stacked7 = jax.tree.map(lambda l: l[:7], s["stacked_lora"])
    got = make_sharded_coalition_evaluator(s["fwd"], mesh)(
        s["base"], stacked7, s["data"]
    )
    want = ev.make_coalition_evaluator(s["fwd"])(s["base"], stacked7, s["data"])
    assert got.shape == (7, 2)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_sharded_evaluator_remainder_batch(setup):
    """A validation batch whose size is not a multiple of the data axis is
    padded with zero-weighted rows — accuracy/loss must match the
    single-chip result exactly."""
    s = setup
    rng = np.random.default_rng(3)
    images = rng.normal(size=(13, 16, 16, 3)).astype(np.float32)
    labels = rng.integers(0, 4, size=13)
    data = [(images[:8], labels[:8]), (images[8:], labels[8:])]  # batch of 5
    mesh = pmesh.make_mesh(n_coalition=2)  # data axis = 4; 5 % 4 != 0
    got = make_sharded_coalition_evaluator(s["fwd"], mesh)(
        s["base"], s["stacked_lora"], data, dataset_size=13
    )
    want = ev.make_coalition_evaluator(s["fwd"])(
        s["base"], s["stacked_lora"], data, dataset_size=13
    )
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
    # pre-sharded triples (the serve fast path) give the same answer
    pre = shard_batches(mesh, data)
    got2 = make_sharded_coalition_evaluator(s["fwd"], mesh)(
        s["base"], s["stacked_lora"], pre, dataset_size=13
    )
    np.testing.assert_allclose(got2, want, atol=1e-5, rtol=1e-5)


def test_shard_batches_carries_real_example_count(setup):
    """shard_batches records the host-side example count, and evaluate()
    with dataset_size=None uses it instead of reading back mesh-sharded
    weights arrays (round-3 advice: np.asarray on a sharded weights array
    raises across processes). Weighted rows count by weight."""
    s = setup
    rng = np.random.default_rng(3)
    images = rng.normal(size=(13, 16, 16, 3)).astype(np.float32)
    labels = rng.integers(0, 4, size=13)
    data = [(images[:8], labels[:8]), (images[8:], labels[8:])]
    mesh = pmesh.make_mesh(n_coalition=2)
    pre = shard_batches(mesh, data)
    assert pre.real_examples == 13.0
    got = make_sharded_coalition_evaluator(s["fwd"], mesh)(
        s["base"], s["stacked_lora"], pre
    )
    want = ev.make_coalition_evaluator(s["fwd"])(
        s["base"], s["stacked_lora"], data, dataset_size=13
    )
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
    # weighted triples: the count is the weight sum, captured pre-sharding
    wdata = [
        (images[:8], labels[:8], np.full(8, 0.5, np.float32)),
        (images[8:], labels[8:], np.ones(5, np.float32)),
    ]
    assert shard_batches(mesh, wdata).real_examples == 9.0


def test_sharded_evaluator_chunked_and_bucketed(setup):
    """coalition_chunk / pad_buckets / shape_hints carry over to the sharded
    evaluator with single-chip semantics."""
    s = setup
    mesh = pmesh.make_mesh(n_coalition=2)
    sharded = make_sharded_coalition_evaluator(
        s["fwd"], mesh, coalition_chunk=3, pad_buckets=True, shape_hints=(7,)
    )
    got = sharded(s["base"], s["stacked_lora"], s["data"])
    want = ev.make_coalition_evaluator(s["fwd"])(s["base"], s["stacked_lora"], s["data"])
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_eval_backend_gating_and_equivalence(setup):
    """make_eval_backend: one device -> single-chip evaluator (mesh None);
    many devices -> sharded; dist.mesh='off' forces single-chip. Both
    layouts produce the same utilities and single-model metrics."""
    s = setup
    ds = ArrayDataset(
        images=np.asarray(
            np.concatenate([b[0] for b in s["data"]]), dtype=np.float32
        ),
        labels=np.asarray(np.concatenate([b[1] for b in s["data"]])),
    )
    one = make_eval_backend(s["fwd"], devices=jax.devices()[:1])
    assert one.mesh is None
    off = make_eval_backend(s["fwd"], dist_cfg=DistConfig(mesh="off"))
    assert off.mesh is None
    many = make_eval_backend(s["fwd"], dist_cfg=DistConfig(mesh_coalition_shards=2))
    assert many.mesh is not None and many.mesh.devices.shape == (2, 4)

    data_one = one.device_batches(ds, 8)
    data_many = many.device_batches(ds, 8)
    want = one.evaluate(s["base"], s["stacked_lora"], data_one, dataset_size=len(ds))
    got = many.evaluate(s["base"], s["stacked_lora"], data_many, dataset_size=len(ds))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    lora = jax.tree.map(lambda l: l[0], s["stacked_lora"])
    a1 = one.evaluate_single(s["base"], lora, data_one, dataset_size=len(ds))
    a2 = many.evaluate_single(s["base"], lora, data_many, dataset_size=len(ds))
    np.testing.assert_allclose(a1, a2, atol=1e-5, rtol=1e-5)

    with pytest.raises(ValueError):
        make_eval_backend(s["fwd"], dist_cfg=DistConfig(mesh="sometimes"))
    with pytest.raises(ValueError):
        make_eval_backend(s["fwd"], dist_cfg=DistConfig(mesh_coalition_shards=3))


def test_autoshape_chooser():
    """choose_coalition_shards: minimal padded work first, then largest
    per-device batch; memory filter discards oversized residency; knob
    semantics documented in BENCH_NOTES round 4."""
    from shapley_vit_tpu.parallel.autoshape import choose_coalition_shards

    # C=7, D=8, B=128: pure DP is genuinely work-minimal (7*16=112 < 128)
    assert choose_coalition_shards(8, 7, 128).n_coalition == 1
    # C=8: every split does equal padded work -> largest per-device batch
    c = choose_coalition_shards(8, 8, 128)
    assert c.n_coalition == 8 and c.batch_per_device == 128
    # C=12 (the default chunk): ties at k in {1,2,4} -> k=4 (3 x 64)
    c = choose_coalition_shards(8, 12, 128)
    assert (c.n_coalition, c.coalitions_per_device, c.batch_per_device) == (4, 3, 64)
    # memory filter: 1GB budget, 300MB/coalition -> k=1 (12 resident) is
    # infeasible; k=4 (3 resident, 900MB) is the work-minimal fit
    c = choose_coalition_shards(
        8, 12, 128, coalition_bytes=300_000_000, hbm_bytes=1_000_000_000
    )
    assert c.n_coalition == 4 and "within budget" in c.rationale
    # nothing fits -> still returns a choice, with a warning rationale
    c = choose_coalition_shards(
        8, 12, 128, coalition_bytes=10**10, hbm_bytes=1_000_000_000
    )
    assert "WARNING" in c.rationale


def test_eval_backend_auto_mesh_from_hints(setup):
    """make_eval_backend auto-selects the coalition split from workload
    hints (mesh_coalition_shards=0), stays pure-DP without hints, honors an
    operator override, and the chosen shape matches single-chip results."""
    s = setup
    ds = ArrayDataset(
        images=np.asarray(
            np.concatenate([b[0] for b in s["data"]]), dtype=np.float32
        ),
        labels=np.asarray(np.concatenate([b[1] for b in s["data"]])),
    )
    logs = []
    # no hints -> pure data-parallel, as before
    plain = make_eval_backend(s["fwd"], log_fn=logs.append)
    assert plain.mesh is not None and plain.mesh.devices.shape == (1, 8)
    # hints: C=8 powerset, batch 16 -> auto picks 8x1 (equal work, max batch)
    auto = make_eval_backend(
        s["fwd"], log_fn=logs.append, typical_coalitions=8, eval_batch=16
    )
    assert auto.mesh.devices.shape == (8, 1)
    assert any("padded work" in m for m in logs)
    # operator override wins over hints
    forced = make_eval_backend(
        s["fwd"],
        dist_cfg=DistConfig(mesh_coalition_shards=2),
        typical_coalitions=8,
        eval_batch=16,
    )
    assert forced.mesh.devices.shape == (2, 4)
    # the auto-chosen shape computes the same utilities as one chip
    one = make_eval_backend(s["fwd"], devices=jax.devices()[:1])
    d1, da = one.device_batches(ds, 16), auto.device_batches(ds, 16)
    want = one.evaluate(s["base"], s["stacked_lora"], d1, dataset_size=len(ds))
    got = auto.evaluate(s["base"], s["stacked_lora"], da, dataset_size=len(ds))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_multi_client_train_step_sharded(setup):
    s = setup
    spec = s["spec"]
    mesh = pmesh.make_mesh(n_coalition=2)
    n_clients, B = 4, 8
    lora0 = jvit.init_lora(jax.random.key(2), spec)
    stacked = tm.tree_stack([lora0] * n_clients)
    opt = optax.sgd(1e-2)
    opt_state = jax.vmap(opt.init)(stacked)
    step = tr.make_multi_client_train_step(s["fwd"], opt, spec.num_classes)

    cshard = NamedSharding(mesh, P("coalition"))
    cdshard = NamedSharding(mesh, P("coalition", "data"))
    rng = np.random.default_rng(1)
    images = jax.device_put(
        rng.normal(size=(n_clients, B, 16, 16, 3)).astype(np.float32), cdshard
    )
    labels = jax.device_put(rng.integers(0, 4, size=(n_clients, B)), cdshard)
    keys = jax.device_put(jax.random.split(jax.random.key(0), n_clients), cshard)
    lora_d = jax.tree.map(lambda x: jax.device_put(x, cshard), stacked)
    opt_d = jax.tree.map(lambda x: jax.device_put(x, cshard), opt_state)

    new_lora, new_opt, losses = step(s["base"], lora_d, opt_d, images, labels, keys)
    assert losses.shape == (n_clients,)
    assert np.isfinite(np.asarray(losses)).all()
    # params actually moved
    delta = tm.tree_sub(new_lora, lora_d)
    total = sum(float(np.abs(np.asarray(x)).sum()) for x in jax.tree.leaves(delta))
    assert total > 0


def test_train_step_reduces_loss(setup):
    s = setup
    spec = s["spec"]
    base = s["base"]
    lora = jvit.init_lora(jax.random.key(4), spec)
    opt = optax.adam(1e-2)
    opt_state = opt.init(lora)
    step = tr.make_train_step(s["fwd"], opt, spec.num_classes)
    rng = np.random.default_rng(2)
    images = rng.normal(size=(16, 16, 16, 3)).astype(np.float32)
    labels = rng.integers(0, 4, size=16)
    key = jax.random.key(0)
    losses = []
    for i in range(30):
        key, sub = jax.random.split(key)
        lora, opt_state, loss = step(base, lora, opt_state, images, labels, sub)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, losses[::10]


def test_label_flip_fixture():
    key = jax.random.key(0)
    labels = np.zeros(1000, dtype=np.int32)
    flipped = np.asarray(tr.label_flip(key, labels, 4, 0.5))
    frac = (flipped != 0).mean()
    # p=0.5 flip to uniform over 4 classes: expect ~0.5 * 3/4 = 0.375 changed
    assert 0.3 < frac < 0.45
    same = np.asarray(tr.label_flip(key, labels, 4, 0.0))
    np.testing.assert_array_equal(same, labels)


@pytest.mark.parametrize("n_coalition,C,sizes", [
    (2, 1, (8,)),          # C below the axis size
    (2, 5, (8, 8)),        # odd C, clean batches
    (4, 3, (16,)),         # C < axis, one batch
    (4, 6, (7, 9, 3)),     # every batch a different non-multiple size
    (8, 2, (5,)),          # C << axis, tiny odd batch
    (1, 8, (6, 6, 1)),     # pure data-parallel, 1-row tail batch
])
def test_sharded_evaluator_shape_sweep(setup, n_coalition, C, sizes):
    """Randomized shape sweep of the self-padding machinery: any
    (coalition count, batch sizes, mesh split) combination must reproduce
    the single-chip result — no caller-side alignment anywhere."""
    s = setup
    mesh = pmesh.make_mesh(n_coalition=n_coalition)
    rng = np.random.default_rng(C * 100 + n_coalition)
    total = sum(sizes)
    images = rng.normal(size=(total, 16, 16, 3)).astype(np.float32)
    labels = rng.integers(0, 4, size=total)
    data, ofs = [], 0
    for b in sizes:
        data.append((images[ofs : ofs + b], labels[ofs : ofs + b]))
        ofs += b
    stacked = jax.tree.map(lambda l: l[:C], s["stacked_lora"])
    got = make_sharded_coalition_evaluator(s["fwd"], mesh)(
        s["base"], stacked, data, dataset_size=total
    )
    want = ev.make_coalition_evaluator(s["fwd"])(
        s["base"], stacked, data, dataset_size=total
    )
    assert got.shape == (C, 2)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_autoshape_zero_or_negative_budget_still_filters():
    """hbm <= model bytes means NO coalition budget: every split must be
    infeasible (warning rationale), not silently pass the filter (the old
    `not budget` treated budget==0 as 'filter disabled' — round-4 review)."""
    from shapley_vit_tpu.parallel.autoshape import choose_coalition_shards

    # budget exactly 0
    c = choose_coalition_shards(
        8, 12, 128, coalition_bytes=1_000_000,
        hbm_bytes=1_000_000_000, model_bytes=1_000_000_000,
    )
    assert "WARNING" in c.rationale and "no coalition budget" in c.rationale
    # budget negative: the message must name the model/hbm figures, not
    # print a nonsensical negative-GB budget
    c = choose_coalition_shards(
        8, 12, 128, coalition_bytes=1_000_000,
        hbm_bytes=1_000_000_000, model_bytes=2_000_000_000,
    )
    assert "no coalition budget" in c.rationale and "-" not in c.rationale.split("WARNING")[1].split("GB")[0]


def test_coalition_residency_accounts_merged_fold():
    """eval_mode='merged' adds the folded dense q/v kernels
    (2·depth·hidden² compute-dtype bytes) — previously a dead parameter the
    only caller worked around by hand (round-4 review)."""
    import jax.numpy as jnp

    from shapley_vit_tpu.models import vit as jvit
    from shapley_vit_tpu.parallel.autoshape import coalition_residency_bytes

    spec = jvit.make_spec("micro", num_classes=2, dtype="bfloat16")
    lora = jvit.init_lora(jax.random.key(0), spec)
    overlay = coalition_residency_bytes(lora)
    merged = coalition_residency_bytes(lora, eval_mode="merged", spec=spec)
    itemsize = jnp.dtype("bfloat16").itemsize
    assert merged == overlay + 2 * spec.depth * spec.hidden**2 * itemsize
    with pytest.raises(ValueError):
        coalition_residency_bytes(lora, eval_mode="merged")  # spec required
    assert coalition_residency_bytes(None) is None


def test_sharded_evaluator_replicates_base_once(setup):
    """The frozen base tree must be broadcast to the mesh ONCE per distinct
    tree, not on every evaluate() call (172MB/call for ViT-B — round-4
    review). Identity-keyed: a different tree replaces the cache slot."""
    import shapley_vit_tpu.parallel.coalition_eval as ce

    s = setup
    calls = {"n": 0}
    real = ce.put_replicated

    def counting(mesh, tree):
        calls["n"] += 1
        return real(mesh, tree)

    old = ce.put_replicated
    ce.put_replicated = counting
    try:
        mesh = pmesh.make_mesh(n_coalition=2)
        sharded = make_sharded_coalition_evaluator(s["fwd"], mesh)
        r1 = sharded(s["base"], s["stacked_lora"], s["data"])
        r2 = sharded(s["base"], s["stacked_lora"], s["data"])
        assert calls["n"] == 1  # second call hit the identity cache
        np.testing.assert_allclose(r1, r2, atol=0, rtol=0)
        # a NEW tree must re-replicate (and produce fresh results)
        base2 = jax.tree.map(lambda a: a + 0.0, s["base"])
        sharded(base2, s["stacked_lora"], s["data"])
        assert calls["n"] == 2
    finally:
        ce.put_replicated = old


def test_sharded_evaluator_accepts_none_weight_triples(setup):
    """(images, labels, None) triples — the exact shape shard_batches
    accepts — must evaluate like pairs, not crash on None weights."""
    s = setup
    mesh = pmesh.make_mesh(n_coalition=2)
    sharded = make_sharded_coalition_evaluator(s["fwd"], mesh)
    triples = [(x, y, None) for x, y in s["data"]]
    got = sharded(s["base"], s["stacked_lora"], triples)
    want = sharded(s["base"], s["stacked_lora"], s["data"])
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-6)


def test_sharded_batches_has_no_zero_default():
    """A hand-built ShardedBatches with no count set must read as 'count
    unknown' (None fallback), never as 0.0 examples (inf/nan metrics)."""
    from shapley_vit_tpu.parallel.coalition_eval import ShardedBatches

    assert getattr(ShardedBatches(), "real_examples", None) is None


def test_sharded_chunk_not_an_axis_multiple_stays_correct(setup):
    """A coalition_chunk that is not a multiple of the coalition axis is
    rounded DOWN (the memory cap must hold under padding) and results stay
    identical to unchunked."""
    s = setup
    mesh = pmesh.make_mesh(n_coalition=2)
    plain = make_sharded_coalition_evaluator(s["fwd"], mesh)
    chunked = make_sharded_coalition_evaluator(s["fwd"], mesh, coalition_chunk=3)
    got = chunked(s["base"], s["stacked_lora"], s["data"])
    want = plain(s["base"], s["stacked_lora"], s["data"])
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_tree_allclose_checks_structure():
    x = np.ones(3)
    assert not tm.tree_allclose({"a": x, "b": x}, [x, x])
    assert not tm.tree_allclose({"a": x}, {"b": x})
    assert tm.tree_allclose({"a": x}, {"a": x.copy()})


def test_init_lora_uses_peft_bound():
    """peft's kaiming_uniform_(a=sqrt(5)) bound is sqrt(1/fan_in) — not the
    generic sqrt(6/fan_in), which is 2.45x larger (round-4 review)."""
    spec = jvit.make_spec("micro")
    lora = jvit.init_lora(jax.random.key(0), spec)
    D = spec.hidden
    bound = np.sqrt(1.0 / D)
    for name in ("q", "v"):
        A = np.asarray(lora["lora"][name]["A"])
        assert np.abs(A).max() <= bound + 1e-7
        assert np.abs(A).max() > 0.8 * bound  # actually fills the range
