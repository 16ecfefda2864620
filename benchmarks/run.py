"""Benchmark-suite runner — the five BASELINE.json configs + extensions.

  1  ViT-Tiny/16,  CIFAR-10,  3 clients, exact Shapley (8 coalitions)
  2  ViT-Small/16, CIFAR-100, 5 clients, exact Shapley, batched eval
  3  ViT-B/16,     ImageNet-subset shapes, 8 clients, permutation-MC Shapley
  4  ViT-B/16,     10 clients non-IID Dirichlet, truncated-MC (GTG)
  5  ViT-L/16,     16 clients, group-testing (Fed-SV) approximation
  6  ViT-B/16,     3 clients, FULL-model (whole-tree) deltas, exact Shapley
  7  ViT-B/16,     3 clients, fused multi-client LoRA training throughput

Each config builds synthetic client deltas at the real model shapes, runs the
estimator over ONE batched coalition-eval primitive, and prints a JSON line
with wall-clock, distinct coalition evaluations, and coalition-evals/s.

Usage: python benchmarks/run.py --config 1 [--val-size 256] [--batch 128]
       python benchmarks/run.py --all
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CONFIGS = {
    1: dict(variant="tiny", image=32, classes=10, clients=3, estimator="exact"),
    2: dict(variant="small", image=32, classes=100, clients=5, estimator="exact"),
    # configs 3-5 stay bf16: int8 q/k/v/fc1 MEASURED SLOWER on all three
    # (3: 6.50->6.03, 4: 5.88->5.72, 5: 2.10->1.97 evals/s) — the headline
    # bench's +8% does not transfer to these chunk shapes / estimators
    # (BENCH_NOTES.md round 2, "where int8 pays")
    3: dict(variant="base", image=224, classes=1000, clients=8, estimator="monte_carlo", mc_m=20),
    4: dict(variant="base", image=224, classes=4, clients=10, estimator="gtg", dirichlet=0.3),
    5: dict(variant="large", image=224, classes=4, clients=16, estimator="fed_sv"),
    # whole-model deltas (the reference's full state-dict aggregation,
    # utils.py:735-749) — coalition axis carries complete ViT-B trees,
    # chunked to bound HBM residency. Full-delta eval is WEIGHT-bandwidth
    # bound (each batch re-reads every coalition's 86M params), so it runs
    # the largest batch that fits to amortize weight traffic.
    # the production fast-eval int8 mode applies here too
    # (tools/full_delta_profile.py: 3.89 -> 4.48 evals/s; materialization
    # itself is <40ms/round, not the cost)
    6: dict(variant="base", image=224, classes=4, clients=3, estimator="exact",
            full_delta=True, batch=512, quant=True),
    # the training path: all clients' local LoRA steps fused in one vmapped
    # program (fl/training.make_multi_client_train_step) — fwd+bwd+update
    7: dict(variant="base", image=224, classes=4, clients=3, estimator="train",
            batch=64),
    # the large-n frontier (round-3 VERDICT next #1): the reference is capped
    # at n=3; scaling the CLIENT axis is where the TPU rebuild must prove the
    # host-side scoring stays negligible. Runs comp-contrib at the live-path
    # m=50n, the adaptive-budget variant, and permutation-MC, with utility-
    # table persistence ON (checkpointed_game, the serve() configuration),
    # and reports the TPU-eval vs host-scoring wall split per estimator.
    8: dict(variant="base", image=224, classes=4, clients=32,
            estimator="large_n"),
}


def _make_synthetic_deltas(root, n: int, seed: int):
    """Stacked per-client synthetic delta trees (0.02-scale keyed normals)
    over ``root``'s structure — ONE definition shared by configs 1-7 and
    the large-n config so their inputs can never silently diverge."""
    import jax

    from shapley_vit_tpu.ops import tree_math as tm

    leaves, treedef = jax.tree.flatten(root)
    deltas = [
        treedef.unflatten([
            0.02 * jax.random.normal(k, l.shape)
            for k, l in zip(
                jax.random.split(jax.random.key(seed + 10 + i), len(leaves)),
                leaves,
            )
        ])
        for i in range(n)
    ]
    return tm.tree_stack(deltas)


def run_config(idx: int, val_size: int, batch: "int | None" = None, seed: int = 0,
               eval_mode: str = "overlay", clients: "int | None" = None,
               families: str = "core") -> dict:
    import jax

    # persistent executable cache: MC estimators submit several coalition-
    # batch shapes; re-runs and repeated shapes skip the remote compile
    from shapley_vit_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

    from shapley_vit_tpu.fl import evaluation as ev
    from shapley_vit_tpu.models import vit as jvit
    from shapley_vit_tpu.ops import tree_math as tm
    from shapley_vit_tpu.shapley import (
        Fed_SV,
        GTG,
        Game,
        shapley_exact,
        shapley_monte_carlo,
    )

    cfg = CONFIGS[idx]
    n = clients if clients is not None else cfg["clients"]
    # explicit CLI --batch wins; else the per-config default (full-delta
    # wants 512 to amortize weight traffic); else 128
    batch = batch if batch is not None else cfg.get("batch", 128)
    spec = jvit.make_spec(
        cfg["variant"], image=cfg["image"], num_classes=cfg["classes"],
        dtype="bfloat16" if jax.default_backend() == "tpu" else "float32",
    )
    base = jvit.init_vit(jax.random.key(seed), spec)
    lora0 = jvit.init_lora(jax.random.key(seed + 1), spec, classifier_from=base)

    if cfg["estimator"] == "train":
        return _run_train_config(idx, cfg, spec, base, lora0, n, batch, seed)
    if cfg["estimator"] == "large_n":
        return _run_large_n_config(idx, cfg, spec, base, lora0, n, batch, seed,
                                   val_size, families=families)
    # full_delta: deltas over the WHOLE base tree (the reference's complete
    # state-dict aggregation, utils.py:735-749) instead of the LoRA overlay
    delta_root = base if cfg.get("full_delta") else lora0
    stacked = _make_synthetic_deltas(delta_root, n, seed)

    # client data sizes: uniform, or Dirichlet-skewed for config 4
    if cfg.get("dirichlet"):
        sizes = (
            np.random.default_rng(seed).dirichlet([cfg["dirichlet"]] * n) * 10000 + 10
        ).astype(int).tolist()
    else:
        sizes = [1000] * n

    rng = np.random.default_rng(seed)
    host_images = rng.normal(size=(val_size, spec.image, spec.image, 3)).astype(
        np.float32
    )
    host_labels = rng.integers(0, spec.num_classes, size=val_size)

    # chunk the coalition axis when C can exceed HBM: MC estimators touch
    # ~m*n distinct coalitions; 224px ViT activations at batch 128 allow
    # roughly 16-24 coalition models resident at once on a 16GB v5e
    act_mult = 20.0 * (3.6 if cfg["variant"] == "large" else 1.0)
    chunk = ev.suggest_coalition_chunk(
        spec.seq_len, spec.hidden, batch, activation_multiplier=act_mult
    )
    mat = jax.jit(tm.materialize_coalitions)

    # forward mode only — materialization/aggregation math stays f32
    # 'highest' (the SV parity bar); int8 carries the same trained-model
    # argmax-agreement contract as bench.py (tools/quant_agreement.py)
    eval_spec = (
        spec.replace(quant="int8", quant_targets=jvit.INT8_TARGETS)
        if cfg.get("quant")
        else spec
    )

    if cfg.get("full_delta"):
        # the coalition axis carries COMPLETE model trees (86M params each
        # for ViT-B); chunk by weight residency too: C compute-dtype trees
        # must fit alongside activations. Materialized trees are cast to the
        # compute dtype ONCE — re-reading f32 weights per batch doubles the
        # HBM traffic that dominates this config.
        import jax.numpy as jnp

        itemsize = jnp.dtype(spec.compute_dtype).itemsize
        params_bytes = sum(x.size for x in jax.tree.leaves(base)) * itemsize
        chunk = max(1, min(chunk, int(6e9 / params_bytes)))
    # device-count-gated mesh sharding (parallel.make_eval_backend): one
    # chip runs the single-chip evaluator unchanged; a v5e-8 shards the
    # batch over the mesh's data axis — same gate as the production drivers
    from shapley_vit_tpu.data.arrays import ArrayDataset
    from shapley_vit_tpu.parallel.coalition_eval import make_eval_backend

    if cfg.get("full_delta"):
        mat_cast = jax.jit(
            lambda b, s, W: jax.tree.map(
                lambda a: a.astype(spec.compute_dtype),
                tm.materialize_coalitions(b, s, W),
            )
        )
        backend = make_eval_backend(
            lambda _s, v, x: jvit.vit_forward(v, None, x, eval_spec),
            coalition_chunk=chunk,
        )
        data = backend.device_batches(
            ArrayDataset(images=host_images, labels=host_labels), batch
        )

        def eval_fn(W):
            # slice the materialization like merged mode does: each
            # coalition here is a COMPLETE compute-dtype model tree
            # (~172MB for ViT-B bf16), so a wide W — e.g. the exact
            # estimator's full powerset at --clients 8 (255 coalitions,
            # ~44GB) — must never materialize in one mat_cast call; the
            # chunk cap above bounds only the backend's EVAL chunking
            C = len(W)
            if not chunk or C <= chunk:
                return backend.evaluate(
                    {}, mat_cast(base, stacked, W), data, dataset_size=val_size
                )
            return np.concatenate([
                backend.evaluate(
                    {}, mat_cast(base, stacked, W[s : s + chunk]), data,
                    dataset_size=val_size,
                )
                for s in range(0, C, chunk)
            ], axis=0)

    elif eval_mode == "merged":
        # the drivers' default execution (model.eval_mode="merged"): LoRA
        # folded into dense per-coalition q/v kernels — measured +9% at the
        # C=7/batch-128 service shape (tools/merged_probe.py); this flag
        # measures it at the MC/GTG/Fed-SV chunk shapes
        backend = make_eval_backend(
            lambda b, m, x: jvit.vit_forward_merged(b, m, x, eval_spec),
            coalition_chunk=chunk,
        )
        data = backend.device_batches(
            ArrayDataset(images=host_images, labels=host_labels), batch
        )
        matm = jax.jit(
            lambda b, o, s, W: jvit.merge_coalition_weights(
                b, tm.materialize_coalitions(o, s, W), eval_spec
            )
        )

        def eval_fn(W):
            # slice the materialization: folded trees cost ~2·L·D² bytes
            # per coalition and must not all exist at once for large W
            C = len(W)
            if not chunk or C <= chunk:
                return backend.evaluate(
                    base, matm(base, lora0, stacked, W), data, dataset_size=val_size
                )
            return np.concatenate([
                backend.evaluate(
                    base, matm(base, lora0, stacked, W[s : s + chunk]), data,
                    dataset_size=val_size,
                )
                for s in range(0, C, chunk)
            ], axis=0)

    else:
        # NOTE: pad_buckets measured a wash here — each coalition eval is
        # ~0.2s of ViT compute, so varying-C recompiles are amortized by the
        # remote compiler's own cache while padding adds real work
        # (BENCH_NOTES.md round 2). Bucketing stays for the long-running
        # service where compile-cache growth matters.
        backend = make_eval_backend(
            lambda b, l, x: jvit.vit_forward(b, l, x, eval_spec),
            coalition_chunk=chunk,
        )
        data = backend.device_batches(
            ArrayDataset(images=host_images, labels=host_labels), batch
        )

        def eval_fn(W):
            return backend.evaluate(
                base, mat(lora0, stacked, W), data, dataset_size=val_size
            )

    # warm-up: compile the eval at the estimator's coalition-batch shape so
    # wall_clock_s reports steady-state throughput. Exact estimators submit
    # the FULL powerset in one call — warm that exact shape (the evaluator
    # chunks internally, so this compiles every chunk shape plus the C-wide
    # materialize). MC estimators vary C per call; warm the chunk shape.
    if cfg["estimator"] == "exact":
        warm_C = 2**n - 1
    else:
        warm_C = chunk or 1
    eval_fn(np.full((warm_C, n), 1.0 / n, dtype=np.float32))

    game = Game(
        eval_coalitions_fn=eval_fn,
        num_local_data=sizes,
        client_selection_vector=[True] * n,
        previous_utility=[0.0, 0.0],
    )

    est_rng = np.random.default_rng(seed + 99)
    t0 = time.time()
    if cfg["estimator"] == "exact":
        sv = shapley_exact(game)
    elif cfg["estimator"] == "monte_carlo":
        sv = shapley_monte_carlo(game, m=cfg.get("mc_m", 20), rng=est_rng)
    elif cfg["estimator"] == "gtg":
        gtg = GTG(utility_index=0, rng=est_rng)
        gtg.CONVERGE_MIN_K = 3 * n
        sv = [gtg.compute_shapley_value(game, t=0)]
    elif cfg["estimator"] == "fed_sv":
        fsv = Fed_SV(utility_index=0, rng=est_rng)
        fsv.CONVERGE_MIN_K = 4 * n
        sv = [fsv.compute_shapley_value(game, t=0)]
    else:
        raise ValueError(cfg["estimator"])
    wall = time.time() - t0

    return {
        "config": idx,
        "model": f"ViT-{cfg['variant']}/{spec.patch}",
        "clients": n,
        "estimator": cfg["estimator"],
        "eval_mode": "full_delta" if cfg.get("full_delta") else eval_mode,
        "val_size": val_size,
        "distinct_coalition_evals": game.num_evaluations,
        "wall_clock_s": round(wall, 2),
        "coalition_evals_per_s": round(game.num_evaluations / wall, 3) if wall > 0 else None,
        "sv_dims": len(sv),
    }


def _run_large_n_config(idx, cfg, spec, base, lora0, n, batch, seed, val_size,
                        families: str = "core") -> dict:
    """n=32-client frontier: comp-contrib (fixed m=50n AND adaptive) +
    permutation-MC over chunked LoRA-overlay eval with persistence on,
    reporting the TPU-eval vs host-scoring wall split (host share must stay
    <10% — the reference's serial scatter is utils_shapley.py:284-301)."""
    import tempfile

    import jax

    from shapley_vit_tpu.data.arrays import ArrayDataset
    from shapley_vit_tpu.fl import evaluation as ev
    from shapley_vit_tpu.fl.checkpoint import checkpointed_game
    from shapley_vit_tpu.models import vit as jvit
    from shapley_vit_tpu.ops import tree_math as tm
    from shapley_vit_tpu.parallel.coalition_eval import make_eval_backend
    from shapley_vit_tpu.shapley import Game
    from shapley_vit_tpu.shapley.estimators import (
        shapley_comp_contrib,
        shapley_comp_contrib_adaptive,
        shapley_monte_carlo,
    )

    stacked = _make_synthetic_deltas(lora0, n, seed)
    chunk = ev.suggest_coalition_chunk(spec.seq_len, spec.hidden, batch)
    mat = jax.jit(tm.materialize_coalitions)
    backend = make_eval_backend(
        lambda b, l, x: jvit.vit_forward(b, l, x, spec), coalition_chunk=chunk
    )
    rng = np.random.default_rng(seed)
    host_images = rng.normal(size=(val_size, spec.image, spec.image, 3)).astype(np.float32)
    host_labels = rng.integers(0, spec.num_classes, size=val_size)
    data = backend.device_batches(ArrayDataset(images=host_images, labels=host_labels), batch)

    eval_time = {"s": 0.0}

    def eval_fn(W):
        t0 = time.time()
        out = backend.evaluate(base, mat(lora0, stacked, W), data, dataset_size=val_size)
        eval_time["s"] += time.time() - t0
        return out

    # the compiled coalition-batch shape is min(block, chunk): the estimator
    # submits each round's coalitions in one precompute, checkpointed_game
    # splits it into ``block``-sized batches, and the evaluator chunks each
    # batch by ``chunk``. Cap the block: on tiny models the memory-derived
    # chunk is ~50k and warming/materializing that many coalition trees at
    # once is pure waste (the real-TPU ViT-B chunk is ~16-24, far below it)
    block = min(chunk or 8, 256)
    eval_fn(np.full((block, n), 1.0 / n, dtype=np.float32))  # warm block shape

    tmpdir = tempfile.mkdtemp(prefix="svt_bench8_")

    def fresh_game(tag):
        g = Game(
            eval_coalitions_fn=eval_fn,
            num_local_data=[1000] * n,
            client_selection_vector=[True] * n,
            previous_utility=[0.0, 0.0],
        )
        # persistence ON, the serve() configuration: block-wise saves sized
        # to the evaluator chunk so batch shapes match what compiles anyway
        return checkpointed_game(
            g, os.path.join(tmpdir, f"util_{tag}.npz"), block=block
        )

    m_fixed = 50 * n
    runs = {}
    est_rng = np.random.default_rng(seed + 99)

    # ``families`` is "core", "full", or a comma-list of family tags (e.g.
    # "kernel,beta_1_4") to (re-)measure a subset without paying for the
    # whole sweep — used to finish the n=64 row after the KernelSHAP
    # int64-overflow fix without re-running the ~40-min core block
    only = None
    if families not in ("core", "full"):
        only = [t.strip() for t in families.split(",") if t.strip()]

    if only is None:
        g = fresh_game("cc_fixed")
        eval_time["s"] = 0.0
        t0 = time.time()
        sv, se = shapley_comp_contrib(g, m_fixed, rng=est_rng, return_se=True)
        wall = time.time() - t0
        max_se = max(max(d.values()) for d in se)
        runs["cc_fixed_m50n"] = dict(
            m=m_fixed, evals=g.num_evaluations, wall_s=round(wall, 2),
            tpu_eval_s=round(eval_time["s"], 2),
            host_share_pct=round(100 * (wall - eval_time["s"]) / wall, 2),
            evals_per_s=round(g.num_evaluations / wall, 3),
            max_se=round(float(max_se), 5),
        )

        g = fresh_game("cc_adaptive")
        eval_time["s"] = 0.0
        t0 = time.time()
        sv, se, m_used = shapley_comp_contrib_adaptive(
            g, target_se=float(max_se), rng=np.random.default_rng(seed + 100),
            stratify="balanced", block=4 * n, max_m=m_fixed,
        )
        wall = time.time() - t0
        runs["cc_adaptive"] = dict(
            m=m_used, evals=g.num_evaluations, wall_s=round(wall, 2),
            tpu_eval_s=round(eval_time["s"], 2),
            host_share_pct=round(100 * (wall - eval_time["s"]) / wall, 2),
            evals_per_s=round(g.num_evaluations / wall, 3),
            target_se=round(float(max_se), 5),
        )

        g = fresh_game("mc")
        eval_time["s"] = 0.0
        t0 = time.time()
        shapley_monte_carlo(g, m=10, rng=np.random.default_rng(seed + 101))
        wall = time.time() - t0
        runs["mc_10perm"] = dict(
            evals=g.num_evaluations, wall_s=round(wall, 2),
            tpu_eval_s=round(eval_time["s"], 2),
            host_share_pct=round(100 * (wall - eval_time["s"]) / wall, 2),
            evals_per_s=round(g.num_evaluations / wall, 3),
        )

    if families != "core":
        runs.update(
            _run_large_n_families(fresh_game, eval_time, n, seed, only=only)
        )

    headline = runs.get("cc_fixed_m50n") or next(iter(runs.values()))
    return {
        "config": idx,
        "model": f"ViT-{cfg['variant']}/{spec.patch}",
        "clients": n,
        "estimator": "large_n",
        "val_size": val_size,
        "coalition_chunk": chunk,
        "persistence": True,
        "families": families,
        "runs": runs,
        # the headline row: live-path estimator at the live-path budget
        # (first measured family when a subset skipped the core block)
        "wall_clock_s": headline["wall_s"],
        "distinct_coalition_evals": headline["evals"],
        "coalition_evals_per_s": headline["evals_per_s"],
        "host_share_pct": headline["host_share_pct"],
    }


def _run_large_n_families(fresh_game, eval_time, n, seed, only=None) -> dict:
    """Remaining estimator families at large n (round-4 VERDICT weak #1:
    GTG/Fed-SV/Owen/KernelSHAP had never run above n=16). Budgets are sized
    to ~1-3k coalition evals per family — enough to measure steady evals/s
    and the host-scoring share, which is the scaling question. Convergence-
    driven estimators (GTG, Fed-SV) carry a hard draw cap so a slow-
    converging synthetic game cannot stall the suite."""
    from shapley_vit_tpu.shapley.compared_methods import Fed_SV, GTG
    from shapley_vit_tpu.shapley.estimators import (
        banzhaf_value,
        shapley_beta,
        shapley_kernel,
        shapley_owen,
    )

    out = {}

    def timed(tag, fn, game):
        eval_time["s"] = 0.0
        t0 = time.time()
        extra = fn(game) or {}
        wall = time.time() - t0
        out[tag] = dict(
            evals=game.num_evaluations, wall_s=round(wall, 2),
            tpu_eval_s=round(eval_time["s"], 2),
            host_share_pct=round(100 * (wall - eval_time["s"]) / max(wall, 1e-9), 2),
            evals_per_s=round(game.num_evaluations / max(wall, 1e-9), 3),
            **extra,
        )
        print(f"  large-n family {tag}: {json.dumps(out[tag])}", flush=True)

    def run_gtg(game):
        gtg = GTG(utility_index=0, rng=np.random.default_rng(seed + 102))
        cap = 4 * n  # permutations (the convergence gate usually stops at ~n)
        orig = gtg.isnotconverge
        gtg.isnotconverge = lambda k: k < cap and orig(k)
        sv, se = gtg.compute_shapley_value(game, 0, return_se=True)
        return dict(perms=len(gtg.Contribution_records),
                    max_se=round(max(se.values()), 5))

    def run_fed_sv(game):
        fsv = Fed_SV(utility_index=0, rng=np.random.default_rng(seed + 103))
        cap = 1600  # draws
        orig = fsv.isnotconverge_Group
        fsv.isnotconverge_Group = (
            lambda last, UD, k=None: (k or 0) < cap and orig(last, UD, k=k)
        )
        sv, se = fsv.compute_shapley_value(game, 0, return_se=True, n_boot=30)
        return dict(max_se=round(max(se.values()), 5))

    def run_owen(game):
        _sv, se = shapley_owen(
            game, q_num=8, m_per_q=3, rng=np.random.default_rng(seed + 104),
            return_se=True,
        )
        return dict(max_se=round(max(max(d.values()) for d in se), 5))

    def run_kernel(game):
        _sv, se = shapley_kernel(
            game, m=50 * n, rng=np.random.default_rng(seed + 105),
            return_se=True,
        )
        return dict(max_se=round(max(max(d.values()) for d in se), 5))

    def run_beta(game):
        _sv, se = shapley_beta(
            game, alpha=1.0, beta=4.0, m=16,
            rng=np.random.default_rng(seed + 106), return_se=True,
        )
        return dict(max_se=round(max(max(d.values()) for d in se), 5))

    def run_banzhaf(game):
        _sv, se = banzhaf_value(
            game, m=16, rng=np.random.default_rng(seed + 107), return_se=True,
        )
        return dict(max_se=round(max(max(d.values()) for d in se), 5))

    all_families = [
        ("gtg", run_gtg), ("fed_sv", run_fed_sv), ("owen", run_owen),
        ("kernel", run_kernel), ("beta_1_4", run_beta), ("banzhaf", run_banzhaf),
    ]
    if only is not None:
        unknown = set(only) - {t for t, _ in all_families}
        if unknown:
            raise ValueError(f"unknown family tag(s) {sorted(unknown)}; "
                             f"valid: {[t for t, _ in all_families]}")
    for tag, fn in all_families:
        if only is None or tag in only:
            timed(tag, fn, fresh_game(tag))
    return out


def _run_train_config(idx, cfg, spec, base, lora0, n, batch, seed) -> dict:
    """Multi-client fused LoRA training throughput (fwd+bwd+update)."""
    import jax
    import optax

    from shapley_vit_tpu.fl import training as tr
    from shapley_vit_tpu.ops import tree_math as tm

    # per-block remat is what makes this config FIT: without it the 3-client
    # backward pass wants 33.4G of activations on a 15.75G chip (measured);
    # checkpointing each scanned block trades recompute for memory
    rspec = spec.replace(remat=True)
    stacked = tm.tree_stack([lora0] * n)
    opt = optax.sgd(1e-2, momentum=0.9)
    opt_state = jax.vmap(opt.init)(stacked)
    step = tr.make_multi_client_train_step(
        jvit_forward_for(rspec), opt, spec.num_classes
    )

    rng = np.random.default_rng(seed)
    images = jax.device_put(
        rng.normal(size=(n, batch, spec.image, spec.image, 3)).astype(np.float32)
    )
    labels = jax.device_put(rng.integers(0, spec.num_classes, size=(n, batch)))
    keys = jax.device_put(jax.random.split(jax.random.key(seed), n))

    def one_step(lora, opt_state):
        lora, opt_state, losses = step(base, lora, opt_state, images, labels, keys)
        return lora, opt_state, np.asarray(losses)  # readback forces execution

    lora, opt_state, losses = one_step(stacked, opt_state)  # compile + warm
    reps = 10
    t0 = time.time()
    for _ in range(reps):
        lora, opt_state, losses = one_step(lora, opt_state)
    dt = (time.time() - t0) / reps
    assert np.isfinite(losses).all()
    return {
        "config": idx,
        "model": f"ViT-{cfg['variant']}/{spec.patch}",
        "clients": n,
        "estimator": "multi_client_train_step",
        "per_client_batch": batch,
        "wall_clock_s": round(dt, 4),
        "train_images_per_s": round(n * batch / dt, 1),
    }


def jvit_forward_for(spec):
    from shapley_vit_tpu.models import vit as jvit

    return lambda b, l, x: jvit.vit_forward(b, l, x, spec)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=int, choices=sorted(CONFIGS), default=1)
    p.add_argument("--all", action="store_true")
    p.add_argument("--val-size", type=int, default=256)
    # None = per-config default (config 6 wants batch 512); an explicit
    # --batch always wins
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--out", type=str, default=None)
    p.add_argument("--eval-mode", choices=("overlay", "merged"), default="overlay")
    # client-count override (config 8's n∈{8,16,32} sweep)
    p.add_argument("--clients", type=int, default=None)
    # config 8: "full" adds GTG/Fed-SV/Owen/KernelSHAP/Beta/Banzhaf rows
    # "core", "full", or a comma-list of family tags (e.g. "kernel,banzhaf")
    # to measure a subset without the core block
    p.add_argument("--families", type=str, default="core")
    args = p.parse_args()

    configs = sorted(CONFIGS) if args.all else [args.config]
    results = []
    for idx in configs:
        res = run_config(idx, args.val_size, args.batch, eval_mode=args.eval_mode,
                         clients=args.clients, families=args.families)
        print(json.dumps(res))
        results.append(res)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
