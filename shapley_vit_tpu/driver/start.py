"""The Shapley-server driver.

Reference: ``shapleyserver/start.py`` ``start()`` (start.py:248-331) +
``getInitialShapleyValue`` (start.py:82-222):

  1. load ``.env`` paths; build the OCT validation dataset;
  2. build HF ViT-base + 4-class head, wrap in LoRA (r=16, α=8, q+v,
     classifier trainable) and DataParallel;
  3. evaluate the initial global model → ``previous_utility = [acc, loss]``;
  4. seed round-0 SV as ``prev_utility/num_clients`` per client;
  5. block until all client checkpoints exist; load each, evaluate it,
     compute its weight delta vs. the initial model;
  6. build clients/server/Game and run the comp-contrib estimator.

TPU rebuild differences (behavior-preserving):
  * one functional ViT + LoRA overlay per client — the reference aliases ONE
    model object for all four roles (start.py:285-288), a bug not replicated;
  * DataParallel → device-resident validation batches + vmapped coalition
    evaluation (optionally mesh-sharded);
  * the blocking filesystem poll becomes the atomic-rename watcher with a
    configurable straggler policy (fl/ingestion.py);
  * the in-memory utility memo can persist to disk so a Shapley round is
    resumable (Game utility table → npz).
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from shapley_vit_tpu.config import Config
from shapley_vit_tpu.data.arrays import ArrayDataset
from shapley_vit_tpu.data.registry import get_dataset
from shapley_vit_tpu.fl import evaluation as ev
from shapley_vit_tpu.fl import ingestion
from shapley_vit_tpu.fl.client import EvalClient
from shapley_vit_tpu.fl.server import EvalServer
from shapley_vit_tpu.models import vit as jvit
from shapley_vit_tpu.ops import tree_math as tm
from shapley_vit_tpu.shapley import Game, run_configured_comp_contrib
from shapley_vit_tpu.utils import runtime
from shapley_vit_tpu.utils.logging import CSVLogger, get_logger

PyTree = Any


def build_model(cfg: Config, key=None):
    """ViT + LoRA construction (reference start.py:258-276). Returns
    (spec, base_params, init_lora)."""
    import jax

    key = key if key is not None else jax.random.key(0)
    # CLI surface: --model-type ViT (reference default) uses cfg's variant;
    # "ViT-<variant>" selects tiny/small/base/large/micro explicitly
    variant = cfg.model.vit_variant
    if cfg.model.model_type.lower().startswith("vit-"):
        variant = cfg.model.model_type.split("-", 1)[1].lower()
    if cfg.model.quant not in ("none", "int8"):
        raise ValueError(
            f"model.quant must be 'none' or 'int8', got {cfg.model.quant!r}"
        )
    # fail config typos at bring-up, not after minutes of model/data setup
    # and checkpoint ingestion (the round-time check in shapley_comp_contrib
    # would fire far too late for a service)
    if cfg.shapley.cc_stratify not in ("uniform", "balanced", "neyman"):
        raise ValueError(
            "shapley.cc_stratify must be 'uniform', 'balanced' or 'neyman', "
            f"got {cfg.shapley.cc_stratify!r}"
        )
    spec = jvit.make_spec(
        variant,
        num_classes=cfg.model.num_classes,
        lora_r=cfg.model.lora_r,
        lora_alpha=cfg.model.lora_alpha,
        dtype=cfg.model.compute_dtype,
        gelu=cfg.model.gelu,
        quant=cfg.model.quant,
        # the measured-best int8 target set (tools/quant_ablation.py: fc2/
        # out/patch quantization costs more than its int8 gain)
        quant_targets=jvit.INT8_TARGETS,
    )
    k1, k2 = jax.random.split(key)
    base = jvit.init_vit(k1, spec)
    lora = jvit.init_lora(k2, spec, classifier_from=base)
    return spec, base, lora


def build_eval_backend(cfg: Config, spec, base, init_lora, log_fn=None):
    """Mode-dependent evaluation surface shared by the drivers.

    ``cfg.model.eval_mode``:
      * ``"merged"`` (default) — fold each coalition's LoRA into dense q/v
        kernels before the forward (``jvit.merge_coalition_weights`` +
        ``vit_forward_merged``, bench.py's fastest configuration; measured
        +9% over the overlay path at the service protocol,
        tools/merged_probe.py). Single-model evals ride the same path as a
        C=1 stack.
      * ``"overlay"`` — the rank-16 two-matmul LoRA path (pre-round-3
        behavior).

    Returns ``(backend, eval_coalitions, chunk)`` where
    ``eval_coalitions(overlay, stacked_deltas, W, batches, dataset_size)``
    evaluates the weight matrix's coalitions, slicing the MATERIALIZATION
    by ``chunk``: the merged mode folds ~2·L·D² compute-dtype bytes per
    coalition (28MB for ViT-B) and a large ``precompute`` batch (hundreds
    of coalitions at bigger n) must never materialize all at once — the
    evaluator's own ``coalition_chunk`` only bounds the forward, not the
    folded trees feeding it. Slicing aligns the materialized working set
    with the forward's chunking (identical compiled shapes).
    """
    import jax

    from shapley_vit_tpu.parallel.coalition_eval import make_eval_backend

    n = cfg.shapley.num_clients
    chunk = cfg.shapley.coalition_chunk or ev.suggest_coalition_chunk(
        spec.seq_len, spec.hidden, cfg.data.eval_batch_size
    )
    mode = cfg.model.eval_mode
    if mode not in ("merged", "overlay"):
        raise ValueError(f"model.eval_mode must be 'merged' or 'overlay', got {mode!r}")
    if mode == "merged":
        fwd = lambda b, m, x: jvit.vit_forward_merged(b, m, x, spec)
        # base threaded as an ARGUMENT (a closure would embed 343MB of
        # weights in the compile payload — see fl/evaluation docstring)
        matm = jax.jit(
            lambda b, o, s, W: jvit.merge_coalition_weights(
                b, tm.materialize_coalitions(o, s, W), spec
            )
        )
        mat = lambda o, s, W: matm(base, o, s, W)
        zero1 = tm.tree_stack([tm.tree_zeros_like(init_lora)])
        W1 = np.zeros((1, 1), np.float32)
        stack_single = lambda overlay: mat(overlay, zero1, W1)
    else:
        fwd = lambda b, l, x: jvit.vit_forward(b, l, x, spec)
        mat = jax.jit(tm.materialize_coalitions)
        stack_single = None
    # workload hints for the auto mesh split (parallel.autoshape): the
    # dominant per-call coalition count and the per-coalition residency —
    # merged mode folds dense q/v kernels (~2·L·D² compute-dtype bytes,
    # 28MB for ViT-B) on top of the overlay; overlay mode holds the LoRA
    # trees only
    from shapley_vit_tpu.parallel.autoshape import (
        coalition_residency_bytes,
        powerset_dominant_coalitions,
    )

    cbytes = coalition_residency_bytes(init_lora, eval_mode=mode, spec=spec) or 0
    backend = make_eval_backend(
        fwd,
        coalition_chunk=chunk,
        pad_buckets=True,  # per-round coalition counts vary; bound compiles
        # no padding tax on the dominant full-powerset batches
        shape_hints=ev.powerset_shape_hints(n),
        dist_cfg=cfg.dist,
        log_fn=log_fn,
        stack_single=stack_single,
        typical_coalitions=powerset_dominant_coalitions(n, chunk),
        eval_batch=cfg.data.eval_batch_size,
        coalition_bytes=cbytes,
        model_bytes=coalition_residency_bytes(base) or 0,
    )

    def eval_coalitions(overlay, stacked_deltas, W, batches, dataset_size=None):
        C = int(np.shape(W)[0])
        if not chunk or C <= chunk:
            return backend.evaluate(
                base, mat(overlay, stacked_deltas, W), batches,
                dataset_size=dataset_size,
            )
        outs = [
            backend.evaluate(
                base, mat(overlay, stacked_deltas, W[s : s + chunk]), batches,
                dataset_size=dataset_size,
            )
            for s in range(0, C, chunk)
        ]
        return np.concatenate(outs, axis=0)

    return backend, eval_coalitions, chunk


def load_validation_dataset(cfg: Config, target_size: Optional[int] = None) -> ArrayDataset:
    """OCT validation data via the .env path (reference getOCTData2,
    start.py:51-56) with synthetic fallback for offline runs. Images are
    resized once to the model's input size (the reference resizes per-sample
    inside the DataLoader, start.py:35-38)."""
    root = cfg.paths.validation_dataset or cfg.data.data_dir
    splits, _ = get_dataset(
        "oct", data_dir=root, synthetic_ok=True, seed=cfg.shapley.seed,
        synthetic_scale=cfg.data.synthetic_scale,
    )
    ds = splits["val"]
    target = target_size or cfg.data.image_size
    if ds.images.shape[1] != target:
        import jax

        ds = ArrayDataset(
            images=np.asarray(
                jax.image.resize(
                    ds.images, (len(ds), target, target, ds.images.shape[-1]), "bilinear"
                )
            ),
            labels=ds.labels,
            names=ds.names,
            classes=ds.classes,
        )
    return ds


def get_initial_shapley_value(
    cfg: Config,
    valid: ArrayDataset,
    spec,
    base: PyTree,
    init_lora: PyTree,
    checkpoint_paths: Optional[List[str]] = None,
    csv_logger: Optional[CSVLogger] = None,
) -> Tuple[List[List[Dict[int, float]]], List[Dict[int, float]]]:
    """Round bootstrap + first Shapley round (reference start.py:82-222)."""
    logger = get_logger()
    n = cfg.shapley.num_clients
    utility_dim = cfg.shapley.utility_dim

    # device-count-gated mesh sharding (the reference's always-on
    # DataParallel, start.py:283, done TPU-right) + eval_mode selection
    # (merged LoRA folding, measured +9%)
    backend, eval_coalitions, chunk = build_eval_backend(
        cfg, spec, base, init_lora, log_fn=logger.info
    )
    data = backend.device_batches(valid, cfg.data.eval_batch_size)

    # step 3: initial global utility (start.py:84-96)
    fed_valid_acc, fed_valid_loss = backend.evaluate_single(
        base, init_lora, data, dataset_size=len(valid)
    )
    previous_utility = [fed_valid_acc, fed_valid_loss]
    logger.info(f"Previous utility: {previous_utility}")

    # step 4: round-0 seed SV (start.py:104-106)
    shapley_value_all_rounds: List[List[Dict[int, float]]] = [[] for _ in range(utility_dim)]
    shapley_value_sum: List[Dict[int, float]] = [{} for _ in range(utility_dim)]
    for i in range(utility_dim):
        shapley_value_all_rounds[i].append(
            {cid: previous_utility[i] / n for cid in range(n)}
        )
        shapley_value_sum[i] = dict(shapley_value_all_rounds[i][0])

    # step 5: wait for + ingest client checkpoints (start.py:134-164)
    if checkpoint_paths is None:
        root = cfg.paths.local_model_path or os.path.join(os.getcwd(), "local_training")
        # accept the reference's .pth.tar OR svt-client's .npz per client
        checkpoint_paths = ingestion.checkpoint_path_candidates(root, n)
    # resume runs block indefinitely (checkpoints are known to exist); fresh
    # runs bound the wait at an hour and fail loudly — under policy='wait'
    # the timeout is ignored, so 'fail' is required for the bound to be real
    watch = ingestion.wait_for_checkpoints(
        checkpoint_paths,
        timeout=None if cfg.train.resume else 3600.0,
        policy="wait" if cfg.train.resume else "fail",
        log_fn=logger.info,
    )
    deltas, selection, sizes = ingestion.ingest_clients(watch.paths, init_lora, spec)
    # num_local_data_train comes from checkpoint metadata and drives the
    # FedAvg data-size ratios (reference server2.py:68-81); partial metadata
    # degrades the whole round to equal weights (see ingestion)
    weights = ingestion.resolve_data_sizes(sizes, selection, logger.info)

    # per-client standalone evaluation (start.py:157-161, logged not used)
    clients: List[EvalClient] = []
    local_metrics = []
    for cid, delta in enumerate(deltas):
        n_local = int(weights[cid])
        if delta is None:
            clients.append(EvalClient(cid, num_local_data_train=n_local))
            continue
        client_lora = tm.tree_add(init_lora, delta)
        acc, loss = backend.evaluate_single(
            base, client_lora, data, dataset_size=len(valid)
        )
        local_metrics.append((cid, acc, loss))
        logger.info(f"Client {cid}: accuracy={acc} loss={loss}")
        clients.append(
            EvalClient(cid, num_local_data_train=n_local, delta=delta)
        )
    if csv_logger is not None:
        for cid, acc, loss in local_metrics:
            csv_logger.log(["client_eval", cid, acc, loss])

    # step 6: game + estimator (start.py:172-189). Deltas are host numpy
    # trees (ingestion); stack on the host and upload the [n, ...] tree in
    # one batched device_put (n_leaves transfers, not n·n_leaves — the
    # serving path's ingest lesson, BENCH_NOTES round 4)
    import jax

    zeros_host = jax.tree.map(
        lambda x: np.zeros_like(np.asarray(x)), init_lora
    )
    stacked = jax.device_put(
        tm.tree_stack_host(
            [d if d is not None else zeros_host for d in deltas]
        )
    )

    def eval_coalitions_fn(W: np.ndarray) -> np.ndarray:
        return eval_coalitions(init_lora, stacked, W, data, dataset_size=len(valid))

    game = Game(
        eval_coalitions_fn=eval_coalitions_fn,
        num_local_data=[c.num_local_data_train for c in clients],
        client_selection_vector=selection,
        previous_utility=previous_utility,
        utility_dim=utility_dim,
        n_all=n,
    )
    # resumable utility table (SURVEY.md §5 checkpoint/resume): persist the
    # memo after every batched evaluation and reseed a restarted round from
    # it — ONLY when the table's input fingerprint matches this round's
    # deltas/weights/baseline (a stale table would corrupt the SVs)
    if cfg.shapley.persist_utility_table:
        from shapley_vit_tpu.fl import checkpoint as ckpt

        fp = ckpt.fingerprint_inputs(
            stacked,
            extra=(
                [c.num_local_data_train for c in clients],
                selection,
                [f"{u:.12g}" for u in previous_utility],
            ),
        )
        table_path = os.path.join(cfg.ensure_output_dir(), "utility_table.npz")
        if ckpt.utility_table_exists(table_path):
            restored = ckpt.resume_game(game, table_path, fingerprint=fp)
            if restored:
                logger.info(f"resumed {restored} coalition utilities from {table_path}")
        ckpt.checkpointed_game(game, table_path, fingerprint=fp, block=chunk or 8)
    server = EvalServer(base, clients, valid_batches=data, valid_size=len(valid))  # noqa: F841 (parity object)

    from shapley_vit_tpu.utils.profiling import StepTimer, trace

    timer = StepTimer()
    rng = np.random.default_rng(cfg.shapley.seed)
    with trace(cfg.obs.profile_dir, enabled=cfg.obs.profile):
        with timer.span("shapley_round"):
            shapley_value, _sv_se = run_configured_comp_contrib(
                game, cfg.shapley, rng=rng, logger=logger
            )
    # completed round -> one self-contained npz (consolidates the append-log)
    flush_table = getattr(game, "flush_table", None)
    if flush_table is not None:
        flush_table()
    stats = timer.summary()["shapley_round"]
    logger.info(
        f"Shapley round: {stats['total_s']:.2f}s, "
        f"{game.num_evaluations} distinct coalition evals "
        f"({game.num_evaluations / max(stats['total_s'], 1e-9):.2f}/s)"
    )
    if csv_logger is not None:
        timer.log_to(csv_logger, step=1)

    # the post-round FedAvg global overlay: exported to GLOBAL_MODEL_PATH
    # (the .env contract's third path — the reference's out-of-repo FL loop
    # reads the global model from there) and used for saliency overlays
    participating = [i for i, s in enumerate(selection) if s]
    global_overlay = init_lora
    # the aggregation costs ~50 unjitted per-leaf dispatches — only pay it
    # when something consumes the result (export and/or saliency)
    if participating and (cfg.paths.global_model_path or cfg.obs.use_grad_cam):
        ratio = tm.fedavg_ratio(
            [clients[i].num_local_data_train for i in participating]
        )
        agg = tm.aggregate_deltas(
            tm.tree_stack([deltas[i] for i in participating]), ratio
        )
        global_overlay = tm.apply_deltas(init_lora, agg)
        if cfg.paths.global_model_path:
            ingestion.save_lora_checkpoint(
                os.path.join(cfg.paths.global_model_path, "ViT_global.npz"),
                global_overlay,
                spec,
            )
    if cfg.obs.use_grad_cam:
        from shapley_vit_tpu.driver import report as report_mod

        # Grad-CAM of the round's global model on sample validation images
        # (reference --use-grad-cam/--sal-image-fname-dir, unwired there)
        p = report_mod.render_saliency(
            os.path.join(cfg.obs.sal_image_dir, cfg.obs.exp_id),
            base, global_overlay, valid.images, spec, round_idx=1,
        )
        logger.info(f"saliency overlays: {p}")

    for i in range(utility_dim):
        shapley_value_all_rounds[i].append(shapley_value[i])
        for cid, v in shapley_value[i].items():
            shapley_value_sum[i][cid] = shapley_value_sum[i].get(cid, 0.0) + v
    if csv_logger is not None:
        for i in range(utility_dim):
            csv_logger.log(["shapley_round1", i] + [shapley_value[i][c] for c in range(n)])
    if cfg.obs.use_tensorboard:
        from shapley_vit_tpu.utils.logging import TensorBoardWriter

        tb = TensorBoardWriter(
            os.path.join(cfg.ensure_output_dir(), "tensorboard")
        )
        tb.log_round(
            1, shapley_value, se=_sv_se, utility=previous_utility,
            wall_s=stats["total_s"], evals=game.num_evaluations,
        )
        tb.close()

    return shapley_value_all_rounds, shapley_value_sum


def main(argv: Optional[List[str]] = None):
    """Console entry (``svt-shapley``): the reference's mainShapley.py
    invocation — CLI flags + the .env path contract."""
    import sys

    cfg = Config.from_args(sys.argv[1:] if argv is None else argv)
    cfg.paths = Config.from_env().paths
    start(cfg)
    # the console wrapper calls sys.exit(main()): returning start()'s
    # result dict would print it to stderr and exit 1 on SUCCESS
    return 0


def start(cfg: Optional[Config] = None, checkpoint_paths: Optional[List[str]] = None):
    """Entry point (reference mainShapley.py → start.py:248-331)."""
    cfg = cfg or Config.from_env()
    runtime.enable_compile_cache(cfg.paths.compile_cache_dir)
    logger = get_logger()
    out_dir = cfg.ensure_output_dir()
    csv_logger = CSVLogger(out_dir, cfg.dist.dist_rank, cfg.obs.exp_id, cfg.data.mode)

    spec, base, init_lora = build_model(cfg)
    valid = load_validation_dataset(cfg, target_size=spec.image)
    logger.info(f"validation dataset: {len(valid)} images")

    n_trainable = jvit.trainable_params(init_lora)
    n_all = sum(x.size for x in __import__("jax").tree.leaves(base)) + n_trainable
    logger.info(
        f"trainable params: {n_trainable} || all params: {n_all} || "
        f"trainable%: {100 * n_trainable / n_all:.2f}"
    )

    result = get_initial_shapley_value(
        cfg, valid, spec, base, init_lora,
        checkpoint_paths=checkpoint_paths, csv_logger=csv_logger,
    )
    csv_logger.close()
    return result
