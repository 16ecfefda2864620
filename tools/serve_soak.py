"""serve() soak test: ~50 production rounds, watching for leaks.

Round-3 VERDICT #7: the long-running service owns several unbounded-
looking structures — the async artifact queue, the per-epoch utility memo
tables, the compile cache, TensorBoard writers, the PNG trajectory
renderer — and nothing had measured that a 50-round service stays flat.
This tool drives synthetic trained-delta epochs through the FULL service
(persistence ON, TensorBoard ON, async artifacts/plots ON), sampling RSS
in a daemon thread, and reports:

  * per-round wall_s trend (first-5 mean vs last-5 mean, linear slope);
  * RSS trend over the run (same summary), plus the peak;
  * the serve() records' phase spans so any drift is attributable.

Flat = slope consistent with zero against run-to-run noise; results land
in BENCH_NOTES round 4.

Usage (real TPU, solo):   python tools/serve_soak.py --rounds 50
Quick CPU-mesh smoke:     XLA_FLAGS=--xla_force_host_platform_device_count=8
                          JAX_PLATFORMS=cpu python tools/serve_soak.py \
                              --rounds 8 --variant micro --val-size 64
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return float("nan")


def trend(xs):
    """(first5_mean, last5_mean, per-step slope) for a series."""
    xs = list(xs)
    if len(xs) < 2:
        return (xs[0] if xs else None, xs[-1] if xs else None, 0.0)
    t = np.arange(len(xs), dtype=np.float64)
    slope = float(np.polyfit(t, np.asarray(xs, np.float64), 1)[0])
    k = min(5, len(xs) // 2) or 1
    return (
        round(float(np.mean(xs[:k])), 2),
        round(float(np.mean(xs[-k:])), 2),
        round(slope, 4),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=50)
    ap.add_argument("--clients", type=int, default=3)
    ap.add_argument("--val-size", type=int, default=256)
    ap.add_argument("--variant", type=str, default="base")
    ap.add_argument("--bare", action="store_true",
                    help="disable TB/plots/persistence: isolates the eval "
                         "core from the artifact surface when chasing drift")
    ap.add_argument("--no-plots", action="store_true")
    ap.add_argument("--no-tb", action="store_true")
    ap.add_argument("--no-persist", action="store_true")
    ap.add_argument("--samples-per-client", type=int, default=None,
                    help="override cfg.shapley.samples_per_client (m = s*n): "
                         "lets a large-n soak measure the SERVING tax "
                         "without re-measuring config 8's eval wall")
    ap.add_argument("--quant", choices=("none", "int8"), default="none",
                    help="fast-eval quantization in the serve path "
                         "(merged-int8 carries the trained-weights argmax "
                         "agreement contract, tools/quant_agreement.py)")
    ap.add_argument("--no-pipeline", action="store_true",
                    help="disable the round-5 ingest prefetcher (serial "
                         "ingest baseline)")
    ap.add_argument("--gc-per-round", action="store_true",
                    help="run gc.collect() after every round (attribution: "
                         "does cyclic garbage carry the RSS growth?)")
    ap.add_argument("--import-tb-only", action="store_true",
                    help="import the TB writer's backing library without "
                         "using it: attributes leak to the import's process-"
                         "wide side effects vs our per-round writes")
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    if args.import_tb_only:
        import torch.utils.tensorboard  # noqa: F401

    from shapley_vit_tpu.config import Config
    from shapley_vit_tpu.data.arrays import ArrayDataset
    from shapley_vit_tpu.driver.serve import serve
    from shapley_vit_tpu.fl import ingestion
    from shapley_vit_tpu.models import vit as jvit
    from shapley_vit_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        )
    )

    tmp = tempfile.mkdtemp(prefix="svt_soak_")
    cfg = Config()
    cfg.model.vit_variant = args.variant
    cfg.model.model_type = f"ViT-{args.variant}"
    if args.variant in ("base", "large"):
        cfg.model.compute_dtype = "bfloat16"
        cfg.model.gelu = "tanh"
    cfg.data.eval_batch_size = min(128, args.val_size)
    cfg.obs.exp_dir = os.path.join(tmp, "exp")
    cfg.obs.use_tensorboard = not (args.bare or args.no_tb)
    if args.bare or args.no_plots:
        cfg.obs.render_plots = False
    cfg.paths.local_model_path = os.path.join(tmp, "local")
    cfg.paths.global_model_path = os.path.join(tmp, "global")
    cfg.shapley.num_clients = args.clients
    cfg.shapley.persist_utility_table = not (args.bare or args.no_persist)
    if args.samples_per_client is not None:
        cfg.shapley.samples_per_client = args.samples_per_client
    cfg.model.quant = args.quant

    spec = jvit.make_spec(
        args.variant, num_classes=4,
        dtype=cfg.model.compute_dtype, gelu=cfg.model.gelu,
        quant=args.quant, quant_targets=jvit.INT8_TARGETS,
    )
    image = spec.image  # keep the staged checkpoints/valid at serve's shape
    init_lora = jvit.init_lora(jax.random.key(1), spec)

    rng = np.random.default_rng(0)
    valid = ArrayDataset(
        images=rng.normal(size=(args.val_size, image, image, 3)).astype(
            np.float32
        ),
        labels=rng.integers(0, 4, size=args.val_size).astype(np.int64),
    )

    # pre-stage every epoch's synthetic trained deltas (drifting walk so
    # every round's utilities/fingerprints genuinely differ)
    leaves, treedef = jax.tree.flatten(init_lora)
    for epoch in range(args.rounds):
        for cid in range(args.clients):
            ks = jax.random.split(
                jax.random.key(epoch * 1000 + cid), len(leaves)
            )
            lora = treedef.unflatten(
                [
                    l + 0.03 * (1 + 0.1 * epoch) * jax.random.normal(k, l.shape)
                    for k, l in zip(ks, leaves)
                ]
            )
            ingestion.save_lora_checkpoint(
                os.path.join(
                    cfg.paths.local_model_path,
                    f"client_{cid + 1}_model",
                    f"ViT_epoch_{epoch}.npz",
                ),
                lora, spec, num_local_data_train=1000 + 100 * cid,
            )

    if args.gc_per_round:
        # serve() calls wait_for_checkpoints once per round — hook a full
        # collection there (between rounds, nothing in flight)
        import gc

        _orig_wait = ingestion.wait_for_checkpoints

        def _wait_with_gc(*a, **k):
            gc.collect()
            return _orig_wait(*a, **k)

        ingestion.wait_for_checkpoints = _wait_with_gc

    samples: list = []
    stop = threading.Event()

    def sampler():
        while not stop.is_set():
            # live jax arrays + open fds alongside RSS: splits "we retain
            # device buffers / leak fds" from "native growth outside our
            # object graph" without a second run
            try:
                n_arr = len(jax.live_arrays())
            except Exception:
                n_arr = -1
            try:
                n_fd = len(os.listdir("/proc/self/fd"))
            except OSError:
                n_fd = -1
            samples.append((time.time(), rss_mb(), n_arr, n_fd))
            stop.wait(0.5)

    th = threading.Thread(target=sampler, daemon=True)
    th.start()
    t0 = time.time()
    records = serve(
        cfg,
        max_rounds=args.rounds,
        epoch_filename="ViT_epoch_{epoch}.npz",
        timeout=60.0,
        policy="fail",
        valid=valid,
        pipeline_ingest=not args.no_pipeline,
    )
    total = time.time() - t0
    stop.set()
    th.join(2.0)

    assert len(records) == args.rounds, (len(records), args.rounds)
    walls = [r["wall_s"] for r in records]
    rss = [m for _, m, *_ in samples]
    # per-round RSS: the sample nearest each round's end
    ends, acc = [], t0
    for w in walls:
        acc += w
        ends.append(acc)
    times = np.asarray([t for t, *_ in samples])
    nearest = [int(np.argmin(np.abs(times - e))) for e in ends] if samples else []
    per_round_rss = [float(rss[i]) for i in nearest]
    per_round_arrays = [int(samples[i][2]) for i in nearest]
    per_round_fds = [int(samples[i][3]) for i in nearest]

    w0, w1, wslope = trend(walls[1:])  # round 0 pays the compiles
    r0, r1, rslope = trend(per_round_rss)
    phase_trend = {}
    for ph in sorted({k for r in records for k in r.get("phases", {})}):
        xs = [r["phases"][ph] for r in records if ph in r.get("phases", {})]
        if len(xs) > 10:
            phase_trend[ph] = trend(xs[1:])
    print(json.dumps({
        "phase_s_first5_last5_slope": phase_trend,
        "rounds": len(records),
        "total_wall_s": round(total, 1),
        "wall_s_first5_last5_slope": [w0, w1, wslope],
        "rss_mb_first5_last5_slope": [r0, r1, rslope],
        "rss_mb_peak": round(max(rss), 1) if rss else None,
        "wall_s_all": [round(w, 2) for w in walls],
        "rss_mb_per_round": [round(m, 1) for m in per_round_rss],
        "live_arrays_first5_last5_slope": trend(per_round_arrays),
        "open_fds_first5_last5_slope": trend(per_round_fds),
        "variant": args.variant,
        "quant": args.quant,
        "pipelined_rounds_true": sum(
            1 for r in records if r.get("pipelined_ingest")
        ),
        "bare": args.bare,
        "plots": cfg.obs.render_plots,
        "tb": cfg.obs.use_tensorboard,
        "persist": cfg.shapley.persist_utility_table,
        "artifacts": tmp,
    }))


if __name__ == "__main__":
    main()
