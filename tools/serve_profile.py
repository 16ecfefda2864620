"""Measure the FULL serving path at production scale (real TPU).

bench.py measures the raw batched coalition eval (5.4 evals/s with int8).
A serve() round additionally pays: checkpoint ingestion, coalition
materialization, pad_buckets padding, per-block utility-table persistence,
fingerprinting, report rendering, and the global-overlay export. This tool
runs real serve() rounds against synthetic client checkpoints and reports
effective evals/s so the serving overhead is a measured number, not a
guess.

Usage: python tools/serve_profile.py [--rounds 2] [--val-size 512]
Solo-run it: TPU wall-clock numbers are corrupted by any concurrent job.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--val-size", type=int, default=512)
    ap.add_argument("--clients", type=int, default=3)
    ap.add_argument("--no-quant", action="store_true")
    # measure the ingest prefetcher's effect (round-5): default follows
    # serve()'s default (on); --no-pipeline forces the serial path
    ap.add_argument("--no-pipeline", action="store_true")
    args = ap.parse_args()

    import jax

    from shapley_vit_tpu.config import Config
    from shapley_vit_tpu.data.arrays import ArrayDataset
    from shapley_vit_tpu.driver.serve import serve
    from shapley_vit_tpu.fl import ingestion
    from shapley_vit_tpu.models import vit as jvit
    from shapley_vit_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    )

    tmp = tempfile.mkdtemp(prefix="svt_serve_profile_")
    cfg = Config()
    cfg.model.vit_variant = "base"
    cfg.model.model_type = "ViT-base"
    cfg.model.compute_dtype = "bfloat16"
    cfg.model.gelu = "tanh"
    if not args.no_quant:
        cfg.model.quant = "int8"
    cfg.data.eval_batch_size = 128
    cfg.obs.exp_dir = os.path.join(tmp, "exp")
    cfg.paths.local_model_path = os.path.join(tmp, "local")
    cfg.paths.global_model_path = os.path.join(tmp, "global")
    cfg.shapley.num_clients = args.clients

    spec = jvit.make_spec(
        "base", num_classes=4, dtype="bfloat16", gelu="tanh",
        quant="none" if args.no_quant else "int8",
        quant_targets=jvit.INT8_TARGETS,
    )
    init_lora = jvit.init_lora(jax.random.key(1), spec)

    # synthetic validation set at the bench.py shape
    rng = np.random.default_rng(0)
    valid = ArrayDataset(
        images=rng.normal(size=(args.val_size, 224, 224, 3)).astype(np.float32),
        labels=rng.integers(0, 4, size=args.val_size).astype(np.int64),
    )

    # pre-stage every epoch's checkpoints (ingestion cost still paid per
    # round; only the waiting is removed)
    leaves, treedef = jax.tree.flatten(init_lora)
    for epoch in range(args.rounds):
        for cid in range(args.clients):
            ks = jax.random.split(jax.random.key(epoch * 100 + cid), len(leaves))
            lora = treedef.unflatten(
                [l + 0.05 * jax.random.normal(k, l.shape) for k, l in zip(ks, leaves)]
            )
            ingestion.save_lora_checkpoint(
                os.path.join(
                    cfg.paths.local_model_path, f"client_{cid + 1}_model",
                    f"ViT_epoch_{epoch}.npz",
                ),
                lora, spec, num_local_data_train=1000 + 100 * cid,
            )

    # round 0 warms every compile; rounds 1.. are steady-state
    t0 = time.time()
    records = serve(
        cfg, max_rounds=args.rounds, epoch_filename="ViT_epoch_{epoch}.npz",
        timeout=60.0, policy="fail", valid=valid,
        pipeline_ingest=not args.no_pipeline,
    )
    total = time.time() - t0
    assert len(records) == len(
        set(r["epoch"] for r in records)
    ), "duplicate rounds"

    # two honest numbers: the estimator span (eval path only) and the FULL
    # round wall (ingestion -> eval -> report -> overlay export, from
    # serve()'s per-record wall_s) — the earlier span-only metric overstated
    # serving throughput by exactly the overheads this tool exists to show
    span_times = []
    phases = {}
    for r in records:
        tpath = os.path.join(cfg.output_dir, f"timing_r{r['epoch']}.csv")
        if os.path.exists(tpath):
            import csv

            with open(tpath) as f:
                for row in csv.DictReader(f):
                    if not row.get("total_s"):
                        continue  # counter-only spans have no wall time
                    phases.setdefault(row["span"], []).append(float(row["total_s"]))
                    if row["span"] == "shapley_round":
                        span_times.append(float(row["total_s"]))
    full_times = [r["wall_s"] for r in records]
    report_times = [r.get("report_s", 0.0) for r in records]

    def steady_eps(times):
        # round 0 pays the compiles; "steady state" needs >= 2 rounds —
        # reporting the warm-up round under this key would be 10x wrong
        steady = times[1:]
        evals = [r["evals"] for r in records][1:]
        if not steady or sum(steady) <= 0:
            return None
        return round(sum(evals) / sum(steady), 3)

    print(json.dumps({
        "rounds": len(records),
        "total_wall_s": round(total, 1),
        "shapley_round_s": [round(t, 2) for t in span_times],
        "full_round_s": [round(t, 2) for t in full_times],
        "steady_state_evals_per_s_eval_span": steady_eps(span_times),
        "steady_state_evals_per_s_full_round": steady_eps(full_times),
        "phase_s": {k: [round(t, 2) for t in v] for k, v in sorted(phases.items())},
        "report_s": [round(t, 2) for t in report_times],
        # wall minus every accounted phase: dispatch overhead, logging, the
        # straggler-policy bookkeeping — should be small; if it grows, add a
        # span for whatever grew
        "unaccounted_s": [
            round(
                w - rep - sum(v[i] for v in phases.values() if i < len(v)), 2
            )
            for i, (w, rep) in enumerate(zip(full_times, report_times))
        ],
        "quant": cfg.model.quant,
        "pipelined_rounds": [bool(r.get("pipelined_ingest")) for r in records],
        "val_size": args.val_size,
        "artifacts": tmp,
    }))


if __name__ == "__main__":
    main()
