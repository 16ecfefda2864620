"""Validate the automatic (coalition, data) mesh split (parallel.autoshape)
against the compiler and against single-device results.

Round-3 VERDICT weak #3: ``mesh_coalition_shards`` was a manual knob with
no guidance. ``choose_coalition_shards`` now picks the split analytically
(minimal padded per-device work -> largest per-device batch -> memory
filter). This tool cross-checks that choice on the 8-device virtual mesh:

  * for each workload (C, B) it prints every divisor split's predicted
    padded work alongside the compiler's ``memory_analysis`` of the lowered
    sharded program (argument residency must scale down with the coalition
    axis — the memory filter's premise);
  * for the CHOSEN shape it runs the sharded evaluator and asserts utility
    equality vs the single-device evaluator (<=1e-5), the same bar as
    ``dryrun_multichip``.

Run on the virtual mesh (CPU):
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python tools/mesh_calibration.py
Results land in BENCH_NOTES round 4.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the container's sitecustomize force-registers the axon backend and
        # overrides the env var — force the config back (CLAUDE.md)
        jax.config.update("jax_platforms", "cpu")
    if len(jax.devices()) == 1:
        print("need >1 device (use the virtual CPU mesh env)", file=sys.stderr)
        sys.exit(1)

    import numpy as np

    from shapley_vit_tpu.fl import evaluation as ev
    from shapley_vit_tpu.models import vit as jvit
    from shapley_vit_tpu.ops import tree_math as tm
    from shapley_vit_tpu.parallel import autoshape
    from shapley_vit_tpu.parallel import mesh as pmesh
    from shapley_vit_tpu.parallel.coalition_eval import (
        make_sharded_coalition_evaluator,
        shard_batches,
    )

    D = len(jax.devices())
    spec = jvit.make_spec("tiny", image=32, num_classes=4, dtype="float32")
    base = jvit.init_vit(jax.random.key(0), spec)
    lora = jvit.init_lora(jax.random.key(1), spec)
    fwd = lambda b, l, x: jvit.vit_forward(b, l, x, spec)
    cbytes = autoshape.coalition_residency_bytes(lora)

    rng = np.random.default_rng(0)
    B = 128
    images = rng.normal(size=(B, 32, 32, 3)).astype(np.float32)
    labels = rng.integers(0, 4, size=B)
    data = [(images, labels)]

    single = ev.make_coalition_evaluator(fwd)

    rows = []
    for C in (7, 31, 101):
        stacked = tm.tree_stack(
            [jax.tree.map(lambda l: l + 0.01 * i, lora) for i in range(C)]
        )
        choice = autoshape.choose_coalition_shards(
            D, C, B, coalition_bytes=cbytes
        )
        print(f"\n== C={C} B={B} D={D}: chosen {choice.n_coalition}x"
              f"{choice.n_data} ==\n   {choice.rationale}", flush=True)

        # compiler cross-check: argument residency per device must fall as
        # the coalition axis grows (each shard holds ceil(C/k) weight sets)
        per_k = {}
        for cand in autoshape.enumerate_shard_choices(D, C, B, cbytes or 0):
            k = cand.n_coalition
            m = pmesh.make_mesh(n_coalition=k)
            evaluate = make_sharded_coalition_evaluator(fwd, m)
            pre = shard_batches(m, data)
            out = evaluate(base, stacked, pre)
            # lower the core step once more to read memory_analysis
            from shapley_vit_tpu.parallel.mesh import (
                COALITION_AXIS,
                put_coalition_stacked,
                put_replicated,
            )
            from shapley_vit_tpu.parallel.coalition_eval import (
                masked_eval_step_metrics,
            )
            from jax.sharding import NamedSharding, PartitionSpec as P

            pad_c = -(-C // k) * k
            stacked_p = jax.tree.map(
                lambda l: jax.numpy.concatenate(
                    [l] + [l[:1]] * (pad_c - C), axis=0
                ) if pad_c != C else l,
                stacked,
            )
            vstep = jax.vmap(
                lambda s, p, x, y, w: masked_eval_step_metrics(
                    fwd(s, p, x), y, w
                ),
                in_axes=(None, 0, None, None, None),
            )
            cshard = NamedSharding(m, P(COALITION_AXIS))
            compiled = (
                jax.jit(vstep, out_shardings=(cshard, cshard))
                .lower(
                    put_replicated(m, base),
                    put_coalition_stacked(m, stacked_p),
                    *pre[0],
                )
                .compile()
            )
            ma = compiled.memory_analysis()
            args_gb = (
                float(ma.argument_size_in_bytes) / 1e9
                if ma is not None and hasattr(ma, "argument_size_in_bytes")
                else float("nan")
            )
            per_k[k] = dict(
                padded_work=cand.padded_work,
                batch_per_device=cand.batch_per_device,
                coalitions_per_device=cand.coalitions_per_device,
                compiler_args_gb=round(args_gb, 4),
            )
            want = single(base, stacked, data, dataset_size=B)
            err = float(np.abs(out - want).max())
            per_k[k]["max_err_vs_single"] = err
            print(f"   k={k}: work={cand.padded_work} "
                  f"({cand.coalitions_per_device}cx{cand.batch_per_device}b) "
                  f"args={args_gb:.3f}GB err={err:.2e}", flush=True)
            assert err <= 1e-5, f"C={C} k={k}: sharded != single ({err})"
        rows.append(dict(C=C, B=B, D=D,
                         chosen=f"{choice.n_coalition}x{choice.n_data}",
                         rationale=choice.rationale, splits=per_k))

    print("\n" + json.dumps({"mesh_calibration": rows}, default=str))


if __name__ == "__main__":
    main()
