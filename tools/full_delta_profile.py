"""Where does benchmark config 6 (full-delta coalition eval) spend its time?

Config 6 measures whole-tree coalition eval (the reference's complete
state-dict aggregation, utils.py:735-749): 3 clients -> 7 coalition-stacked
COMPLETE ViT-B trees, batch 512, val 512. BENCH_NOTES round 2 recorded
3.68 evals/s vs ~5.0 for the LoRA-overlay path at identical forward FLOPs.
This tool separates the round into phases and measures candidate fixes:

  mat     : jit(materialize f32 + cast-to-bf16), the per-round weight build
  mat_bf16: materialize directly in bf16 (halves einsum HBM traffic;
            benchmark-only numerics — SV parity math stays f32/highest)
  eval    : coalition-vmapped forward on PRE-materialized trees
  e2e     : mat + eval as config 6 runs it
  e2e_int8: e2e with dynamic-int8 q/k/v/fc1 matmuls (headline bench mode)

Every timing blocks on a scalar readback (CLAUDE.md measurement rules).
Run solo on the TPU: python tools/full_delta_profile.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VAL = 512
BATCH = 512
N = 3
REPS = 5


def timeit(fn, reps=REPS):
    fn()  # warm/compile
    t0 = time.time()
    for _ in range(reps):
        fn()
    return (time.time() - t0) / reps


def main():
    import jax

    from shapley_vit_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
    import jax.numpy as jnp
    import numpy as np

    from shapley_vit_tpu.fl import evaluation as ev
    from shapley_vit_tpu.models import vit as jvit
    from shapley_vit_tpu.ops import tree_math as tm

    spec = jvit.make_spec("base", image=224, num_classes=4, dtype="bfloat16")
    base = jvit.init_vit(jax.random.key(0), spec)
    leaves, treedef = jax.tree.flatten(base)
    deltas = [
        treedef.unflatten([
            0.02 * jax.random.normal(k, l.shape)
            for k, l in zip(jax.random.split(jax.random.key(10 + i), len(leaves)), leaves)
        ])
        for i in range(N)
    ]
    stacked = tm.tree_stack(deltas)
    base_bf16 = jax.tree.map(lambda a: a.astype(spec.compute_dtype), base)
    stacked_bf16 = jax.tree.map(lambda a: a.astype(spec.compute_dtype), stacked)

    rng = np.random.default_rng(0)
    images = jax.device_put(rng.normal(size=(VAL, 224, 224, 3)).astype(np.float32))
    labels = jax.device_put(rng.integers(0, 4, size=VAL))
    data = [(images[i : i + BATCH], labels[i : i + BATCH]) for i in range(0, VAL, BATCH)]

    C = 2**N - 1
    W = jnp.asarray(np.array([[(1.0 / N) * ((c >> i) & 1) for i in range(N)]
                              for c in range(1, 2**N)], np.float32))

    mat_cast = jax.jit(
        lambda b, s, w: jax.tree.map(
            lambda a: a.astype(spec.compute_dtype), tm.materialize_coalitions(b, s, w)
        )
    )
    mat_bf16 = jax.jit(tm.materialize_coalitions)

    def probe_tree(t):
        # block on ONE leaf readback, not the whole 7x344MB tree
        return float(jnp.abs(jax.tree.leaves(t)[0]).sum())

    t_mat = timeit(lambda: probe_tree(mat_cast(base, stacked, W)))
    t_mat_bf16 = timeit(lambda: probe_tree(mat_bf16(base_bf16, stacked_bf16, W)))

    evaluator = ev.make_coalition_evaluator(
        lambda _s, v, x: jvit.vit_forward(v, None, x, spec)
    )
    trees = jax.tree.map(lambda a: a.copy(), mat_cast(base, stacked, W))
    jax.block_until_ready(trees)

    t_eval = timeit(lambda: np.asarray(evaluator({}, trees, data, dataset_size=VAL)).sum())
    t_e2e = timeit(
        lambda: np.asarray(
            evaluator({}, mat_cast(base, stacked, W), data, dataset_size=VAL)
        ).sum()
    )

    # free the pre-materialized copy before the int8 sweep: 1.2GB of bf16
    # trees alive alongside each variant's fresh materialization + activations
    # tips the 16GB chip over
    del trees

    rows = [("mat(f32->bf16)", t_mat), ("mat(bf16 direct)", t_mat_bf16),
            ("eval(pre-mat)", t_eval), ("e2e", t_e2e)]
    for label, targets in [
        ("int8 qkv+fc1", ("q", "k", "v", "fc1")),
        ("int8 qkv+fc1+fc2", ("q", "k", "v", "fc1", "fc2")),
        ("int8 all", ("patch", "q", "k", "v", "out", "fc1", "fc2")),
    ]:
        spec8 = spec.replace(quant="int8", quant_targets=targets)
        evaluator8 = ev.make_coalition_evaluator(
            lambda _s, v, x, _sp=spec8: jvit.vit_forward(v, None, x, _sp)
        )
        rows.append((f"e2e {label}", timeit(
            lambda: np.asarray(
                evaluator8({}, mat_cast(base, stacked, W), data, dataset_size=VAL)
            ).sum()
        )))

    for name, t in rows:
        print(f"{name:22s} {t*1e3:8.1f} ms/round   {C/t:6.2f} evals/s")


if __name__ == "__main__":
    main()
