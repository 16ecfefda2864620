"""Quickstart: one batched exact-Shapley round over 3 synthetic clients.

Runs anywhere (CPU or TPU); ~seconds on the micro model, use --variant base
on a TPU for the real thing.

    python examples/quickstart.py [--variant micro|tiny|base] [--val-size 64]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variant", default="micro")
    p.add_argument("--val-size", type=int, default=64)
    p.add_argument("--batch", type=int, default=32)
    args = p.parse_args()

    import jax

    from shapley_vit_tpu.fl import evaluation as ev
    from shapley_vit_tpu.models import vit as jvit
    from shapley_vit_tpu.ops import tree_math as tm
    from shapley_vit_tpu.shapley import Game, shapley_exact, shapley_comp_contrib

    # 1. model: frozen ViT base + trainable LoRA overlay
    spec = jvit.make_spec(args.variant, num_classes=4)
    base = jvit.init_vit(jax.random.key(0), spec)
    lora0 = jvit.init_lora(jax.random.key(1), spec, classifier_from=base)

    # 2. three clients: synthetic LoRA deltas (stand-ins for local training)
    leaves, treedef = jax.tree.flatten(lora0)
    deltas = [
        treedef.unflatten([
            0.05 * jax.random.normal(k, leaf.shape)
            for k, leaf in zip(jax.random.split(jax.random.key(10 + i), len(leaves)), leaves)
        ])
        for i in range(3)
    ]
    stacked = tm.tree_stack(deltas)
    sizes = [120, 300, 580]  # data sizes drive the FedAvg ratios

    # 3. device-resident validation set
    rng = np.random.default_rng(0)
    images = jax.device_put(
        rng.normal(size=(args.val_size, spec.image, spec.image, 3)).astype(np.float32)
    )
    labels = jax.device_put(rng.integers(0, 4, size=args.val_size))
    data = [
        (images[i : i + args.batch], labels[i : i + args.batch])
        for i in range(0, args.val_size, args.batch)
    ]

    # 4. the batched coalition evaluator: C models, one vmapped pass
    evaluator = ev.make_coalition_evaluator(
        lambda b, l, x: jvit.vit_forward(b, l, x, spec)
    )
    mat = jax.jit(tm.materialize_coalitions)

    def eval_coalitions(W):
        return evaluator(base, mat(lora0, stacked, W), data, dataset_size=args.val_size)

    prev = ev.evaluate_model(
        lambda p, x: jvit.vit_forward(p[0], p[1], x, spec), (base, lora0), data
    )
    print(f"initial global utility: acc={prev[0]:.4f} loss={prev[1]:.4f}")

    game = Game(
        eval_coalitions_fn=eval_coalitions,
        num_local_data=sizes,
        client_selection_vector=[True, True, True],
        previous_utility=list(prev),
    )

    # 5a. exact Shapley: all 7 coalitions in one batched evaluation
    sv = shapley_exact(game)
    print(f"exact SV (accuracy dim): { {c: round(v, 5) for c, v in sv[0].items()} }")
    print(f"exact SV (loss dim):     { {c: round(v, 5) for c, v in sv[1].items()} }")
    print(f"distinct coalition evaluations: {game.num_evaluations}")

    # 5b. the live-path estimator (comp-contrib, m=50n) reuses the memo
    sv_cc = shapley_comp_contrib(game, m=150, rng=np.random.default_rng(0))
    print(f"comp-contrib SV (accuracy): { {c: round(v, 5) for c, v in sv_cc[0].items()} }")
    print(f"evaluations after comp-contrib (memoized): {game.num_evaluations}")


if __name__ == "__main__":
    main()
