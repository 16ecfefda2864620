"""Multi-round FL with per-round Shapley valuation, end to end in-process.

Three clients with non-IID Dirichlet data train LoRA locally for several
rounds; a MILP budget picks which rounds get Shapley; per-round scores are
rendered to CSV + plots.

    python examples/multi_round_fl.py [--rounds 3] [--budget 2]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--budget", type=int, default=2)
    p.add_argument("--estimator", default="exact",
                   choices=["exact", "comp_contrib", "gtg", "mr", "tmr"])
    p.add_argument("--out", default="exp/multi_round_demo")
    args = p.parse_args()

    import jax
    import optax

    from shapley_vit_tpu.data.partition import partition_labeldir
    from shapley_vit_tpu.data.registry import get_dataset
    from shapley_vit_tpu.driver.report import plot_shapley_rounds, write_shapley_csv
    from shapley_vit_tpu.driver.rounds import run_federated_rounds
    from shapley_vit_tpu.fl import evaluation as ev
    from shapley_vit_tpu.fl import training as tr
    from shapley_vit_tpu.models import vit as jvit
    from shapley_vit_tpu.ops import tree_math as tm

    # data: synthetic CIFAR-10-shaped, Dirichlet non-IID over 3 clients
    splits, info = get_dataset("cifar10", synthetic_ok=True)
    train, val = splits["train"], splits["val"]
    _, mapping = partition_labeldir(train.labels, num_classes=10, n_parties=3, beta=0.5)
    clients_data = [
        (train.images[mapping[c]][:64], train.labels[mapping[c]][:64]) for c in range(3)
    ]
    sizes = [len(mapping[c]) for c in range(3)]
    val_batches = [(val.images[:128], val.labels[:128])]

    spec = jvit.make_spec("micro", image=32, num_classes=10)
    base = jvit.init_vit(jax.random.key(0), spec)
    lora0 = jvit.init_lora(jax.random.key(1), spec, classifier_from=base)

    opt = optax.adam(5e-3)
    step = tr.make_train_step(
        lambda b, l, x: jvit.vit_forward(b, l, x, spec), opt, spec.num_classes
    )

    def train_client_fn(cid, overlay, data, rnd):
        lora, opt_state = overlay, opt.init(overlay)
        key = jax.random.key(rnd * 10 + cid)
        for _ in range(3):
            lora, opt_state, _ = step(base, lora, opt_state, data[0], data[1], key)
        return lora

    single = lambda prm, x: jvit.vit_forward(prm[0], prm[1], x, spec)

    def evaluate_fn(overlay):
        return ev.evaluate_model(single, (base, overlay), val_batches)

    evaluator = ev.make_coalition_evaluator(
        lambda b, l, x: jvit.vit_forward(b, l, x, spec)
    )

    def eval_factory(start_overlay, stacked):
        return lambda W: evaluator(
            base, tm.materialize_coalitions(start_overlay, stacked, W), val_batches
        )

    records = run_federated_rounds(
        num_rounds=args.rounds,
        clients_data=clients_data,
        init_overlay=lora0,
        train_client_fn=train_client_fn,
        evaluate_fn=evaluate_fn,
        eval_coalitions_fn_factory=eval_factory,
        num_local_data=sizes,
        estimator=args.estimator,
        shapley_budget=args.budget,
    )

    os.makedirs(args.out, exist_ok=True)
    valued = [(t, r.shapley) for t, r in enumerate(records) if r.shapley is not None]
    for t, sv in valued:
        write_shapley_csv(os.path.join(args.out, "shapley_rounds.csv"), sv, round_idx=t)
        print(f"round {t}: global utility {records[t].utility}, "
              f"SV(acc)={ {c: round(v, 4) for c, v in sv[0].items()} }")
    if len(valued) > 1:
        plot_shapley_rounds(
            [sv for _, sv in valued], os.path.join(args.out, "sv_trajectory.png")
        )
    print(f"artifacts in {args.out}")


if __name__ == "__main__":
    main()
