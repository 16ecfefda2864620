"""Centralized-SGD baseline — the reference's standalone comparison script.

Reference: ``federated_learning/cent_sgd.py`` (own argparse at 14-36,
exp-sequence bookkeeping in ``exp_seq.txt`` at 38-73, per-experiment seeding,
ResNet18/50-or-ConvNet training with SGD+momentum 0.9 + weight decay,
per-epoch test metrics via ``get_metrics``, best-accuracy checkpointing to
``checkpoint.pt`` at 137-148, multi-run mean/std summary + loss/acc/auc curve
PNGs + learning-curve dump at 157-204).

TPU rebuild: our zoo + registry + optax; jitted train step; checkpoints via
the atomic-rename protocol (npz); curves saved as npz and optional
matplotlib PNGs through ``utils.plots``.

Run: ``python -m shapley_vit_tpu.driver.cent_sgd --dataset cifar10 --model ConvNet``
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def argparser():
    """Flag surface parity with cent_sgd.py:14-36."""
    parser = argparse.ArgumentParser(description="centralized sgd baseline")
    parser.add_argument("--dataset", type=str, default="cifar10")
    parser.add_argument("--model", type=str, default="ResNet18")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--num_exp", type=int, default=3)
    parser.add_argument("--n_workers", type=int, default=0)
    parser.add_argument("--lr", type=float, default=0.01)
    parser.add_argument("--batch_train", type=int, default=64)
    parser.add_argument("--epoch_train", type=int, default=50)
    parser.add_argument("--weight_decay", type=float, default=1e-5)
    parser.add_argument("--save_root", type=str, default="result")
    parser.add_argument("--data_dir", type=str, default="")
    parser.add_argument("--save_curves", action="store_true", default=False)
    return parser


def set_path(args):
    """Experiment sequence-number bookkeeping (cent_sgd.py:38-73)."""
    os.makedirs(args.save_root, exist_ok=True)
    save_tag = (
        f"centralized_sgd-{args.dataset}-{args.model}-ep{args.epoch_train}-lr{args.lr}"
    )
    exp_seq_path = os.path.join(args.save_root, "exp_seq.txt")
    if not os.path.exists(exp_seq_path):
        exp_seq = 0
    else:
        with open(exp_seq_path) as f:
            exp_seq = int(f.read()) + 1
    with open(exp_seq_path, "w") as f:
        f.write(str(exp_seq))
    args.exp_seq = str(exp_seq)
    args.save_path = os.path.join(args.save_root, f"exp_{exp_seq}_{save_tag}")
    os.makedirs(args.save_path, exist_ok=True)
    args.config_path = os.path.join(args.save_path, "config.json")
    args.logger_path = os.path.join(args.save_path, "exp_log.log")
    return args


def train_one_experiment(args, exp_idx: int, logger):
    """One seeded run (cent_sgd.py:88-150): train, per-epoch metrics, best-acc
    checkpoint. Returns (best_acc, best_auc, curves dict)."""
    import jax
    import jax.numpy as jnp
    import optax

    from shapley_vit_tpu.data.registry import get_dataset
    from shapley_vit_tpu.fl.ingestion import atomic_save_npz
    from shapley_vit_tpu.models import zoo
    from shapley_vit_tpu.utils.eval_metrics import collect_logits, get_metrics

    splits, info = get_dataset(args.dataset, data_dir=args.data_dir, synthetic_ok=True)
    train_ds, test_ds = splits["train"], splits["test"]
    key = jax.random.key(args.seed + exp_idx)

    im_size = train_ds.images.shape[1:3]
    channel = train_ds.images.shape[-1]
    module, variables, apply_fn = zoo.get_network(
        args.model, channel, info["num_classes"], im_size, key
    )
    optimizer = optax.chain(
        optax.add_decayed_weights(args.weight_decay),
        optax.sgd(args.lr, momentum=0.9),
    )
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}
    opt_state = optimizer.init(params)

    has_bn = "batch_stats" in rest

    def loss_fn(params, rest, x, y):
        v = {**rest, "params": params}
        if has_bn:
            logits, mut = module.apply(v, x, train=True, mutable=["batch_stats"])
            new_stats = mut["batch_stats"]
        else:
            logits = module.apply(v, x, train=True)
            new_stats = None
        logp = jax.nn.log_softmax(logits.astype(jnp.float32))
        nll = -jnp.take_along_axis(logp, y[:, None], axis=-1)[:, 0]
        return jnp.mean(nll), new_stats

    @jax.jit
    def train_step(params, rest, opt_state, x, y):
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, rest, x, y
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if new_stats is not None:
            rest = {**rest, "batch_stats": new_stats}
        return params, rest, opt_state, loss

    rng = np.random.default_rng(args.seed + exp_idx)
    n = len(train_ds)
    curves = {"loss": [], "acc": [], "auc": []}
    best_acc, best_auc = 0.0, 0.0

    eval_forward = lambda p, x: module.apply({**rest, "params": p}, x, train=False)

    for epoch in range(args.epoch_train):
        perm = rng.permutation(n)
        ep_loss, batches = 0.0, 0
        for i in range(0, n, args.batch_train):
            idx = perm[i : i + args.batch_train]
            params, rest, opt_state, loss = train_step(
                params, rest, opt_state, train_ds.images[idx], train_ds.labels[idx]
            )
            ep_loss += float(loss)
            batches += 1
        logits, labels = collect_logits(eval_forward, params, test_ds, args.batch_train)
        loss, acc, auc, bal = get_metrics(logits, labels)
        curves["loss"].append(ep_loss / batches)
        curves["acc"].append(acc)
        curves["auc"].append(auc)
        logger.info(
            f"exp {exp_idx} epoch {epoch}: train_loss={ep_loss / batches:.4f} "
            f"test_acc={acc:.4f} auc={auc:.4f} bal_acc={bal:.4f}"
        )
        if acc > best_acc:
            best_acc, best_auc = acc, auc
            # best-acc checkpoint (cent_sgd.py:142-147)
            flat = {}

            def _flatten(prefix, tree):
                for k, v in tree.items():
                    if isinstance(v, dict):
                        _flatten(f"{prefix}{k}.", v)
                    else:
                        flat[f"{prefix}{k}"] = np.asarray(v)

            _flatten("", {"params": params, **rest})
            atomic_save_npz(
                os.path.join(args.save_path, f"checkpoint_exp{exp_idx}.npz"),
                {**flat, "__epoch__": np.asarray(epoch), "__loss__": np.asarray(curves["loss"][-1])},
            )
    return best_acc, best_auc, curves


def main(args=None, argv=None):
    from shapley_vit_tpu.utils.logging import get_logger

    if args is None:
        args = set_path(argparser().parse_args(argv))
    logger = get_logger("cent_sgd", args.logger_path)
    with open(args.config_path, "w") as f:
        json.dump(vars(args), f, indent=4)

    t0 = time.time()
    accs, aucs, all_curves = [], [], []
    for exp_idx in range(args.num_exp):
        acc, auc, curves = train_one_experiment(args, exp_idx, logger)
        accs.append(acc)
        aucs.append(auc)
        all_curves.append(curves)

    # multi-run mean/std summary (cent_sgd.py:157-176)
    summary = {
        "acc_mean": float(np.mean(accs)), "acc_std": float(np.std(accs)),
        "auc_mean": float(np.mean(aucs)), "auc_std": float(np.std(aucs)),
        "wall_clock_s": time.time() - t0,
    }
    logger.info(f"summary over {args.num_exp} runs: {summary}")
    with open(os.path.join(args.save_path, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)

    # learning-curve dump (cent_sgd.py:197-204) + optional PNGs
    np.savez(
        os.path.join(args.save_path, "curves.npz"),
        **{
            f"{k}_{i}": np.asarray(c[k])
            for i, c in enumerate(all_curves)
            for k in ("loss", "acc", "auc")
        },
    )
    if args.save_curves:
        from shapley_vit_tpu.utils.plots import plot_series_mul

        for metric in ("loss", "acc", "auc"):
            plot_series_mul(
                [c[metric] for c in all_curves],
                title=f"{args.model} {metric}",
                y_min=None, y_max=None,
                save=True,
                save_path=os.path.join(args.save_path, f"{metric}.png"),
            )
    return summary


def cli(argv=None) -> int:
    """Console entry (``svt-cent-sgd``): main() returns the summary dict for
    library callers; the console wrapper calls sys.exit() on the return, so
    the CLI needs an int."""
    main(argv=argv)
    return 0


if __name__ == "__main__":
    main()
