"""End-to-end Shapley service demo with ACTUALLY-TRAINED client deltas.

The real deployment shape (reference start.py:134-222 + the out-of-repo FL
trainer): clients fine-tune LoRA locally on their own non-IID shards and drop
checkpoints on shared disk via the atomic-rename protocol; the Shapley
service (driver/serve.py) watches, ingests, runs a round, exports the new
global overlay; clients resume from that global for the next epoch. SV
trajectories over the epochs are rendered via driver/report.py.

    python examples/serve_demo.py [--epochs 3] [--clients 3]
"""

import argparse
import os
import sys
import threading

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_demo(cfg=None, epochs: int = 3, n_clients: int = 3, local_steps: int = 4):
    """Run the trained-delta service loop; returns (records, out_dir)."""
    import importlib

    import jax
    import optax

    from shapley_vit_tpu.config import Config
    from shapley_vit_tpu.data.partition import partition_labeldir
    from shapley_vit_tpu.data.registry import get_dataset
    from shapley_vit_tpu.driver.report import plot_shapley_rounds
    from shapley_vit_tpu.driver.serve import serve
    from shapley_vit_tpu.fl import ingestion
    from shapley_vit_tpu.fl import training as tr
    from shapley_vit_tpu.models import vit as jvit

    start_mod = importlib.import_module("shapley_vit_tpu.driver.start")

    if cfg is None:
        cfg = Config()
        cfg.model.vit_variant = "micro"
        cfg.data.image_size = 16
        cfg.data.eval_batch_size = 32
        cfg.obs.exp_dir = "exp/serve_demo"
        cfg.paths.validation_dataset = ""  # synthetic OCT
        cfg.paths.local_model_path = os.path.join(cfg.obs.exp_dir, "local")
        cfg.paths.global_model_path = os.path.join(cfg.obs.exp_dir, "global")
        cfg.data.synthetic_scale = 0.02
    assert cfg.paths.local_model_path and cfg.paths.global_model_path
    # the service watches/scores cfg.shapley.num_clients clients — keep it
    # in lockstep with the trainer fleet size or the round never completes
    cfg.shapley.num_clients = n_clients

    spec, base, init_lora = start_mod.build_model(cfg)

    # non-IID Dirichlet shards of the (synthetic) OCT training split
    splits, info = get_dataset(
        cfg.data.dataset_type,
        data_dir=cfg.paths.validation_dataset,
        synthetic_scale=cfg.data.synthetic_scale,
    )
    train = splits["train"]
    _, mapping = partition_labeldir(
        train.labels, num_classes=info["num_classes"], n_parties=n_clients, beta=0.5
    )
    shard = []
    for c in range(n_clients):
        idx = mapping[c][:64]
        x = train.images[idx]
        if x.shape[1] != spec.image:
            import jax.image

            x = np.asarray(
                jax.image.resize(x, (len(idx), spec.image, spec.image, 3), "bilinear")
            )
        shard.append((x.astype(np.float32), train.labels[idx]))
    sizes = [len(mapping[c]) for c in range(n_clients)]

    opt = optax.adam(5e-3)
    step = tr.make_train_step(
        lambda b, l, x: jvit.vit_forward(b, l, x, spec), opt, spec.num_classes
    )

    def client_loop():
        """Per epoch: resume from the latest exported global overlay, train
        locally, drop a checkpoint with the data-size metadata."""
        overlay = init_lora
        for epoch in range(epochs):
            if epoch > 0:
                gpath = os.path.join(
                    cfg.paths.global_model_path, f"ViT_global_epoch_{epoch - 1}.npz"
                )
                # wait for the service to export the previous round's global
                ingestion.wait_for_checkpoints([gpath], policy="wait", poll_interval=0.1)
                overlay = ingestion.load_client_lora(gpath, spec)
            for cid in range(n_clients):
                lora, opt_state = overlay, opt.init(overlay)
                key = jax.random.key(epoch * 100 + cid)
                x, y = shard[cid]
                for s in range(local_steps):
                    key, sub = jax.random.split(key)
                    lora, opt_state, _ = step(base, lora, opt_state, x, y, sub)
                ingestion.save_lora_checkpoint(
                    os.path.join(
                        cfg.paths.local_model_path,
                        f"client_{cid + 1}_model",
                        f"ViT_epoch_{epoch}.pth.tar".replace(".pth.tar", ".npz"),
                    ),
                    lora,
                    spec,
                    num_local_data_train=sizes[cid],
                )

    trainer = threading.Thread(target=client_loop, daemon=True)
    trainer.start()
    records = serve(
        cfg,
        max_rounds=epochs,
        epoch_filename="ViT_epoch_{epoch}.npz",
        timeout=600.0,
        policy="fail",
    )
    trainer.join(timeout=60)

    out = cfg.output_dir
    svs = [r["shapley"] for r in records]
    if len(svs) > 1:
        plot_shapley_rounds(svs, os.path.join(out, "sv_trajectory.png"))
    return records, out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--clients", type=int, default=3)
    args = p.parse_args()
    records, out = run_demo(epochs=args.epochs, n_clients=args.clients)
    for r in records:
        print(
            f"epoch {r['epoch']}: utility {r['utility']} "
            f"SV(acc)={ {c: round(v, 4) for c, v in r['shapley'][0].items()} }"
        )
    print(f"artifacts in {out}")


if __name__ == "__main__":
    main()
