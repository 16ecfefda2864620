"""Zero-config end-to-end demo: ``python -m shapley_vit_tpu.driver.run_demo``.

One complete pass over the reference's one-shot deployment shape
(mainShapley.py → start.py:248-331) without needing a ``.env``, datasets on
disk, or an external FL trainer:

  1. build ViT(+LoRA) on a micro config with a synthetic OCT-layout
     validation set (Dirichlet non-IID client shards),
  2. REALLY fine-tune each client locally (``fl/training``),
  3. drop their checkpoints through the atomic-rename ingestion protocol
     with ``num_local_data_train`` metadata (drives the FedAvg ratios),
  4. run ``driver.start()`` — checkpoint wait, delta ingestion, batched
     coalition evaluation, comp-contrib Shapley — and print the per-client
     Shapley values.

For the continuous multi-epoch service loop see ``examples/serve_demo.py``;
this module is the fastest "does the whole stack work here?" probe
(used as the drive recipe by reviewers and ops runbooks).
"""

from __future__ import annotations

import os
import tempfile
from typing import Optional

import numpy as np


def run_demo(
    out_dir: Optional[str] = None,
    n_clients: int = 3,
    local_steps: int = 4,
    variant: str = "micro",
    image_size: int = 16,
    seed: int = 0,
):
    """Run the one-shot flow; returns (all_rounds_sv, sv_sum, out_dir)."""
    import importlib

    import jax
    import optax

    from shapley_vit_tpu.config import Config
    from shapley_vit_tpu.data.partition import partition_labeldir
    from shapley_vit_tpu.data.registry import get_dataset
    from shapley_vit_tpu.fl import ingestion
    from shapley_vit_tpu.fl import training as tr
    from shapley_vit_tpu.models import vit as jvit

    start_mod = importlib.import_module("shapley_vit_tpu.driver.start")

    out_dir = out_dir or tempfile.mkdtemp(prefix="svt_demo_")
    cfg = Config()
    cfg.model.vit_variant = variant
    cfg.model.model_type = f"ViT-{variant}"
    cfg.data.image_size = image_size
    cfg.data.eval_batch_size = 32
    cfg.data.synthetic_scale = 0.02
    cfg.obs.exp_dir = os.path.join(out_dir, "exp")
    cfg.paths.validation_dataset = ""  # synthetic OCT layout
    cfg.paths.local_model_path = os.path.join(out_dir, "local")
    cfg.paths.global_model_path = os.path.join(out_dir, "global")
    cfg.shapley.num_clients = n_clients

    spec, base, init_lora = start_mod.build_model(cfg)

    # non-IID client shards of the synthetic training split
    splits, info = get_dataset(
        cfg.data.dataset_type,
        data_dir=cfg.paths.validation_dataset,
        synthetic_scale=cfg.data.synthetic_scale,
    )
    train = splits["train"]
    _, mapping = partition_labeldir(
        train.labels, num_classes=info["num_classes"], n_parties=n_clients,
        beta=0.5, seed=seed + 42,
    )
    opt = optax.adam(5e-3)
    step = tr.make_train_step(
        lambda b, l, x: jvit.vit_forward(b, l, x, spec), opt, spec.num_classes
    )
    paths = []
    for cid in range(n_clients):
        idx = mapping[cid][:64]
        x = train.images[idx]
        if x.shape[1] != spec.image:
            x = np.asarray(
                jax.image.resize(x, (len(idx), spec.image, spec.image, 3), "bilinear")
            )
        x = jax.numpy.asarray(x.astype(np.float32))
        y = jax.numpy.asarray(train.labels[idx])
        lora, opt_state = init_lora, opt.init(init_lora)
        key = jax.random.key(seed * 100 + cid)
        for _ in range(local_steps):
            key, sub = jax.random.split(key)
            lora, opt_state, _ = step(base, lora, opt_state, x, y, sub)
        p = os.path.join(
            cfg.paths.local_model_path, f"client_{cid + 1}_model",
            "ViT_epoch_9.npz",
        )
        ingestion.save_lora_checkpoint(
            p, lora, spec, num_local_data_train=int(len(mapping[cid]))
        )
        paths.append(p)

    all_rounds, sv_sum = start_mod.start(cfg, checkpoint_paths=paths)
    return all_rounds, sv_sum, out_dir


def main():
    all_rounds, sv_sum, out_dir = run_demo()
    print(f"demo artifacts: {out_dir}")
    print(f"per-round Shapley values: {all_rounds}")
    print(f"SV sums (efficiency axiom): {sv_sum}")


if __name__ == "__main__":
    main()
