"""Local FL client driver — the WRITER side of the shared-filesystem
protocol.

The reference's client training lives outside its repo (the Shapley server
only ever reads ``LOCAL_MODEL_PATH/client_{i}_model/ViT_epoch_{e}.pth.tar``,
start.py:134-151); the in-repo remnant is the v1 ``ClientBase.local_training``
loop (client.py:44-76: per-epoch SGD with optional label flipping). This
driver completes the deployment story so a cross-silo client can run on this
framework alone:

  per epoch:  sync from the latest global export in GLOBAL_MODEL_PATH when
              one exists (the FedAvg round-trip the reference's external
              trainer performed) → local LoRA fine-tuning on the client's
              shard (label-flip fixture and DP-SGD via the reference's
              ``label_flip_prob`` / ``--noise-multiplier`` knobs) → drop
              ``ViT_epoch_{e}.npz`` with ``num_local_data_train`` metadata
              through the atomic-rename protocol.

``serve()`` / ``start()`` on the server side ingest exactly these files.
Console entry: ``svt-client --dist-rank <id> ...``.
"""

from __future__ import annotations

import glob
import os
import re
from typing import List, Optional, Tuple

import numpy as np

from shapley_vit_tpu.config import Config
from shapley_vit_tpu.fl import ingestion
from shapley_vit_tpu.utils.logging import get_logger


def latest_global_export(global_dir: Optional[str]) -> Optional[str]:
    """Newest global-overlay checkpoint the server exported, by epoch
    number (``ViT_global_epoch_{e}.npz``; the one-shot driver's un-numbered
    ``ViT_global.npz`` is used only when no numbered export exists)."""
    if not global_dir or not os.path.isdir(global_dir):
        return None
    best, best_epoch = None, -1
    for p in glob.glob(os.path.join(global_dir, "ViT_global_epoch_*.npz")):
        m = re.search(r"ViT_global_epoch_(\d+)\.npz$", p)
        if m and int(m.group(1)) > best_epoch:
            best, best_epoch = p, int(m.group(1))
    if best is None:
        plain = os.path.join(global_dir, "ViT_global.npz")
        if os.path.exists(plain):
            return plain
    return best


def run_client(
    cfg: Optional[Config] = None,
    client_id: int = 0,
    epochs: int = 1,
    steps_per_epoch: int = 4,
    data: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    start_epoch: int = 0,
    seed: int = 0,
    lr: Optional[float] = None,
    ckpt_format: Optional[str] = None,
) -> List[str]:
    """Train this client locally and drop per-epoch checkpoints; returns
    the written paths. ``data`` is the client's local (images, labels)
    shard; when None, a synthetic non-IID shard of the configured dataset
    stands in (offline runs / demos — same fallback as the server side).
    ``cfg.train.label_flip_prob`` poisons labels (reference client.py:53-59);
    ``cfg.train.use_dp`` with ``cfg.train.noise_multiplier > 0`` switches
    the local optimizer to DP-SGD at ``cfg.train.lr`` (the reference's
    flag, given a real consumer). ``lr`` sets the non-DP Adam rate; None
    keeps the 5e-3 default (the reference likewise hardcodes its in-repo
    Adam at lr=0.001 regardless of ``-lr``, start.py:62-66 — ``svt-client
    -lr ...`` passes it explicitly).

    ``ckpt_format``: ``"npz"`` (native, default) or ``"pth.tar"`` —
    reference torch format via the torch-free writer (fl/torch_ckpt.py),
    so this client can feed a REFERENCE server (which torch.loads
    ``ViT_epoch_{e}.pth.tar``, start.py:134-151) with no torch installed.
    Defaults from ``$SVT_CLIENT_CKPT_FORMAT``."""
    import importlib

    import jax
    import optax

    from shapley_vit_tpu.fl import training as tr
    from shapley_vit_tpu.models import vit as jvit

    start_mod = importlib.import_module("shapley_vit_tpu.driver.start")

    cfg = cfg or Config.from_env()
    fmt = ckpt_format or os.environ.get("SVT_CLIENT_CKPT_FORMAT", "npz")
    if fmt not in ("npz", "pth.tar"):
        raise ValueError(
            f"ckpt_format {fmt!r} not in ('npz', 'pth.tar') "
            "(set via argument or $SVT_CLIENT_CKPT_FORMAT)"
        )
    logger = get_logger()
    spec, base, init_lora = start_mod.build_model(cfg)
    fwd = lambda b, l, x: jvit.vit_forward(b, l, x, spec)

    if data is None:
        from shapley_vit_tpu.data.partition import partition_labeldir
        from shapley_vit_tpu.data.registry import get_dataset

        splits, info = get_dataset(
            cfg.data.dataset_type,
            data_dir=cfg.paths.validation_dataset or cfg.data.data_dir,
            synthetic_ok=True,
            seed=cfg.shapley.seed,
            synthetic_scale=cfg.data.synthetic_scale,
        )
        train = splits["train"]
        _, mapping = partition_labeldir(
            train.labels, num_classes=info["num_classes"],
            n_parties=max(cfg.shapley.num_clients, client_id + 1),
            beta=0.5, seed=cfg.shapley.seed + 42,
        )
        idx = mapping[client_id]
        images, labels = train.images[idx], train.labels[idx]
    else:
        images, labels = data
    if images.shape[1] != spec.image:
        images = np.asarray(
            jax.image.resize(
                images.astype(np.float32),
                (len(images), spec.image, spec.image, images.shape[-1]),
                "bilinear",
            )
        )
    n_local = int(len(labels))
    if n_local == 0:
        raise ValueError(f"client {client_id} has an empty local shard")
    if steps_per_epoch < 1:
        raise ValueError("steps_per_epoch must be >= 1")
    batch = min(cfg.train.train_batch * 8, n_local) or 1

    # DP-SGD is an explicit opt-in (cfg.train.use_dp): the reference's
    # --noise-multiplier DEFAULT is 0.5, so a >0 multiplier alone must not
    # silently switch optimizers. Label flipping applies in BOTH modes
    # (the DP step has no built-in flip; it is applied host-side below).
    dp = cfg.train.use_dp and cfg.train.noise_multiplier > 0
    if dp:
        step, _opt = tr.make_dp_train_step(
            fwd, learning_rate=cfg.train.lr, l2_norm_clip=1.0,
            noise_multiplier=cfg.train.noise_multiplier,
            seed=seed + client_id, num_classes=spec.num_classes,
        )
        init_opt_state = _opt.init
    else:
        opt = optax.adam(5e-3 if lr is None else lr)
        step = tr.make_train_step(
            fwd, opt, spec.num_classes,
            label_flip_prob=cfg.train.label_flip_prob,
        )
        init_opt_state = opt.init

    root = cfg.paths.local_model_path or os.path.join(os.getcwd(), "local_training")
    rng = np.random.default_rng(seed * 1000 + client_id)
    key = jax.random.key(seed * 1000 + client_id)
    lora = init_lora
    state = init_opt_state(lora)
    last_global: Optional[str] = None
    written: List[str] = []
    for epoch in range(start_epoch, start_epoch + epochs):
        # FedAvg round-trip: adopt the server's latest exported global.
        # Adopting a NEW global resets the optimizer state (fresh moments
        # for fresh weights); otherwise training continues where the
        # previous epoch left off — state is never silently discarded.
        g = latest_global_export(cfg.paths.global_model_path)
        if g is not None and g != last_global:
            try:
                lora = ingestion.load_client_lora(g, spec)
                state = init_opt_state(lora)
                if dp:
                    # init restores the DP noise key to its seed — left
                    # alone, every adoption would REPLAY the same noise
                    # stream (differencing two rounds' checkpoints cancels
                    # it, voiding the guarantee); give each adoption a
                    # fresh split of the client's key chain
                    key, sub = jax.random.split(key)
                    state = tr.refresh_dp_noise_key(state, sub)
                last_global = g
                logger.info(f"client {client_id}: synced from {os.path.basename(g)}")
            except Exception as e:
                logger.info(f"client {client_id}: ignoring unreadable global {g}: {e}")
        for _ in range(steps_per_epoch):
            take = rng.choice(n_local, size=batch, replace=n_local < batch)
            x = jax.numpy.asarray(images[take].astype(np.float32))
            y = jax.numpy.asarray(labels[take])
            if dp:
                if cfg.train.label_flip_prob > 0:
                    key, sub = jax.random.split(key)
                    y = tr.label_flip(
                        sub, y, spec.num_classes, cfg.train.label_flip_prob
                    )
                lora, state, loss = step(base, lora, state, x, y)
            else:
                key, sub = jax.random.split(key)
                lora, state, loss = step(base, lora, state, x, y, sub)
        p = os.path.join(
            root, f"client_{client_id + 1}_model", f"ViT_epoch_{epoch}.{fmt}"
        )
        ingestion.save_lora_checkpoint(p, lora, spec, num_local_data_train=n_local)
        written.append(p)
        logger.info(
            f"client {client_id}: epoch {epoch} done "
            f"(loss {float(loss):.4f}) -> {p}"
        )
    return written


def main(argv=None):
    """Console entry (``svt-client``): the reference CLI flags + .env path
    contract; ``--dist-rank`` selects the client id (the reference's party
    rank)."""
    import sys

    args = sys.argv[1:] if argv is None else argv
    cfg = Config.from_args(args)
    cfg.paths = Config.from_env().paths
    run_client(
        cfg,
        client_id=cfg.dist.dist_rank,
        epochs=max(1, cfg.train.epoch_end - cfg.train.epoch_st),
        start_epoch=cfg.train.epoch_st,
        # honor an EXPLICIT -lr; the bare default (3e-1, reference parity)
        # would diverge LoRA-Adam, and the reference itself ignores -lr for
        # its in-repo Adam (start.py:62-66)
        lr=cfg.train.lr if "-lr" in args else None,
    )
    # the console wrapper calls sys.exit(main()): returning the written
    # paths list would print it to stderr and exit 1 on SUCCESS
    return 0


if __name__ == "__main__":
    main()
