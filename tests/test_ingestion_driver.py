"""Ingestion + driver tests: atomic checkpoint protocol, straggler policies,
torch/.npz interop, and the full start() flow on a micro config."""

import os
import threading
import time

import jax
import numpy as np
import pytest

from shapley_vit_tpu.config import Config
from shapley_vit_tpu.fl import ingestion
from shapley_vit_tpu.models import vit as jvit
from shapley_vit_tpu.ops import tree_math as tm


@pytest.fixture
def micro_spec():
    return jvit.make_spec("micro", num_classes=4)


def make_lora(micro_spec, seed, scale=0.1):
    lora = jvit.init_lora(jax.random.key(seed), micro_spec)
    leaves, treedef = jax.tree.flatten(lora)
    ks = jax.random.split(jax.random.key(seed + 100), len(leaves))
    return treedef.unflatten(
        [l + scale * jax.random.normal(k, l.shape) for k, l in zip(ks, leaves)]
    )


def test_npz_checkpoint_roundtrip(tmp_path, micro_spec):
    lora = make_lora(micro_spec, 1)
    path = str(tmp_path / "client_1_model" / "ViT_epoch_9.npz")
    ingestion.save_lora_checkpoint(path, lora, micro_spec)
    back = ingestion.load_client_lora(path, micro_spec)
    assert tm.tree_allclose(lora, back, atol=1e-7)
    assert not os.path.exists(path + ".tmp")  # atomic rename cleaned up


def test_torch_checkpoint_roundtrip(tmp_path, micro_spec):
    pytest.importorskip("torch")
    lora = make_lora(micro_spec, 2)
    path = str(tmp_path / "client_1_model" / "ViT_epoch_9.pth.tar")
    ingestion.save_lora_checkpoint(path, lora, micro_spec)
    back = ingestion.load_client_lora(path, micro_spec)
    assert tm.tree_allclose(lora, back, atol=1e-7)


def test_peft_checkpoint_with_wrappers_loads(tmp_path, micro_spec):
    """A reference-style checkpoint carries peft + DataParallel prefixes."""
    pytest.importorskip("torch")
    import torch

    from shapley_vit_tpu.models import convert

    lora = make_lora(micro_spec, 3)
    sd = convert.tree_to_peft_lora(lora, micro_spec, prefix="base_model.model.")
    wrapped = {f"module.{k}": torch.from_numpy(v) for k, v in sd.items()}
    path = str(tmp_path / "ckpt.pth.tar")
    torch.save({"state_dict": wrapped}, path)
    back = ingestion.load_client_lora(path, micro_spec)
    assert tm.tree_allclose(lora, back, atol=1e-7)


def test_wait_for_checkpoints_policies(tmp_path):
    p1, p2 = str(tmp_path / "a.npz"), str(tmp_path / "b.npz")
    ingestion.atomic_save_npz(p1, {"x": np.zeros(1)})

    r = ingestion.wait_for_checkpoints([p1, p2], timeout=0.0, policy="skip", _sleep=lambda s: None)
    assert r.arrived == [True, False] and r.paths == [p1, None]

    with pytest.raises(TimeoutError):
        ingestion.wait_for_checkpoints([p1, p2], timeout=0.0, policy="fail", _sleep=lambda s: None)

    with pytest.raises(ValueError):
        ingestion.wait_for_checkpoints([p1], policy="bogus")

    # 'wait' blocks until a writer delivers (reference behavior start.py:212-219)
    def deliver():
        time.sleep(0.2)
        ingestion.atomic_save_npz(p2, {"x": np.zeros(1)})

    t = threading.Thread(target=deliver)
    t.start()
    r = ingestion.wait_for_checkpoints([p1, p2], timeout=0.05, policy="wait", poll_interval=0.05)
    t.join()
    assert all(r.arrived)


@pytest.mark.parametrize("use_native", [True, False])
def test_wait_for_checkpoints_should_stop(tmp_path, use_native):
    """A drain (should_stop) escapes an otherwise-indefinite wait EARLY with
    the arrived subset and never raises — under both the sliced native
    inotify backend and the pure-Python poll loop."""
    p1, p2 = str(tmp_path / "a.npz"), str(tmp_path / "b.npz")
    ingestion.atomic_save_npz(p1, {"x": np.zeros(1)})

    calls = {"n": 0}

    def stop():
        calls["n"] += 1
        return calls["n"] >= 2

    t0 = time.time()
    r = ingestion.wait_for_checkpoints(
        [p1, p2], timeout=30.0, policy="fail", poll_interval=0.05,
        use_native=use_native, should_stop=stop,
    )
    assert r.arrived == [True, False] and r.paths == [p1, None]
    assert time.time() - t0 < 10  # escaped long before the 30s timeout

    # already-stopped: returns immediately, even under policy='wait'
    r = ingestion.wait_for_checkpoints(
        [p2], policy="wait", poll_interval=0.05,
        use_native=use_native, should_stop=lambda: True,
    )
    assert r.arrived == [False]


@pytest.mark.parametrize("fname", ["ViT_epoch_9.npz", "ViT_epoch_9.pth.tar"])
def test_checkpoint_metadata_roundtrip(tmp_path, micro_spec, fname):
    """num_local_data_train metadata survives both checkpoint formats and is
    surfaced by ingest_clients as the per-client FedAvg weight."""
    if fname.endswith(".pth.tar"):
        pytest.importorskip("torch")
    init = jvit.init_lora(jax.random.key(0), micro_spec)
    paths, want = [], [120, 300]
    for i, n in enumerate(want):
        p = str(tmp_path / f"client_{i + 1}_model" / fname)
        ingestion.save_lora_checkpoint(
            p, make_lora(micro_spec, i), micro_spec, num_local_data_train=n
        )
        paths.append(p)
    assert ingestion.load_checkpoint_metadata(paths[0]) == {
        "num_local_data_train": 120
    }
    _deltas, sel, sizes = ingestion.ingest_clients(paths, init, micro_spec)
    assert sel == [True, True]
    assert sizes == want


def test_checkpoint_without_metadata_yields_none_size(tmp_path, micro_spec):
    init = jvit.init_lora(jax.random.key(0), micro_spec)
    p = str(tmp_path / "client_1_model" / "ViT_epoch_9.npz")
    ingestion.save_lora_checkpoint(p, make_lora(micro_spec, 0), micro_spec)
    _d, _s, sizes = ingestion.ingest_clients([p], init, micro_spec)
    assert sizes == [None]


def test_ingest_clients_skips_missing(micro_spec):
    init = jvit.init_lora(jax.random.key(0), micro_spec)
    deltas, sel, sizes = ingestion.ingest_clients([None, None], init, micro_spec)
    assert deltas == [None, None] and sel == [False, False]
    assert sizes == [None, None]


def test_start_end_to_end(tmp_path, micro_spec, monkeypatch):
    """Full driver flow on a micro config: synthetic OCT data, three fake
    clients dropping .npz checkpoints, Shapley round, CSV + utility table."""
    cfg = Config()
    cfg.model.vit_variant = "micro"
    cfg.data.image_size = 16
    cfg.data.eval_batch_size = 32
    cfg.obs.exp_dir = str(tmp_path / "exp")
    cfg.paths.validation_dataset = str(tmp_path / "no_oct_here")  # -> synthetic
    cfg.paths.global_model_path = str(tmp_path / "global")
    cfg.data.synthetic_scale = 0.02
    cfg.shapley.seed = 0

    # fake clients: init + noise, written with the atomic protocol
    import importlib

    start_mod = importlib.import_module("shapley_vit_tpu.driver.start")

    spec, base, init_lora = start_mod.build_model(cfg)
    paths = []
    for i in range(3):
        lora_i = tm.tree_add(init_lora, jax.tree.map(
            lambda l: 0.05 * jax.random.normal(jax.random.key(i), l.shape), init_lora
        ))
        p = str(tmp_path / f"client_{i+1}_model" / "ViT_epoch_9.npz")
        ingestion.save_lora_checkpoint(p, lora_i, spec)
        paths.append(p)

    all_rounds, sv_sum = start_mod.start(cfg, checkpoint_paths=paths)

    assert len(all_rounds) == 2  # acc + loss dims
    assert len(all_rounds[0]) == 2  # round-0 seed + round-1 estimate
    # round-0 seeding: prev/3 per client, identical across clients
    seed_sv = all_rounds[0][0]
    assert len(set(round(v, 9) for v in seed_sv.values())) == 1
    # sum dict accumulated both rounds
    assert set(sv_sum[0]) == {0, 1, 2}
    # artifacts exist
    out = cfg.output_dir
    assert os.path.exists(os.path.join(out, "utility_table.npz"))
    csvs = [f for f in os.listdir(out) if f.endswith("_log.csv")]
    assert csvs, os.listdir(out)
    # utility table has at most 7 coalitions for n=3 (+ input fingerprint)
    with np.load(os.path.join(out, "utility_table.npz")) as z:
        coal_keys = [k for k in z.files if not k.startswith("__")]
        assert 1 <= len(coal_keys) <= 7
        assert "__fingerprint__" in z.files
    # global-model export honoured the GLOBAL_MODEL_PATH contract
    assert os.path.exists(os.path.join(str(tmp_path / "global"), "ViT_global.npz"))


def test_start_threads_metadata_sizes_into_game(tmp_path, monkeypatch):
    """Unequal num_local_data_train in checkpoint metadata must reach the
    Game's FedAvg weights (reference server2.py:68-81 — load-bearing for SV)."""
    cfg = Config()
    cfg.model.vit_variant = "micro"
    cfg.data.image_size = 16
    cfg.data.eval_batch_size = 32
    cfg.obs.exp_dir = str(tmp_path / "exp")
    cfg.paths.validation_dataset = str(tmp_path / "no_oct_here")
    cfg.data.synthetic_scale = 0.02

    import importlib

    start_mod = importlib.import_module("shapley_vit_tpu.driver.start")
    spec, base, init_lora = start_mod.build_model(cfg)

    want = [120, 300, 580]
    paths = []
    for i in range(3):
        lora_i = tm.tree_add(init_lora, jax.tree.map(
            lambda l: 0.05 * jax.random.normal(jax.random.key(i), l.shape), init_lora
        ))
        p = str(tmp_path / f"client_{i + 1}_model" / "ViT_epoch_9.npz")
        ingestion.save_lora_checkpoint(p, lora_i, spec, num_local_data_train=want[i])
        paths.append(p)

    seen = {}
    real_game = start_mod.Game

    def spy_game(*args, **kwargs):
        seen["num_local_data"] = list(kwargs["num_local_data"])
        return real_game(*args, **kwargs)

    monkeypatch.setattr(start_mod, "Game", spy_game)
    start_mod.start(cfg, checkpoint_paths=paths)
    assert seen["num_local_data"] == want


def test_ingest_clients_error_policies(tmp_path, micro_spec):
    """A corrupt checkpoint raises under 'raise' (one-shot driver) and is
    treated as not-arrived under 'skip' (long-running service)."""
    init = jvit.init_lora(jax.random.key(0), micro_spec)
    good = str(tmp_path / "client_1_model" / "ViT_epoch_0.npz")
    ingestion.save_lora_checkpoint(good, make_lora(micro_spec, 1), micro_spec,
                                   num_local_data_train=50)
    bad = str(tmp_path / "client_2_model" / "ViT_epoch_0.npz")
    os.makedirs(os.path.dirname(bad))
    with open(bad, "wb") as f:
        f.write(b"not an npz at all")

    with pytest.raises(Exception):
        ingestion.ingest_clients([good, bad], init, micro_spec)

    logs = []
    deltas, sel, sizes = ingestion.ingest_clients(
        [good, bad], init, micro_spec, on_error="skip", log_fn=logs.append
    )
    assert sel == [True, False]
    assert deltas[1] is None and sizes == [50, None]
    assert logs and "client_2_model" in logs[0]

    with pytest.raises(ValueError):
        ingestion.ingest_clients([good], init, micro_spec, on_error="bogus")


def test_start_tensorboard_scalars(tmp_path):
    """obs.use_tensorboard writes round-1 scalars from the one-shot driver
    too (the service loop's writer is covered in test_serve)."""
    import importlib
    import os

    import jax

    from shapley_vit_tpu.config import Config
    from shapley_vit_tpu.fl import ingestion
    from shapley_vit_tpu.ops import tree_math as tm

    start_mod = importlib.import_module("shapley_vit_tpu.driver.start")
    cfg = Config()
    cfg.model.model_type = "ViT-micro"
    cfg.data.eval_batch_size = 32
    cfg.data.synthetic_scale = 0.02
    cfg.obs.exp_dir = str(tmp_path / "exp")
    cfg.obs.use_tensorboard = True
    cfg.paths.validation_dataset = str(tmp_path / "none")
    cfg.paths.local_model_path = str(tmp_path / "local")
    spec, base, init_lora = start_mod.build_model(cfg)
    paths = []
    for i in range(3):
        lora_i = tm.tree_add(
            init_lora,
            jax.tree.map(
                lambda l, k=i: 0.05 * jax.random.normal(jax.random.key(k), l.shape),
                init_lora,
            ),
        )
        p = os.path.join(
            cfg.paths.local_model_path, f"client_{i + 1}_model", "ViT_epoch_9.npz"
        )
        ingestion.save_lora_checkpoint(p, lora_i, spec, num_local_data_train=50)
        paths.append(p)
    start_mod.start(cfg, checkpoint_paths=paths)
    tb_dir = os.path.join(cfg.output_dir, "tensorboard")
    assert any("tfevents" in f for f in os.listdir(tb_dir))


def test_client_driver_feeds_serve(tmp_path):
    """The writer side of the filesystem protocol: svt-client trains
    locally, drops epoch checkpoints with metadata, syncs from the
    server's global export — and serve() ingests it all end-to-end."""
    import importlib

    from shapley_vit_tpu.config import Config
    from shapley_vit_tpu.driver.client import latest_global_export, run_client
    from shapley_vit_tpu.driver.serve import serve

    cfg = Config()
    cfg.model.model_type = "ViT-micro"
    cfg.data.eval_batch_size = 32
    cfg.data.synthetic_scale = 0.02
    cfg.obs.exp_dir = str(tmp_path / "exp")
    cfg.obs.render_plots = False
    cfg.paths.validation_dataset = str(tmp_path / "none")
    cfg.paths.local_model_path = str(tmp_path / "local")
    cfg.paths.global_model_path = str(tmp_path / "global")

    # three clients each write epoch-0 checkpoints
    for cid in range(3):
        paths = run_client(cfg, client_id=cid, epochs=1, steps_per_epoch=2)
        assert len(paths) == 1 and paths[0].endswith("ViT_epoch_0.npz")
        meta = importlib.import_module(
            "shapley_vit_tpu.fl.ingestion"
        ).load_checkpoint_metadata(paths[0])
        assert meta["num_local_data_train"] > 0

    # the server runs a round against them with its DEFAULT (.pth.tar)
    # filename — the candidate-path watcher accepts the clients' .npz
    # siblings, so a mixed fleet converges with zero configuration
    records = serve(cfg, max_rounds=1, timeout=30.0, policy="fail")
    assert len(records) == 1 and len(records[0]["shapley"]) == 2
    g = latest_global_export(cfg.paths.global_model_path)
    assert g is not None and g.endswith("ViT_global_epoch_0.npz")

    # epoch 1: clients sync from the export before training
    paths = run_client(cfg, client_id=0, epochs=1, start_epoch=1)
    assert paths[0].endswith("ViT_epoch_1.npz")


def test_client_driver_pth_tar_format(tmp_path):
    """svt-client can feed a REFERENCE server: ckpt_format='pth.tar' writes
    the torch zip format through the torch-free writer; real torch.load
    reads it and finds the peft-named LoRA keys plus the size metadata."""
    import pytest
    torch = pytest.importorskip("torch")

    from shapley_vit_tpu.config import Config
    from shapley_vit_tpu.driver.client import run_client

    cfg = Config()
    cfg.model.model_type = "ViT-micro"
    cfg.data.synthetic_scale = 0.02
    cfg.obs.exp_dir = str(tmp_path / "exp")
    cfg.paths.validation_dataset = str(tmp_path / "none")
    cfg.paths.local_model_path = str(tmp_path / "local")
    paths = run_client(
        cfg, client_id=0, epochs=1, steps_per_epoch=1, ckpt_format="pth.tar"
    )
    assert paths[0].endswith("ViT_epoch_0.pth.tar")
    ckpt = torch.load(paths[0], map_location="cpu", weights_only=True)
    assert ckpt["num_local_data_train"] > 0
    assert any("lora_A" in k for k in ckpt["state_dict"])

    with pytest.raises(ValueError, match="ckpt_format"):
        run_client(cfg, client_id=0, epochs=1, ckpt_format="bogus")


def test_client_driver_dp_and_label_flip(tmp_path):
    """The reference's poisoning fixture and --noise-multiplier knob drive
    the client's local optimizer."""
    from shapley_vit_tpu.config import Config
    from shapley_vit_tpu.driver.client import run_client

    cfg = Config()
    cfg.model.model_type = "ViT-micro"
    cfg.data.synthetic_scale = 0.02
    cfg.obs.exp_dir = str(tmp_path / "exp")
    cfg.paths.validation_dataset = str(tmp_path / "none")
    cfg.paths.local_model_path = str(tmp_path / "local")
    cfg.train.label_flip_prob = 0.5
    assert run_client(cfg, client_id=0, epochs=1, steps_per_epoch=1)

    # DP-SGD is an explicit opt-in: the reference's noise_multiplier
    # DEFAULT is 0.5, so the flag alone must not switch optimizers
    cfg.train.use_dp = True
    cfg.train.lr = 0.05
    assert run_client(cfg, client_id=1, epochs=1, steps_per_epoch=1)
    import numpy as np
    import pytest

    with pytest.raises(ValueError):
        run_client(cfg, client_id=2, epochs=1, steps_per_epoch=0)
    with pytest.raises(ValueError):
        run_client(
            cfg, client_id=2, epochs=1,
            data=(np.zeros((0, 32, 32, 3), np.float32), np.zeros(0, np.int32)),
        )
