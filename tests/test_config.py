"""Config-layer tests: flag surface parity with reference opts.py + .env compat."""

import os

from shapley_vit_tpu.config import Config, build_arg_parser


def test_defaults_match_reference_opts():
    cfg = Config()
    # reference opts.py defaults
    assert cfg.dist.dist_num == 3           # opts.py:22
    assert cfg.train.lr == 3e-1             # opts.py:37
    assert cfg.train.epochs == 250          # opts.py:38
    assert cfg.train.train_batch == 8       # opts.py:39
    assert cfg.train.batch_size == 32       # opts.py:40
    assert cfg.data.patch_size == 256       # opts.py:64
    assert cfg.model.model_type == "ViT"    # opts.py:68
    assert cfg.data.dataset_type == "x-ray" # opts.py:83
    assert cfg.train.noise_multiplier == 0.5  # opts.py:87
    assert cfg.no_fl is True                # opts.py:18-20
    # live-path constants
    assert cfg.shapley.num_clients == 3     # start.py:101
    assert cfg.shapley.utility_dim == 2     # game2.py:30
    assert cfg.shapley.samples_per_client == 50  # utils_shapley.py:16
    assert cfg.data.eval_batch_size == 128  # start.py:84
    # LoRA config parity (start.py:274-276)
    assert cfg.model.lora_r == 16
    assert cfg.model.lora_alpha == 8.0
    assert tuple(cfg.model.lora_targets) == ("query", "value")


def test_arg_parser_accepts_reference_flag_spellings():
    # both --dash and --underscore spellings, as in opts.py
    ns = build_arg_parser().parse_args(
        ["--dist_num", "5", "--batch-size", "64", "--model_type", "resnet50",
         "--fl", "-lr", "0.01", "--patch-size", "128"]
    )
    assert ns.dist_num == 5
    assert ns.batch_size == 64
    assert ns.model_type == "resnet50"
    assert ns.no_fl is False
    assert ns.lr == 0.01
    assert ns.patch_size == 128


def test_from_args_populates_tree():
    cfg = Config.from_args(["--dist-num", "7", "--exp-id", "run42", "--mode", "test"])
    assert cfg.dist.dist_num == 7
    assert cfg.shapley.num_clients == 7
    assert cfg.obs.exp_id == "run42"
    assert cfg.data.mode == "test"
    assert cfg.output_dir == os.path.join("exp", "run42")


def test_no_import_side_effects(tmp_path):
    # Config() must not create directories (unlike reference opts.py:12-14)
    cfg = Config()
    cfg.obs.exp_dir = str(tmp_path / "exp")
    assert not os.path.exists(cfg.output_dir)
    cfg.ensure_output_dir()
    assert os.path.isdir(cfg.output_dir)


def test_env_file_compat(tmp_path, monkeypatch):
    # .env contract from reference start.py:22-28
    env = tmp_path / ".env"
    env.write_text(
        "LOCAL_MODEL_PATH=/data/local\n"
        "GLOBAL_MODEL_PATH=/data/global\n"
        "VALIDATION_DATASET=/data/val\n"
    )
    for var in ("LOCAL_MODEL_PATH", "GLOBAL_MODEL_PATH", "VALIDATION_DATASET"):
        monkeypatch.delenv(var, raising=False)
    cfg = Config.from_env(str(env))
    assert cfg.paths.local_model_path == "/data/local"
    assert cfg.paths.validation_dataset == "/data/val"
    # real env vars win
    monkeypatch.setenv("VALIDATION_DATASET", "/override")
    cfg = Config.from_env(str(env))
    assert cfg.paths.validation_dataset == "/override"


def test_log_lines_flat_dump():
    lines = Config().log_lines()
    assert any(l.startswith("model.lora_r,16") for l in lines)
    assert lines == sorted(lines)


def test_model_quant_config_reaches_spec():
    from shapley_vit_tpu.config import Config
    from shapley_vit_tpu.driver.start import build_model

    cfg = Config()
    cfg.model.vit_variant = "micro"
    cfg.model.quant = "int8"
    spec, base, lora = build_model(cfg)
    assert spec.quant == "int8"
    assert spec.quant_targets == ("q", "k", "v", "fc1")
    cfg.model.quant = "none"
    spec2, _, _ = build_model(cfg)
    assert spec2.quant == "none"


def test_mainshapley_cli_shim(tmp_path):
    """The CLI entry parses the reference flag surface end-to-end: --help
    exits 0 and shows the reference spellings; an unknown flag exits 2
    (reference mainShapley.py:1-3 -> opts.py argparse)."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS",)}
    out = subprocess.run(
        [sys.executable, "mainShapley.py", "--help"],
        capture_output=True, text=True, cwd=repo, env=env, timeout=120,
    )
    assert out.returncode == 0, out.stderr
    for flag in ("--model-type", "--dataset-type", "--dist-num", "--noise-multiplier"):
        assert flag in out.stdout

    bad = subprocess.run(
        [sys.executable, "mainShapley.py", "--no-such-flag"],
        capture_output=True, text=True, cwd=repo, env=env, timeout=120,
    )
    assert bad.returncode == 2


def test_console_entry_points_resolve():
    """Every [project.scripts] target must import to a callable."""
    import importlib
    import os
    import tomllib

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "pyproject.toml"), "rb") as f:
        scripts = tomllib.load(f)["project"]["scripts"]
    assert scripts, "no console scripts declared"
    for target in scripts.values():
        mod, fn = target.split(":")
        assert callable(getattr(importlib.import_module(mod), fn))


def test_svt_quant_env_opt_in(tmp_path, monkeypatch):
    """SVT_QUANT=int8 opts the drivers into the serve-path fast-eval mode
    (round-5 default decision: parity keeps quant='none', the env var is
    the production switch)."""
    monkeypatch.delenv("SVT_QUANT", raising=False)
    assert Config.from_env(str(tmp_path / "none")).model.quant == "none"
    monkeypatch.setenv("SVT_QUANT", "int8")
    assert Config.from_env(str(tmp_path / "none")).model.quant == "int8"
    monkeypatch.setenv("SVT_QUANT", "int4")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        Config.from_env(str(tmp_path / "none"))
