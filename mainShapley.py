"""CLI shim (reference mainShapley.py:1-3: ``from shapleyserver.start import
start; start()``) — parses the reference flag surface into the typed config."""

import sys

from shapley_vit_tpu.config import Config
from shapley_vit_tpu.driver.start import start

if __name__ == "__main__":
    cfg = Config.from_args(sys.argv[1:])
    env_cfg = Config.from_env()
    cfg.paths = env_cfg.paths
    start(cfg)
