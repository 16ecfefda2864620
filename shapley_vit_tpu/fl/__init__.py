"""Federated-learning core: eval clients/server records, the evaluation
primitive (single-model and coalition-batched), checkpoint ingestion, and
local-training utilities (reference client2.py / server2.py / utils.py)."""

from shapley_vit_tpu.fl.evaluation import (  # noqa: F401
    eval_step_metrics,
    evaluate_model,
    make_coalition_evaluator,
)
from shapley_vit_tpu.fl.client import EvalClient  # noqa: F401
from shapley_vit_tpu.fl.server import EvalServer  # noqa: F401
