"""Parallelism layer: device mesh construction and sharded coalition/eval/
training steps (SURVEY.md §2.3 — replaces nn.DataParallel + the inert
torch.distributed flags with jax.sharding over a TPU mesh)."""

from shapley_vit_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    replicated,
    shard_batch,
    shard_coalitions,
)
from shapley_vit_tpu.parallel.coalition_eval import (  # noqa: F401
    EvalBackend,
    make_eval_backend,
    make_sharded_coalition_evaluator,
    shard_batches,
)
