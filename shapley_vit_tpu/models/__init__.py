"""Model layer: functional param-pytree ViT with LoRA overlay (the live-path
model, reference start.py:258-288) plus the reference's model zoo
(networks.py) re-built as functional JAX models."""

from shapley_vit_tpu.models.vit import (  # noqa: F401
    ViTSpec,
    VIT_VARIANTS,
    init_vit,
    init_lora,
    vit_forward,
    trainable_params,
    merge_lora,
)
