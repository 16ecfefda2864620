"""Weight conversion between torch/HF/peft checkpoints and our pytrees.

The reference's clients drop torch checkpoints on shared disk
(``ViT_epoch_9.pth.tar`` loaded at start.py:146-151 with ``th.load`` →
``load_state_dict``); this module is the ingestion bridge that turns those
state dicts into our base/LoRA pytrees. It is also what the parity tests use
to copy weights into ``transformers.ViTForImageClassification`` + peft models.

All functions take/return **numpy** state dicts (string key -> ndarray); the
caller detaches torch tensors (see :func:`torch_state_dict_to_numpy`), so jax
code never imports torch.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Optional

import numpy as np

from shapley_vit_tpu.models.vit import ViTSpec

PyTree = Any


def torch_state_dict_to_numpy(state_dict: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Detach a torch state dict to plain numpy (host-side, no grad)."""
    out = {}
    for k, v in state_dict.items():
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def _strip_prefixes(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Normalize key prefixes across the wrappers the reference stacks up:
    peft (``base_model.model.``), DataParallel (``module.``)."""
    out = {}
    for k, v in sd.items():
        k = re.sub(r"^(module\.)+", "", k)
        k = re.sub(r"^base_model\.model\.", "", k)
        k = re.sub(r"\.base_layer\.", ".", k)  # peft wraps target Linears
        # peft modules_to_save keeps the frozen copy under .original_module
        k = re.sub(r"\.original_module\.", ".", k)
        out[k] = v
    return out


def hf_vit_to_base_tree(state_dict: Mapping[str, Any], spec: ViTSpec) -> PyTree:
    """HF ``ViTForImageClassification`` state dict -> our frozen base tree.

    Layout transforms:
      * torch Linear ``[out, in]`` -> kernel ``[in, out]``
      * patch-embed Conv2d ``[D, C, ph, pw]`` -> ``[ph*pw*C, D]`` matching
        ``_patchify``'s (ph, pw, C) flattening order
      * per-layer tensors stacked on a leading depth axis for ``lax.scan``
    """
    sd = _strip_prefixes(torch_state_dict_to_numpy(state_dict))
    L = spec.depth

    def lin(prefix):
        w = sd[f"{prefix}.weight"]
        return {"kernel": w.T.copy(), "bias": sd[f"{prefix}.bias"].copy()}

    def stack_lin(fmt):
        ws = [sd[fmt.format(i) + ".weight"].T for i in range(L)]
        bs = [sd[fmt.format(i) + ".bias"] for i in range(L)]
        return {"kernel": np.stack(ws), "bias": np.stack(bs)}

    def stack_ln(fmt):
        return {
            "scale": np.stack([sd[fmt.format(i) + ".weight"] for i in range(L)]),
            "bias": np.stack([sd[fmt.format(i) + ".bias"] for i in range(L)]),
        }

    conv_w = sd["vit.embeddings.patch_embeddings.projection.weight"]  # [D,C,ph,pw]
    D = conv_w.shape[0]
    patch_kernel = conv_w.transpose(2, 3, 1, 0).reshape(-1, D).copy()

    tree = {
        "patch_embed": {
            "kernel": patch_kernel,
            "bias": sd["vit.embeddings.patch_embeddings.projection.bias"].copy(),
        },
        "cls_token": sd["vit.embeddings.cls_token"].copy(),
        "pos_embed": sd["vit.embeddings.position_embeddings"].copy(),
        "blocks": {
            "ln1": stack_ln("vit.encoder.layer.{}.layernorm_before"),
            "attn": {
                "q": stack_lin("vit.encoder.layer.{}.attention.attention.query"),
                "k": stack_lin("vit.encoder.layer.{}.attention.attention.key"),
                "v": stack_lin("vit.encoder.layer.{}.attention.attention.value"),
                "out": stack_lin("vit.encoder.layer.{}.attention.output.dense"),
            },
            "ln2": stack_ln("vit.encoder.layer.{}.layernorm_after"),
            "mlp": {
                "fc1": stack_lin("vit.encoder.layer.{}.intermediate.dense"),
                "fc2": stack_lin("vit.encoder.layer.{}.output.dense"),
            },
        },
        "final_ln": {
            "scale": sd["vit.layernorm.weight"].copy(),
            "bias": sd["vit.layernorm.bias"].copy(),
        },
        "classifier": lin("classifier"),
    }
    return tree


_LORA_A_RE = re.compile(
    r"vit\.encoder\.layer\.(\d+)\.attention\.attention\.(query|value)\.lora_A(?:\.default)?\.weight"
)
_LORA_B_RE = re.compile(
    r"vit\.encoder\.layer\.(\d+)\.attention\.attention\.(query|value)\.lora_B(?:\.default)?\.weight"
)
_CLS_RE = re.compile(
    r"classifier(?:\.modules_to_save(?:\.default)?)?\.(weight|bias)"
)


def peft_lora_to_tree(state_dict: Mapping[str, Any], spec: ViTSpec) -> PyTree:
    """peft LoRA state dict -> our trainable overlay tree.

    peft stores ``lora_A: [r, in]``, ``lora_B: [out, r]``; ours is
    ``A: [D, r] = lora_A.T``, ``B: [r, D] = lora_B.T`` so the overlay is
    ``x @ A @ B`` (identical math, MXU-friendly orientation). The classifier
    comes from peft's ``modules_to_save`` copy (start.py:276).
    """
    sd = _strip_prefixes(torch_state_dict_to_numpy(state_dict))
    L, D, r = spec.depth, spec.hidden, spec.lora_r
    short = {"query": "q", "value": "v"}
    A = {t: np.zeros((L, D, r), np.float32) for t in ("q", "v")}
    B = {t: np.zeros((L, r, D), np.float32) for t in ("q", "v")}
    cls_w = None
    cls_b = None
    found_a = set()
    for k, v in sd.items():
        m = _LORA_A_RE.fullmatch(k)
        if m:
            A[short[m.group(2)]][int(m.group(1))] = v.T
            found_a.add((int(m.group(1)), m.group(2)))
            continue
        m = _LORA_B_RE.fullmatch(k)
        if m:
            B[short[m.group(2)]][int(m.group(1))] = v.T
            continue
        m = _CLS_RE.fullmatch(k)
        if m:
            if m.group(1) == "weight":
                cls_w = v.T.copy()
            else:
                cls_b = v.copy()
    if len(found_a) != 2 * L:
        raise ValueError(
            f"expected LoRA A for query+value in all {L} layers, found {len(found_a)}"
        )
    if cls_w is None or cls_b is None:
        raise ValueError("classifier head missing from LoRA checkpoint")
    return {
        "lora": {t: {"A": A[t], "B": B[t]} for t in ("q", "v")},
        "classifier": {"kernel": cls_w, "bias": cls_b},
    }


def tree_to_peft_lora(lora_tree: PyTree, spec: ViTSpec, prefix: str = "base_model.model.") -> Dict[str, np.ndarray]:
    """Inverse of :func:`peft_lora_to_tree` — export our overlay in peft's
    naming so reference-side tooling can consume our checkpoints too."""
    out: Dict[str, np.ndarray] = {}
    long = {"q": "query", "v": "value"}
    for t in ("q", "v"):
        for i in range(spec.depth):
            stem = f"{prefix}vit.encoder.layer.{i}.attention.attention.{long[t]}"
            out[f"{stem}.lora_A.default.weight"] = np.asarray(lora_tree["lora"][t]["A"][i]).T.copy()
            out[f"{stem}.lora_B.default.weight"] = np.asarray(lora_tree["lora"][t]["B"][i]).T.copy()
    out[f"{prefix}classifier.modules_to_save.default.weight"] = (
        np.asarray(lora_tree["classifier"]["kernel"]).T.copy()
    )
    out[f"{prefix}classifier.modules_to_save.default.bias"] = np.asarray(
        lora_tree["classifier"]["bias"]
    ).copy()
    return out
