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
    cls_from_saved = {"weight": False, "bias": False}
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
            # peft keeps TWO classifier copies: the trainable
            # ``modules_to_save`` one and the frozen ``original_module`` one
            # (stripped to a bare ``classifier.*`` key). The trainable copy
            # must win regardless of state-dict key order.
            saved = "modules_to_save" in k
            name = m.group(1)
            if cls_from_saved[name] and not saved:
                continue
            cls_from_saved[name] = saved
            if name == "weight":
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


# ---------------------------------------------------------------------------
# Inception-v3 defense net: reference torch checkpoint -> flax variables
# (reference get_net loads ``inceptionv3_state.pth`` into ``net.net``,
# models/inception.py:495-509 — its py2 ``has_key`` made that path dead; this
# is the working equivalent for our flax Inception3.)
# ---------------------------------------------------------------------------

# flax nn.compact auto-names submodules in call order; these tables map each
# BasicConv2d_{i} to the reference's attribute (+ Sequential index) names.
_INCEPTION_STEM = ["conv2d_1a", "conv2d_2a", "conv2d_2b", "conv2d_3b", "conv2d_4a"]
_INCEPTION_BLOCKS = [
    ("InceptionA_0", "Mixed_5b"), ("InceptionA_1", "Mixed_5c"),
    ("InceptionA_2", "Mixed_5d"), ("InceptionB_0", "Mixed_6a"),
    ("InceptionC_0", "Mixed_6b"), ("InceptionC_1", "Mixed_6c"),
    ("InceptionC_2", "Mixed_6d"), ("InceptionC_3", "Mixed_6e"),
    ("InceptionD_0", "Mixed_7a"),
    ("InceptionE_0", "Mixed_7b"), ("InceptionE_1", "Mixed_7c"),
]
_BLOCK_CONV_ORDER = {
    # reference inception.py:10-37 (branch3 Sequential: [AvgPool, BasicConv2d])
    "InceptionA": ["branch0.0", "branch1.0", "branch1.1",
                   "branch2.0", "branch2.1", "branch2.2", "branch3.1"],
    # inception.py:41-58
    "InceptionB": ["branch0.0", "branch1.0", "branch1.1", "branch1.2"],
    # inception.py:62-93
    "InceptionC": ["branch0.0", "branch1.0", "branch1.1", "branch1.2",
                   "branch2.0", "branch2.1", "branch2.2", "branch2.3",
                   "branch2.4", "branch3.1"],
    # inception.py:96-114
    "InceptionD": ["branch0.0", "branch0.1",
                   "branch1.0", "branch1.1", "branch1.2", "branch1.3"],
    # inception.py:117-155 (branch1_*/branch2_* are bare attributes)
    "InceptionE": ["branch0.0", "branch1_0", "branch1_1", "branch1_2",
                   "branch2_0", "branch2_1", "branch2_2", "branch2_3",
                   "branch3.1"],
}


def torch_inception3_to_flax(
    state_dict: Mapping[str, Any], variables: PyTree
) -> PyTree:
    """Overlay a reference-format torch Inception3 state dict onto flax-init
    ``variables`` ({'params', 'batch_stats'} from ``Inception3.init`` or the
    paired defense ``Net.init``).

    Layout transforms: Conv2d ``[O, I, kh, kw]`` -> ``[kh, kw, I, O]``;
    BatchNorm weight/bias -> scale/bias, running stats -> batch_stats;
    Linear ``[O, I]`` -> ``[I, O]``. Keys absent from the state dict (e.g.
    the Denoise front-end, which the reference's pretrained file does not
    carry) keep their initialized values. Raises on unconsumed state-dict
    keys so silent partial loads are impossible.
    """
    import jax
    from flax.core import unfreeze

    sd = dict(torch_state_dict_to_numpy(state_dict))
    sd.pop("_metadata", None)
    # fresh mutable nested dicts with numpy leaves
    params = jax.tree.map(np.array, unfreeze(variables["params"]))
    bstats = jax.tree.map(np.array, unfreeze(variables["batch_stats"]))

    # the paired Net nests the inception under scope "net"
    if "BasicConv2d_0" in params:
        p_root, s_root = params, bstats
    elif "net" in params:
        p_root, s_root = params["net"], bstats["net"]
    else:
        raise ValueError("variables do not look like Inception3 or Net init")

    consumed = set()

    def take(key: str) -> Optional[np.ndarray]:
        if key in sd:
            consumed.add(key)
            return sd[key]
        return None

    def take_required(key: str) -> np.ndarray:
        v = take(key)
        if v is None:
            raise ValueError(
                f"truncated checkpoint: {key} missing while its sibling "
                "tensors are present"
            )
        return v

    def put_basic(p_parent, s_parent, flax_name: str, torch_prefix: str) -> None:
        w = take(f"{torch_prefix}.conv.weight")
        if w is None:
            return  # block not in the checkpoint at all: keep init
        dst_p = p_parent[flax_name]
        dst_s = s_parent[flax_name]
        expect = dst_p["Conv_0"]["kernel"].shape
        got = w.transpose(2, 3, 1, 0)
        if got.shape != expect:
            raise ValueError(
                f"{torch_prefix}: conv shape {got.shape} != flax {expect}"
            )
        dst_p["Conv_0"]["kernel"] = got.copy()
        dst_p["BatchNorm_0"]["scale"] = take_required(f"{torch_prefix}.bn.weight").copy()
        dst_p["BatchNorm_0"]["bias"] = take_required(f"{torch_prefix}.bn.bias").copy()
        dst_s["BatchNorm_0"]["mean"] = take_required(f"{torch_prefix}.bn.running_mean").copy()
        dst_s["BatchNorm_0"]["var"] = take_required(f"{torch_prefix}.bn.running_var").copy()
        take(f"{torch_prefix}.bn.num_batches_tracked")  # consume, unused

    for i, torch_name in enumerate(_INCEPTION_STEM):
        put_basic(p_root, s_root, f"BasicConv2d_{i}", torch_name)
    for flax_block, torch_block in _INCEPTION_BLOCKS:
        kind = flax_block.rsplit("_", 1)[0]
        blk_p = p_root[flax_block]
        blk_s = s_root[flax_block]
        for i, sub in enumerate(_BLOCK_CONV_ORDER[kind]):
            put_basic(blk_p, blk_s, f"BasicConv2d_{i}", f"{torch_block}.{sub}")
    w = take("classif.weight")
    if w is not None:
        if w.T.shape != p_root["Dense_0"]["kernel"].shape:
            raise ValueError(
                f"classif: shape {w.T.shape} != flax "
                f"{p_root['Dense_0']['kernel'].shape} (num_classes mismatch?)"
            )
        p_root["Dense_0"]["kernel"] = w.T.copy()
        p_root["Dense_0"]["bias"] = take_required("classif.bias").copy()

    leftovers = [k for k in sd if k not in consumed and not k.startswith("denoise.")]
    if leftovers:
        raise ValueError(f"unconsumed inception state-dict keys: {leftovers[:8]}")

    out = dict(variables)
    out["params"] = params
    out["batch_stats"] = bstats
    return out


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
