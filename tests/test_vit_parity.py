"""Numerical parity of our functional ViT against the reference semantics:
``transformers.ViTForImageClassification`` (+ peft LoRA) on random weights.

This is the rebuild's contract with the reference hot leaf ``net(img).logits``
(reference utils.py:887, model built at start.py:258-276). No hub download —
HF models are constructed from a local ViTConfig with random init.
"""

import numpy as np
import pytest

import jax

from shapley_vit_tpu.models import vit as jvit
from shapley_vit_tpu.models import convert

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def make_hf_model(spec: jvit.ViTSpec, seed=0):
    from transformers import ViTConfig, ViTForImageClassification

    torch.manual_seed(seed)
    cfg = ViTConfig(
        hidden_size=spec.hidden,
        num_hidden_layers=spec.depth,
        num_attention_heads=spec.heads,
        intermediate_size=spec.mlp_dim,
        image_size=spec.image,
        patch_size=spec.patch,
        num_channels=spec.channels,
        num_labels=spec.num_classes,
    )
    model = ViTForImageClassification(cfg)
    model.eval()
    return model


@pytest.fixture(scope="module")
def micro_spec():
    return jvit.make_spec("micro", num_classes=4)


@pytest.fixture(scope="module")
def hf_and_tree(micro_spec):
    model = make_hf_model(micro_spec)
    base = convert.hf_vit_to_base_tree(model.state_dict(), micro_spec)
    return model, base


def _hf_logits(model, images_nhwc):
    with torch.no_grad():
        x = torch.from_numpy(np.ascontiguousarray(images_nhwc.transpose(0, 3, 1, 2)))
        return model(x).logits.numpy()


def test_base_forward_matches_hf(hf_and_tree, micro_spec, rng):
    model, base = hf_and_tree
    images = rng.normal(size=(3, micro_spec.image, micro_spec.image, 3)).astype(np.float32)
    ours = np.asarray(jvit.vit_forward(base, None, images, micro_spec))
    theirs = _hf_logits(model, images)
    np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=1e-4)


def test_base_forward_matches_hf_base_variant(rng):
    # one depth-12 config to catch scan-stacking mistakes micro can't see
    spec = jvit.make_spec("tiny", image=32, num_classes=4)
    model = make_hf_model(spec, seed=1)
    base = convert.hf_vit_to_base_tree(model.state_dict(), spec)
    images = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    ours = np.asarray(jvit.vit_forward(base, None, images, spec))
    theirs = _hf_logits(model, images)
    np.testing.assert_allclose(ours, theirs, atol=5e-5, rtol=1e-3)


def test_lora_forward_matches_peft(hf_and_tree, micro_spec, rng):
    peft = pytest.importorskip("peft")
    model, base = hf_and_tree
    # exact reference LoRA config (start.py:274-276)
    lcfg = peft.LoraConfig(
        r=micro_spec.lora_r,
        lora_alpha=int(micro_spec.lora_alpha),
        target_modules=["query", "value"],
        lora_dropout=0.05,
        bias="none",
        modules_to_save=["classifier"],
    )
    torch.manual_seed(7)
    pmodel = peft.get_peft_model(make_hf_model(micro_spec), lcfg)
    # give LoRA B and classifier nonzero values so the overlay actually matters
    with torch.no_grad():
        for name, p in pmodel.named_parameters():
            if "lora_B" in name or "modules_to_save" in name:
                p.add_(torch.randn_like(p) * 0.05)
    pmodel.eval()

    lora_tree = convert.peft_lora_to_tree(pmodel.state_dict(), micro_spec)
    images = rng.normal(size=(2, micro_spec.image, micro_spec.image, 3)).astype(np.float32)
    with torch.no_grad():
        x = torch.from_numpy(np.ascontiguousarray(images.transpose(0, 3, 1, 2)))
        theirs = pmodel(x).logits.numpy()
    ours = np.asarray(jvit.vit_forward(base, lora_tree, images, micro_spec))
    np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=1e-4)


def test_lora_roundtrip_export(micro_spec):
    key = jax.random.key(0)
    lora = jvit.init_lora(key, micro_spec)
    # make B nonzero so the roundtrip is non-trivial
    lora["lora"]["q"]["B"] = lora["lora"]["q"]["B"] + 0.3
    sd = convert.tree_to_peft_lora(lora, micro_spec)
    back = convert.peft_lora_to_tree(sd, micro_spec)
    for t in ("q", "v"):
        np.testing.assert_allclose(np.asarray(lora["lora"][t]["A"]), back["lora"][t]["A"], atol=1e-7)
        np.testing.assert_allclose(np.asarray(lora["lora"][t]["B"]), back["lora"][t]["B"], atol=1e-7)
    np.testing.assert_allclose(np.asarray(lora["classifier"]["kernel"]), back["classifier"]["kernel"], atol=1e-7)


def test_zero_lora_is_identity_when_head_copied(hf_and_tree, micro_spec, rng):
    model, base = hf_and_tree
    lora = jvit.init_lora(jax.random.key(3), micro_spec, classifier_from=base)
    images = rng.normal(size=(2, micro_spec.image, micro_spec.image, 3)).astype(np.float32)
    plain = np.asarray(jvit.vit_forward(base, None, images, micro_spec))
    overlaid = np.asarray(jvit.vit_forward(base, lora, images, micro_spec))
    np.testing.assert_allclose(plain, overlaid, atol=1e-6)


def test_merge_lora_matches_overlay(hf_and_tree, micro_spec, rng):
    _, base = hf_and_tree
    lora = jvit.init_lora(jax.random.key(5), micro_spec, classifier_from=base)
    lora["lora"]["q"]["B"] = lora["lora"]["q"]["B"] + 0.1
    lora["lora"]["v"]["B"] = lora["lora"]["v"]["B"] - 0.07
    images = rng.normal(size=(2, micro_spec.image, micro_spec.image, 3)).astype(np.float32)
    overlay = np.asarray(jvit.vit_forward(base, lora, images, micro_spec))
    merged = jvit.merge_lora(base, lora, micro_spec)
    folded = np.asarray(jvit.vit_forward(merged, None, images, micro_spec))
    np.testing.assert_allclose(overlay, folded, atol=2e-5, rtol=1e-4)
