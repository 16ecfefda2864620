"""North-star parity: Shapley values within 1e-4 of a torch-CPU serial
reference pipeline (BASELINE.json: "attribution values match the CPU
reference bitwise-tolerant... within 1e-4").

The reference side reproduces the live-path semantics end-to-end in torch:
per-coalition FedAvg over the peft state dicts (A/B factors averaged
separately, exactly as ``get_aggregated_model`` averages state-dict entries,
utils.py:781-792), ``load_state_dict`` apply, ``CrossEntropyLoss(sum)``/N
evaluation (utils.py:864-926), utilities as deltas vs the initial model
(game2.py:113-114), exact factorial-form SV (utils_shapley.py:185-203).

Our side ingests the SAME .pth.tar checkpoint files through fl/ingestion and
runs the batched coalition evaluator + shapley_exact in f32 parity mode.
"""

from itertools import chain, combinations
from math import factorial

import numpy as np
import pytest

import jax

from shapley_vit_tpu.fl import evaluation as ev
from shapley_vit_tpu.fl import ingestion
from shapley_vit_tpu.models import convert
from shapley_vit_tpu.models import vit as jvit
from shapley_vit_tpu.ops import tree_math as tm
from shapley_vit_tpu.shapley import Game, shapley_exact

torch = pytest.importorskip("torch")
peft = pytest.importorskip("peft")


def powerset(n):
    return list(chain.from_iterable(combinations(range(n), r) for r in range(1, n + 1)))


def exact_sv(utilities, n):
    coef = {s: factorial(s) * factorial(n - s - 1) / factorial(n) for s in range(n)}
    sv = np.zeros((2, n))
    for S in powerset(n):
        u = utilities[frozenset(S)]
        for d in range(2):
            for j in S:
                sv[d][j] += coef[len(S) - 1] * u[d]
            for j in set(range(n)) - set(S):
                sv[d][j] -= coef[len(S)] * u[d]
    return sv


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    """Build a micro HF ViT + 3 peft LoRA clients; save reference-format
    checkpoints; fixed validation set."""
    from transformers import ViTConfig, ViTForImageClassification

    tmp = tmp_path_factory.mktemp("parity")
    spec = jvit.make_spec("micro", num_classes=4)
    torch.manual_seed(0)
    base_model = ViTForImageClassification(
        ViTConfig(
            hidden_size=spec.hidden, num_hidden_layers=spec.depth,
            num_attention_heads=spec.heads, intermediate_size=spec.mlp_dim,
            image_size=spec.image, patch_size=spec.patch, num_labels=4,
        )
    )
    lcfg = peft.LoraConfig(
        r=spec.lora_r, lora_alpha=int(spec.lora_alpha),
        target_modules=["query", "value"], lora_dropout=0.0,
        bias="none", modules_to_save=["classifier"],
    )
    init_model = peft.get_peft_model(base_model, lcfg).eval()

    # three clients: init + per-client noise on the trainable params
    ckpts = []
    for cid in range(3):
        torch.manual_seed(100 + cid)
        client = peft.get_peft_model(
            ViTForImageClassification(base_model.config), lcfg
        )
        client.load_state_dict(init_model.state_dict())
        with torch.no_grad():
            for name, p in client.named_parameters():
                if "lora_" in name or "modules_to_save" in name:
                    p.add_(torch.randn_like(p) * 0.05)
        client.eval()
        path = str(tmp / f"client_{cid + 1}_model" / "ViT_epoch_9.pth.tar")
        import os

        os.makedirs(os.path.dirname(path), exist_ok=True)
        # data sizes ride as checkpoint metadata (ingestion contract): the
        # parity bar below only holds if ingest_clients recovers them and
        # they flow into the FedAvg ratios
        torch.save(
            {"state_dict": client.state_dict(),
             "num_local_data_train": [100, 250, 650][cid]},
            path,
        )
        ckpts.append(path)

    rng = np.random.default_rng(7)
    images = rng.normal(size=(16, spec.image, spec.image, 3)).astype(np.float32)
    labels = rng.integers(0, 4, size=16)
    sizes = [100.0, 250.0, 650.0]
    return dict(
        spec=spec, init_model=init_model, ckpts=ckpts,
        images=images, labels=labels, sizes=sizes, lcfg=lcfg,
        base_config=base_model.config,
    )


def torch_evaluate(model, images, labels):
    """Reference evaluation semantics (utils.py:864-926)."""
    with torch.no_grad():
        x = torch.from_numpy(np.ascontiguousarray(images.transpose(0, 3, 1, 2)))
        logits = model(x).logits
        loss = torch.nn.CrossEntropyLoss(reduction="sum")(
            logits, torch.from_numpy(labels.astype(np.int64))
        )
        acc = (logits.argmax(1).numpy() == labels).mean()
    return float(acc), float(loss) / len(labels)


def torch_reference_sv(s):
    """Serial torch pipeline -> exact SV."""
    init_sd = {k: v.clone() for k, v in s["init_model"].state_dict().items()}
    trainable_keys = [
        k for k in init_sd if "lora_" in k or "modules_to_save" in k
    ]
    client_sds = [torch.load(p, weights_only=False)["state_dict"] for p in s["ckpts"]]
    # deltas vs init over the trainable entries (utils.py:735-749)
    deltas = [
        {k: sd[k] - init_sd[k] for k in trainable_keys} for sd in client_sds
    ]
    prev = torch_evaluate(s["init_model"], s["images"], s["labels"])

    eval_model = peft.get_peft_model(
        __import__("transformers").ViTForImageClassification(s["base_config"]), s["lcfg"]
    ).eval()

    utilities = {}
    sizes = np.asarray(s["sizes"])
    for S in powerset(3):
        ratio = sizes[list(S)] / sizes[list(S)].sum()
        agg = {
            k: sum(r * deltas[j][k] for r, j in zip(ratio, S))
            for k in trainable_keys
        }
        sd = {k: v.clone() for k, v in init_sd.items()}
        for k in trainable_keys:
            sd[k] = sd[k] + agg[k]
        eval_model.load_state_dict(sd)
        acc, loss = torch_evaluate(eval_model, s["images"], s["labels"])
        utilities[frozenset(S)] = [acc - prev[0], loss - prev[1]]
    return exact_sv(utilities, 3), prev


def test_shapley_values_match_torch_reference_within_1e4(setup):
    s = setup
    spec = s["spec"]
    ref_sv, prev = torch_reference_sv(s)

    # ---- our side: ingest the same files, batched evaluation, exact SV ----
    base_tree = convert.hf_vit_to_base_tree(s["init_model"].state_dict(), spec)
    init_lora = convert.peft_lora_to_tree(s["init_model"].state_dict(), spec)
    deltas, selection, sizes = ingestion.ingest_clients(s["ckpts"], init_lora, spec)
    assert all(selection)
    assert sizes == [100, 250, 650]  # recovered from checkpoint metadata
    stacked = tm.tree_stack(deltas)

    data = [(s["images"], s["labels"])]
    single = lambda p, x: jvit.vit_forward(p[0], p[1], x, spec)
    prev_ours = ev.evaluate_model(single, (base_tree, init_lora), data)
    np.testing.assert_allclose(prev_ours, prev, atol=2e-5)

    evaluator = ev.make_coalition_evaluator(
        lambda b, l, x: jvit.vit_forward(b, l, x, spec)
    )

    def eval_fn(W):
        return evaluator(
            base_tree, tm.materialize_coalitions(init_lora, stacked, W), data
        )

    game = Game(
        eval_coalitions_fn=eval_fn,
        num_local_data=[float(x) for x in sizes],
        client_selection_vector=[True] * 3,
        previous_utility=list(prev_ours),
    )
    sv = shapley_exact(game)
    ours = np.array([[sv[d][j] for j in range(3)] for d in range(2)])

    # the north-star bar: within 1e-4 of the torch-CPU reference
    np.testing.assert_allclose(ours, ref_sv, atol=1e-4)
