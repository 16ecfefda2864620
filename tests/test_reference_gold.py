"""Gold parity oracle: execute the REFERENCE'S OWN code as the SV oracle.

Unlike test_reference_parity.py (which re-implements the reference's
semantics in torch inside the test), this test imports ``/root/reference``
itself — ``game2.Game`` (game2.py:74-122), ``server2.ServerBase``
(server2.py:121-127 ``model_agg_lazy``), ``client2.ClientBase``,
``federated_learning.utils.evaluation`` (utils.py:864-926) /
``get_difference_between_network_weights`` (utils.py:735-749), and
``utils_shapley.shapley_exact`` (utils_shapley.py:185-203) +
``shapley_comp_contrib`` (utils_shapley.py:273-362) — and runs them on the
SAME ``.pth.tar`` checkpoint files our pipeline ingests. A re-implementation
can share a misreading with the code under test; the reference's own code
cannot.

Two assertions:

1. our ``shapley_exact`` on our ingested game == the reference's
   ``shapley_exact`` on the reference's game, within 1e-4 (deterministic —
   no RNG involved);
2. our FULL ``driver.start.start()`` pipeline (ingestion → batched coalition
   eval → comp-contrib estimator) == the reference's own
   ``shapley_comp_contrib``, within 1e-4, with the reference's sampled
   (permutation, split) draws mirrored into our estimator: the reference
   draws via ``np.random.RandomState(None)`` + ``random.randint``
   (utils_shapley.py:277-287), which we pin by monkeypatching
   ``RandomState`` to a fixed seed and seeding ``random``, then replay the
   identical stream into ``estimators._cc_samples``;
3. our multi-round lazy reconstruction (``fed_shapley.compute_utilities_lazy``
   — one [subsets × rounds·clients] weight matrix + ONE batched eval) == the
   reference's own ``utils_fed_shapley.compute_utilities_lazy``
   (utils_fed_shapley.py:146-196 — per-subset, per-round
   ``get_aggregated_model`` + ``model_agg_lazy`` + ``evaluation``) on two
   rounds of drops with a sit-out client, at both ``include_from_round``
   settings, within 1e-4.

Environment shims (the reference code is executed UNMODIFIED):
  * ``torchvision`` is stubbed (not in this image; only imported, never
    called on this path — utils.py:14);
  * ``np.math`` is restored (numpy 2.x removed it; shapley_exact uses
    ``np.math.factorial``, utils_shapley.py:191).
"""

import math
import os
import random
import sys
import types

import numpy as np
import pytest

import jax

from shapley_vit_tpu.config import Config
from shapley_vit_tpu.data.arrays import ArrayDataset
from shapley_vit_tpu.fl import evaluation as ev
from shapley_vit_tpu.fl import ingestion
from shapley_vit_tpu.models import convert
from shapley_vit_tpu.models import vit as jvit
from shapley_vit_tpu.ops import tree_math as tm
from shapley_vit_tpu.shapley import Game as OurGame
from shapley_vit_tpu.shapley import estimators as our_est
from shapley_vit_tpu.shapley import fed_shapley as our_fs
from shapley_vit_tpu.shapley import shapley_exact as our_shapley_exact

torch = pytest.importorskip("torch")
peft = pytest.importorskip("peft")

pytestmark = pytest.mark.slow

REFERENCE_ROOT = "/root/reference"

# pinned RNG for the reference's unseeded comp-contrib draw stream
_CC_NUMPY_SEED = 1234
_CC_RANDOM_SEED = 99


@pytest.fixture(scope="module")
def ref():
    """Import the reference's own modules (torchvision stubbed, np.math
    restored). Skips when the reference tree isn't present."""
    if not os.path.isdir(os.path.join(REFERENCE_ROOT, "shapleyserver")):
        pytest.skip("reference tree not available")
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.datasets = types.ModuleType("torchvision.datasets")
        tv.transforms = types.ModuleType("torchvision.transforms")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.datasets"] = tv.datasets
        sys.modules["torchvision.transforms"] = tv.transforms
    for p in (REFERENCE_ROOT, os.path.join(REFERENCE_ROOT, "shapleyserver")):
        if p not in sys.path:
            sys.path.insert(0, p)
    if not hasattr(np, "math"):
        np.math = math
    from shapleyserver.fed_client_contribution import game2, utils_shapley
    from shapleyserver.fed_client_contribution import utils_fed_shapley
    from shapleyserver.federated_learning import client2, server2
    from shapleyserver.federated_learning import utils as ref_utils

    return types.SimpleNamespace(
        game2=game2,
        utils_shapley=utils_shapley,
        utils_fed_shapley=utils_fed_shapley,
        client2=client2,
        server2=server2,
        utils=ref_utils,
    )


class _DictValidSet(torch.utils.data.Dataset):
    """The reference's validation sample schema: dicts with image (CHW
    float), label, image_name (start.py:295-301, utils.py:880)."""

    def __init__(self, images_nhwc: np.ndarray, labels: np.ndarray):
        self.images = torch.from_numpy(
            np.ascontiguousarray(images_nhwc.transpose(0, 3, 1, 2))
        )
        self.labels = torch.from_numpy(labels.astype(np.int64))

    def __len__(self):
        return len(self.labels)

    def __getitem__(self, i):
        return {
            "image": self.images[i],
            "label": self.labels[i],
            "image_name": f"img_{i}.png",
        }


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    """Micro HF ViT + 3 peft LoRA clients; reference-format .pth.tar drops
    with data-size metadata; a fixed 16-image validation set."""
    from transformers import ViTConfig, ViTForImageClassification

    tmp = tmp_path_factory.mktemp("gold")
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

    sizes = [100, 250, 650]
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
        os.makedirs(os.path.dirname(path), exist_ok=True)
        torch.save(
            {"state_dict": client.state_dict(),
             "num_local_data_train": sizes[cid]},
            path,
        )
        ckpts.append(path)

    rng = np.random.default_rng(7)
    images = rng.normal(size=(16, spec.image, spec.image, 3)).astype(np.float32)
    labels = rng.integers(0, 4, size=16)
    return dict(
        spec=spec, init_model=init_model, ckpts=ckpts,
        images=images, labels=labels, sizes=sizes, lcfg=lcfg,
        base_config=base_model.config, tmp=tmp,
    )


def _build_reference_game(ref, s):
    """Run the reference's own bootstrap (start.py:82-188): evaluate the
    init model, load each .pth.tar with torch, diff vs init, build
    ClientBase/ServerBase/Game. Returns (game, previous_utility)."""
    args = {}
    valid_loader = torch.utils.data.DataLoader(
        _DictValidSet(s["images"], s["labels"]),
        batch_size=128, shuffle=False, num_workers=0,
    )
    prev = list(ref.utils.evaluation(args, s["init_model"], valid_loader))

    deltas, selection = [], []
    for path in s["ckpts"]:
        client_model = peft.get_peft_model(
            __import__("transformers").ViTForImageClassification(
                s["base_config"]
            ),
            s["lcfg"],
        ).eval()
        ckpt = torch.load(path, weights_only=False)
        client_model.load_state_dict(ckpt["state_dict"])
        deltas.append(
            ref.utils.get_difference_between_network_weights(
                client_model, s["init_model"]
            )
        )
        selection.append(True)

    clients = [
        ref.client2.ClientBase(cid, args, s["init_model"], list(range(n)))
        for cid, n in enumerate(s["sizes"])
    ]
    server = ref.server2.ServerBase(
        args, s["init_model"], clients, None, valid_loader, None
    )
    game = ref.game2.Game(
        clients, server, s["init_model"], deltas, selection, prev, 2, args
    )
    return game, prev


def _replay_reference_cc_draws(n, m):
    """Replay the reference's _cc_shap_task draw stream
    (utils_shapley.py:277-287) under the pinned seeds: one persistent index
    array shuffled in place per draw + random.randint split point."""
    rs = np.random.RandomState(_CC_NUMPY_SEED)
    random.seed(_CC_RANDOM_SEED)
    idxs = np.arange(n)
    draws = []
    for _ in range(m):
        rs.shuffle(idxs)
        j = random.randint(1, n)
        draws.append((idxs.copy(), j))
    return draws


@pytest.fixture(scope="module")
def reference_results(ref, setup):
    """Execute the reference's own estimators once: exact SV and the
    comp-contrib estimate under the pinned draw stream."""
    game, prev = _build_reference_game(ref, setup)
    ref_exact = ref.utils_shapley.shapley_exact(game)

    # fresh game for comp-contrib: shapley_exact mutates
    # game.default_shapley_value in place (utils_shapley.py:188)
    game_cc, _ = _build_reference_game(ref, setup)
    m = 50 * game_cc.n
    real_RandomState = np.random.RandomState
    np.random.RandomState = lambda seed=None: real_RandomState(_CC_NUMPY_SEED)
    random.seed(_CC_RANDOM_SEED)
    try:
        ref_cc = ref.utils_shapley.shapley_comp_contrib(game_cc, m)
    finally:
        np.random.RandomState = real_RandomState
    return dict(exact=ref_exact, cc=ref_cc, prev=prev, m=m)


def _our_ingested_pieces(s):
    """Our pipeline's model/data inputs from the SAME torch init model and
    checkpoint files."""
    spec = s["spec"]
    base_tree = convert.hf_vit_to_base_tree(s["init_model"].state_dict(), spec)
    init_lora = convert.peft_lora_to_tree(s["init_model"].state_dict(), spec)
    valid = ArrayDataset(
        images=s["images"], labels=np.asarray(s["labels"]),
        names=[f"img_{i}.png" for i in range(len(s["labels"]))],
        classes=["a", "b", "c", "d"],
    )
    return spec, base_tree, init_lora, valid


def _as_matrix(sv_dicts, n=3, dim=2):
    return np.array([[sv_dicts[d][j] for j in range(n)] for d in range(dim)])


def test_exact_sv_matches_reference_own_code(ref, setup, reference_results):
    """Our ingested game + our shapley_exact == the reference's OWN
    shapley_exact executed on the reference's own Game/Server/evaluation."""
    s = setup
    spec, base_tree, init_lora, valid = _our_ingested_pieces(s)
    deltas, selection, sizes = ingestion.ingest_clients(
        s["ckpts"], init_lora, spec
    )
    assert all(selection) and sizes == s["sizes"]
    stacked = tm.tree_stack(deltas)
    data = [(s["images"], np.asarray(s["labels"]))]

    prev_ours = ev.evaluate_model(
        lambda p, x: jvit.vit_forward(p[0], p[1], x, spec),
        (base_tree, init_lora),
        data,
    )
    np.testing.assert_allclose(
        prev_ours, reference_results["prev"], atol=2e-5
    )

    evaluator = ev.make_coalition_evaluator(
        lambda b, l, x: jvit.vit_forward(b, l, x, spec)
    )

    def eval_fn(W):
        return evaluator(
            base_tree, tm.materialize_coalitions(init_lora, stacked, W), data
        )

    game = OurGame(
        eval_coalitions_fn=eval_fn,
        num_local_data=[float(x) for x in sizes],
        client_selection_vector=[True] * 3,
        previous_utility=list(prev_ours),
    )
    ours = _as_matrix(our_shapley_exact(game))
    want = _as_matrix(reference_results["exact"])
    np.testing.assert_allclose(ours, want, atol=1e-4)


def test_full_start_pipeline_matches_reference_comp_contrib(
    ref, setup, reference_results, tmp_path, monkeypatch
):
    """Our FULL driver.start.start() (ingestion → batched eval →
    comp-contrib) == the reference's own shapley_comp_contrib under the
    mirrored draw stream, within 1e-4."""
    import importlib

    s = setup
    start_mod = importlib.import_module("shapley_vit_tpu.driver.start")
    spec, base_tree, init_lora, valid = _our_ingested_pieces(s)

    cfg = Config()
    cfg.model.vit_variant = "micro"
    cfg.model.num_classes = 4
    cfg.data.eval_batch_size = 32
    cfg.obs.exp_dir = str(tmp_path / "exp")
    cfg.shapley.seed = 0

    monkeypatch.setattr(
        start_mod, "build_model", lambda c, key=None: (spec, base_tree, init_lora)
    )
    monkeypatch.setattr(
        start_mod, "load_validation_dataset", lambda c, target_size=None: valid
    )
    # mirror the reference's drawn (permutation, split) stream into our
    # estimator; everything else is the production path
    draws = _replay_reference_cc_draws(3, reference_results["m"])
    monkeypatch.setattr(
        our_est,
        "_cc_samples",
        lambda n, m, rng: [(i.copy(), j) for i, j in draws[:m]],
    )

    all_rounds, _sv_sum = start_mod.start(cfg, checkpoint_paths=s["ckpts"])
    ours = _as_matrix([all_rounds[d][1] for d in range(2)])
    want = _as_matrix(reference_results["cc"])
    np.testing.assert_allclose(ours, want, atol=1e-4)


def _write_round_ckpts(s, tmp, participating, seed_base, epoch):
    """A further round of .pth.tar drops: participating clients perturbed
    from init with fresh seeds (same file schema as `setup`)."""
    paths = []
    for cid in range(3):
        if cid not in participating:
            paths.append(None)
            continue
        torch.manual_seed(seed_base + cid)
        client = peft.get_peft_model(
            __import__("transformers").ViTForImageClassification(
                s["base_config"]
            ),
            s["lcfg"],
        )
        client.load_state_dict(s["init_model"].state_dict())
        with torch.no_grad():
            for name, p in client.named_parameters():
                if "lora_" in name or "modules_to_save" in name:
                    p.add_(torch.randn_like(p) * 0.05)
        client.eval()
        path = str(tmp / f"client_{cid + 1}_model" / f"ViT_epoch_{epoch}.pth.tar")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        torch.save(
            {"state_dict": client.state_dict(),
             "num_local_data_train": s["sizes"][cid]},
            path,
        )
        paths.append(path)
    return paths


def _ref_delta_from_ckpt(ref, s, path):
    """The reference's own load → diff-vs-init (start.py:144-164 semantics)."""
    client_model = peft.get_peft_model(
        __import__("transformers").ViTForImageClassification(s["base_config"]),
        s["lcfg"],
    ).eval()
    ckpt = torch.load(path, weights_only=False)
    client_model.load_state_dict(ckpt["state_dict"])
    return ref.utils.get_difference_between_network_weights(
        client_model, s["init_model"]
    )


def test_lazy_multi_round_utilities_match_reference_own_code(
    ref, setup, tmp_path
):
    """Multi-round lazy reconstruction: the reference's OWN
    ``utils_fed_shapley.compute_utilities_lazy`` (utils_fed_shapley.py:146-196
    — per-subset, per-round ``get_aggregated_model`` + ``model_agg_lazy`` +
    ``evaluation``) vs ours (one [subsets × rounds·clients] weight matrix +
    ONE batched eval), on the same two rounds of .pth.tar drops with a
    non-participating client in round 1. Also covers ``include_from_round``
    (utils_fed_shapley.py:170-171)."""
    s = setup
    ufs = ref.utils_fed_shapley

    # round 0 = the setup fixture's drops (all participate);
    # round 1 = fresh drops, client 1 sits out
    round1_paths = _write_round_ckpts(
        s, tmp_path, participating={0, 2}, seed_base=200, epoch=10
    )
    all_paths = [s["ckpts"], round1_paths]
    sel_matrix = [[True, True, True], [True, False, True]]

    # ---- reference side: its own code, unmodified -------------------------
    valid_loader = torch.utils.data.DataLoader(
        _DictValidSet(s["images"], s["labels"]),
        batch_size=128, shuffle=False, num_workers=0,
    )
    prev = list(ref.utils.evaluation({}, s["init_model"], valid_loader))
    clients = [
        ref.client2.ClientBase(cid, {}, s["init_model"], list(range(n)))
        for cid, n in enumerate(s["sizes"])
    ]
    server = ref.server2.ServerBase(
        {}, s["init_model"], clients, None, valid_loader, None
    )
    ref_deltas = [
        [_ref_delta_from_ckpt(ref, s, p) if p else None for p in paths]
        for paths in all_paths
    ]
    all_subsets = ref.utils_shapley.powerset(range(3))
    args_ns = types.SimpleNamespace(num_clients=3)

    ref_by_start = {}
    for include_from in (0, 1):
        ref_utils_arr, ref_dicts = ufs.compute_utilities_lazy(
            args_ns, prev, ref_deltas, sel_matrix, server, clients,
            s["init_model"], all_subsets, utility_dim=2, current_round=1,
            include_from_round=include_from,
        )
        ref_by_start[include_from] = (ref_utils_arr, ref_dicts)

    # ---- our side: ingested deltas, weight-matrix collapse ----------------
    spec, base_tree, init_lora, _valid = _our_ingested_pieces(s)
    data = [(s["images"], np.asarray(s["labels"]))]
    prev_ours = ev.evaluate_model(
        lambda p, x: jvit.vit_forward(p[0], p[1], x, spec),
        (base_tree, init_lora),
        data,
    )
    np.testing.assert_allclose(prev_ours, prev, atol=2e-5)

    our_deltas_all_rounds = []
    for paths in all_paths:
        deltas, selection, sizes = ingestion.ingest_clients(
            paths, init_lora, spec
        )
        our_deltas_all_rounds.append(deltas)
    zeros = tm.tree_zeros_like(init_lora)
    flat = [
        d if d is not None else zeros
        for round_deltas in our_deltas_all_rounds
        for d in round_deltas
    ]
    stacked = tm.tree_stack(flat)
    evaluator = ev.make_coalition_evaluator(
        lambda b, l, x: jvit.vit_forward(b, l, x, spec)
    )

    def eval_fn(W):
        return evaluator(
            base_tree, tm.materialize_coalitions(init_lora, stacked, W), data
        )

    for include_from in (0, 1):
        our_utils_arr, our_dicts = our_fs.compute_utilities_lazy(
            num_clients=3,
            previous_utility=list(prev_ours),
            client_deltas_all_rounds=our_deltas_all_rounds,
            client_selection_matrix=sel_matrix,
            num_local_data=[float(x) for x in s["sizes"]],
            eval_coalitions_fn=eval_fn,
            all_subsets=all_subsets,
            utility_dim=2,
            current_round=1,
            include_from_round=include_from,
        )
        ref_utils_arr, ref_dicts = ref_by_start[include_from]
        for d in range(2):
            assert set(our_dicts[d]) == set(ref_dicts[d])
            np.testing.assert_allclose(
                our_utils_arr[d], ref_utils_arr[d], atol=1e-4
            )
            for key in ref_dicts[d]:
                np.testing.assert_allclose(
                    our_dicts[d][key], ref_dicts[d][key], atol=1e-4
                )

    # the two include_from settings must genuinely differ (round 0 carries
    # signal) — guards against a vacuous pass
    assert not np.allclose(ref_by_start[0][0][0], ref_by_start[1][0][0], atol=1e-6)
