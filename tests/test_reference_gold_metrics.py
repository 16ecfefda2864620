"""Gold parity oracles for the evaluation extras and representation metrics:
execute the REFERENCE'S OWN code (`/root/reference`) against ours.

Covers `federated_learning/utils.py`'s analysis surface on shared inputs:

  * `evaluation_statistical_parity` (utils.py:928-950) — raw-tensor nets,
    tuple loaders; ours consumes the same logits via `statistical_parity_gap`;
  * `evaluation_group_fairness` (utils.py:953-966) — routes through
    `evaluation` (dict batches, `.logits` HF-style outputs, CE-sum loss);
  * `get_metrics` (utils.py:969-994) — including the reference's
    double-log-softmax loss quirk (CrossEntropyLoss applied to
    log-probabilities), acc/AUC(ovr)/balanced-acc;
  * `compute_accuracy` (+ confusion matrix, utils.py:997-1043);
  * `CKA_Torch` linear/RBF-kernel (utils.py:1140-1180) — including
    auto-sigma, whose median is torch's LOWER-middle element semantics
    (ours reproduces it exactly; numpy's averaged midpoint differs at 1e-4);
  * `sliced_wasserstein_distance` (utils.py:1182-1242) — the reference draws
    projections from GLOBAL numpy state; the oracle re-seeds and replays the
    identical directions through our `projections=` injection point (p=2,
    where the reference's signed `pow` equals our `|Δ|^p`);
  * `get_irm_loss` (utils.py:1134-1138) — the reference's exact argument
    wiring (its second KL term is 0 by construction);
  * the Dirichlet partitioners (utils.py:512-593) — `RandomState` injected
    as our ``rng`` consumes the reference's global-MT19937 stream
    identically, so the client splits match INDEX-FOR-INDEX (a reference
    user's exact partition reproduces here); `record_net_data_stats`
    (utils.py:646-663) both branches;
  * `match_loss` / `distance_wb` (utils.py:1407-1460) — all three
    dis_metric modes on a mixed conv/layernorm/linear/bias gradient list
    across the torch↔flax layout transposes.

Both torch nets and our jax forward share ONE weight matrix, so any metric
disagreement is a semantics bug, not model noise. torchvision is stubbed as
in the other gold modules.
"""

import math
import os
import sys
import types

import numpy as np
import pytest

from shapley_vit_tpu.data.arrays import ArrayDataset
from shapley_vit_tpu.utils import eval_metrics as our_em
from shapley_vit_tpu.utils import representation as our_rep

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow

REFERENCE_ROOT = "/root/reference"

_D = 10  # feature dim
_C = 4   # classes


@pytest.fixture(scope="module")
def ref():
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
    from shapleyserver.federated_learning import utils as ref_utils

    return ref_utils


# ---------------------------------------------------------------------------
# shared model: one weight matrix drives torch nets AND our jax forward
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def model():
    rng = np.random.default_rng(17)
    W = rng.normal(0, 0.4, size=(_C, _D)).astype(np.float32)
    b = rng.normal(0, 0.1, size=(_C,)).astype(np.float32)

    class _RawLinear(torch.nn.Module):
        """net(x) -> logits tensor (the schema evaluation_statistical_parity
        / get_metrics / compute_accuracy consume)."""

        def __init__(self):
            super().__init__()
            self.fc = torch.nn.Linear(_D, _C)
            with torch.no_grad():
                self.fc.weight.copy_(torch.from_numpy(W))
                self.fc.bias.copy_(torch.from_numpy(b))

        def forward(self, x):
            return self.fc(x.flatten(1))

    class _HFStyle(_RawLinear):
        """net(x).logits (the schema `evaluation` consumes, utils.py:887)."""

        def forward(self, x):
            return types.SimpleNamespace(logits=super().forward(x))

    import jax.numpy as jnp

    params = (jnp.asarray(W), jnp.asarray(b))

    def fwd(p, x):
        return x.reshape(x.shape[0], -1) @ p[0].T + p[1]

    return dict(raw=_RawLinear().eval(), hf=_HFStyle().eval(), params=params,
                fwd=fwd)


def _group_data(sizes=(16, 24, 8), seed=5):
    rng = np.random.default_rng(seed)
    groups = []
    for n in sizes:
        x = rng.normal(size=(n, _D)).astype(np.float32)
        y = rng.integers(0, _C, size=n).astype(np.int64)
        y[: _C] = np.arange(_C)  # every class present per group
        groups.append((x, y))
    return groups


class _TupleDS(torch.utils.data.Dataset):
    def __init__(self, x, y):
        self.x = torch.from_numpy(x)
        self.y = torch.from_numpy(y)

    def __len__(self):
        return len(self.y)

    def __getitem__(self, i):
        return self.x[i], self.y[i]


class _DictDS(torch.utils.data.Dataset):
    """The reference's dict sample schema (start.py:295-301)."""

    def __init__(self, x, y):
        self.x = torch.from_numpy(x)
        self.y = torch.from_numpy(y)

    def __len__(self):
        return len(self.y)

    def __getitem__(self, i):
        return {"image": self.x[i], "label": self.y[i],
                "image_name": f"f_{i}.png"}


def _loader(ds, bs=7):
    return torch.utils.data.DataLoader(ds, batch_size=bs, shuffle=False,
                                       num_workers=0)


def test_statistical_parity_matches_reference_own_code(ref, model):
    groups = _group_data()
    loaders = [_loader(_TupleDS(x, y)) for x, y in groups]
    args = types.SimpleNamespace(device="cpu")
    ref_gap = ref.evaluation_statistical_parity(args, model["raw"], loaders)

    ds_list = [ArrayDataset(images=x, labels=y) for x, y in groups]
    our_gap = our_em.statistical_parity_gap(model["fwd"], model["params"],
                                            ds_list)
    np.testing.assert_allclose(our_gap, ref_gap, atol=1e-9)


def test_group_fairness_matches_reference_own_code(ref, model):
    groups = _group_data(seed=6)
    loaders = [_loader(_DictDS(x, y)) for x, y in groups]
    ref_acc_gap, ref_loss_gap = ref.evaluation_group_fairness(
        {}, model["hf"], loaders
    )
    ds_list = [ArrayDataset(images=x, labels=y) for x, y in groups]
    our_acc_gap, our_loss_gap = our_em.group_fairness_gaps(
        model["fwd"], model["params"], ds_list
    )
    np.testing.assert_allclose(our_acc_gap, ref_acc_gap, atol=1e-9)
    np.testing.assert_allclose(our_loss_gap, ref_loss_gap, atol=2e-5)


def test_get_metrics_matches_reference_own_code(ref, model):
    (x, y), = _group_data(sizes=(48,), seed=8)
    args = types.SimpleNamespace(device="cpu")
    ref_loss, ref_acc, ref_auc, ref_bal = ref.get_metrics(
        args, model["raw"], _loader(_TupleDS(x, y))
    )
    logits = x @ np.asarray(model["params"][0]).T + np.asarray(
        model["params"][1]
    )
    our_loss, our_acc, our_auc, our_bal = our_em.get_metrics(logits, y)
    np.testing.assert_allclose(our_loss, float(ref_loss), atol=2e-5)
    assert our_acc == pytest.approx(ref_acc, abs=1e-12)
    assert our_bal == pytest.approx(ref_bal, abs=1e-12)
    np.testing.assert_allclose(our_auc, ref_auc, atol=1e-6)


def test_compute_accuracy_matches_reference_own_code(ref, model):
    (x, y), = _group_data(sizes=(40,), seed=9)
    ref_acc, ref_cm = ref.compute_accuracy(
        model["raw"], _loader(_TupleDS(x, y)), get_confusion_matrix=True,
        device="cpu",
    )
    ds = ArrayDataset(images=x, labels=y)
    our_acc, our_cm = our_em.compute_accuracy(
        model["fwd"], model["params"], ds, get_confusion_matrix=True
    )
    assert our_acc == pytest.approx(ref_acc, abs=1e-12)
    np.testing.assert_array_equal(our_cm, ref_cm)


# ---------------------------------------------------------------------------
# representation metrics
# ---------------------------------------------------------------------------

def test_cka_matches_reference_own_code(ref):
    rng = np.random.default_rng(3)
    X = rng.normal(size=(24, 12)).astype(np.float32)
    Y = rng.normal(size=(24, 12)).astype(np.float32)
    cka = ref.CKA_Torch(device="cpu")
    tx, ty = torch.from_numpy(X), torch.from_numpy(Y)

    np.testing.assert_allclose(
        float(our_rep.linear_cka(X, Y)), float(cka.linear_CKA(tx, ty)),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        float(our_rep.kernel_cka(X, Y, sigma=2.0)),
        float(cka.kernel_CKA(tx, ty, sigma=2.0)), atol=1e-5,
    )
    # auto-sigma: torch.median's lower-middle semantics, reproduced exactly
    np.testing.assert_allclose(
        float(our_rep.kernel_cka(X, Y)), float(cka.kernel_CKA(tx, ty)),
        atol=1e-5,
    )


def test_swd_matches_reference_own_code(ref):
    rng = np.random.default_rng(13)
    enc = rng.normal(size=(40, 8)).astype(np.float32)
    dist = rng.normal(0.3, 1.2, size=(40, 8)).astype(np.float32)

    np.random.seed(777)
    ref_swd = ref.sliced_wasserstein_distance(
        torch.from_numpy(enc), torch.from_numpy(dist),
        num_projections=50, p=2, device="cpu",
    )
    np.random.seed(777)  # replay the identical global-numpy directions
    proj = ref.rand_projections(8, 50).numpy()
    our_swd = our_rep.sliced_wasserstein_distance(
        enc, dist, projections=proj, p=2
    )
    np.testing.assert_allclose(float(our_swd), float(ref_swd), atol=1e-6)


def test_irm_loss_matches_reference_own_code(ref):
    rng = np.random.default_rng(21)
    t = rng.random((6, 5)) + 0.1
    s = rng.random((6, 5)) + 0.1
    t = (t / t.sum(axis=1, keepdims=True)).astype(np.float32)
    s = (s / s.sum(axis=1, keepdims=True)).astype(np.float32)
    ref_loss = ref.get_irm_loss(torch.from_numpy(t), torch.from_numpy(s))
    our_loss = our_rep.get_irm_loss(t, s)
    np.testing.assert_allclose(float(our_loss), float(ref_loss), atol=1e-6)


# ---------------------------------------------------------------------------
# Dirichlet partitioners — index-for-index split reproduction
# ---------------------------------------------------------------------------

def test_partition_labeldir_matches_reference_own_code(ref):
    """partition_labeldir (utils.py:512-557): the reference seeds the GLOBAL
    np.random inside; passing ``RandomState(seed)`` as our ``rng`` consumes
    the identical MT19937 stream (dirichlet + per-class and per-party
    shuffles have matching signatures), so the splits match
    index-for-index — a reference user's exact client partition reproduces."""
    from shapley_vit_tpu.data import partition as our_part

    rng = np.random.default_rng(2)
    y = rng.integers(0, 10, size=600).astype(np.int64)

    ref_dists, ref_map = ref.partition_labeldir(
        y, num_classes=10, n_parties=4, beta=0.5, seed=42
    )
    our_dists, our_map = our_part.partition_labeldir(
        y, num_classes=10, n_parties=4, beta=0.5,
        rng=np.random.RandomState(42),
    )
    np.testing.assert_allclose(our_dists, ref_dists, atol=0)
    assert set(our_map) == set(ref_map)
    for j in ref_map:
        assert list(our_map[j]) == list(ref_map[j])


def test_partition_labeldir2_matches_reference_own_code(ref):
    """partition_labeldir2 (utils.py:559-593) draws from AMBIENT global
    state (never seeds); pin it and hand ours the same-seeded RandomState."""
    from shapley_vit_tpu.data import partition as our_part

    rng = np.random.default_rng(4)
    y = rng.integers(0, 6, size=400).astype(np.int64)

    np.random.seed(7)
    ref_dists, ref_map = ref.partition_labeldir2(
        y, num_classes=6, n_parties=3, beta=0.8, min_class_size=5
    )
    our_dists, our_map = our_part.partition_labeldir2(
        y, num_classes=6, n_parties=3, beta=0.8, min_class_size=5,
        rng=np.random.RandomState(7),
    )
    np.testing.assert_allclose(our_dists, ref_dists, atol=0)
    for j in ref_map:
        assert list(our_map[j]) == list(ref_map[j])


def test_record_net_data_stats_matches_reference_own_code(ref):
    from shapley_vit_tpu.data import partition as our_part

    rng = np.random.default_rng(9)
    y = rng.integers(0, 5, size=120).astype(np.int64)
    idx_map = {0: list(range(0, 50)), 1: list(range(50, 120))}

    ref_counts = ref.record_net_data_stats(y, idx_map, logger=None)
    our_counts = our_part.record_net_data_stats(y, idx_map, logger=None)
    assert set(our_counts) == set(ref_counts)
    for cid in ref_counts:
        assert {int(k): int(v) for k, v in ref_counts[cid].items()} == \
            our_counts[cid]

    # map=None branch: global class histogram (utils.py:658-662)
    ref_g = ref.record_net_data_stats(y, None, logger=None)
    our_g = our_part.record_net_data_stats(y, None, logger=None)
    assert {int(k): int(v) for k, v in ref_g.items()} == our_g


# ---------------------------------------------------------------------------
# condensation gradient-matching distance
# ---------------------------------------------------------------------------

def test_match_loss_matches_reference_own_code(ref):
    """match_loss / distance_wb (utils.py:1407-1460) on a mixed gradient
    list: conv OIHW↔flax HWIO (row permutation is cosine-invariant),
    3-D layernorm (reshaped (C, h*w) — the branch the reference hits at
    utils.py:1412-1414), linear out×in↔in×out, and a 1-D bias (contributes
    0 under 'ours'). All three dis_metric modes."""
    from shapley_vit_tpu.data import condensation as our_cond

    rng = np.random.default_rng(33)

    def pair(shape):
        return (rng.normal(size=shape).astype(np.float32),
                rng.normal(size=shape).astype(np.float32))

    conv_r, conv_s = pair((6, 3, 3, 3))     # torch OIHW
    ln_r, ln_s = pair((5, 4, 4))            # 3-D layernorm
    lin_r, lin_s = pair((7, 12))            # torch out×in
    b_r, b_s = pair((7,))

    t = lambda a: torch.from_numpy(a)
    gw_real_t = [t(conv_r), t(ln_r), t(lin_r), t(b_r)]
    gw_syn_t = [t(conv_s), t(ln_s), t(lin_s), t(b_s)]

    # flax layouts: conv HWIO, linear in×out, same flat concat order
    gw_real_j = [conv_r.transpose(2, 3, 1, 0), ln_r, lin_r.T, b_r]
    gw_syn_j = [conv_s.transpose(2, 3, 1, 0), ln_s, lin_s.T, b_s]

    args = types.SimpleNamespace(device="cpu", dis_metric="ours")
    ref_ours = float(ref.match_loss(gw_syn_t, gw_real_t, args))
    our_ours = float(our_cond.match_loss(gw_syn_j, gw_real_j, "ours"))
    np.testing.assert_allclose(our_ours, ref_ours, atol=1e-5)

    # mse/cos flatten-concat: leaf order matches but the within-leaf layout
    # permutation must not matter for mse (elementwise) — it does change the
    # per-element pairing, so feed the SAME layouts to both sides here
    gw_real_same = [conv_r, ln_r, lin_r, b_r]
    gw_syn_same = [conv_s, ln_s, lin_s, b_s]
    for metric in ("mse", "cos"):
        args.dis_metric = metric
        ref_v = float(ref.match_loss(gw_syn_t, gw_real_t, args))
        our_v = float(our_cond.match_loss(gw_syn_same, gw_real_same, metric))
        np.testing.assert_allclose(our_v, ref_v, atol=1e-5)
