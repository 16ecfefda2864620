"""Tests for fairness/eval metrics, representation similarity, and meters."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shapley_vit_tpu.data.arrays import ArrayDataset
from shapley_vit_tpu.utils import eval_metrics as em
from shapley_vit_tpu.utils import representation as rep
from shapley_vit_tpu.utils.metrics import AverageMeter, AverageMeterList


def linear_forward(params, x):
    return x.reshape(x.shape[0], -1) @ params["w"] + params["b"]


@pytest.fixture
def toy_model(rng):
    w = rng.normal(size=(8, 3)).astype(np.float32)
    return {"w": jnp.asarray(w), "b": jnp.zeros(3)}


def make_ds(rng, n, bias=0.0):
    X = rng.normal(size=(n, 8)).astype(np.float32) + bias
    y = rng.integers(0, 3, size=n).astype(np.int32)
    return ArrayDataset(images=X, labels=y)


def test_statistical_parity_gap(toy_model, rng):
    g0 = make_ds(rng, 50)
    g1 = make_ds(rng, 50, bias=2.0)
    gap = em.statistical_parity_gap(linear_forward, toy_model, [g0, g1])
    assert 0.0 <= gap <= 1.0
    # identical groups -> zero gap
    assert em.statistical_parity_gap(linear_forward, toy_model, [g0, g0]) == 0.0


def test_group_fairness_gaps(toy_model, rng):
    g0, g1 = make_ds(rng, 40), make_ds(rng, 40, bias=1.0)
    acc_gap, loss_gap = em.group_fairness_gaps(linear_forward, toy_model, [g0, g1])
    assert acc_gap >= 0 and loss_gap >= 0
    acc_gap0, loss_gap0 = em.group_fairness_gaps(linear_forward, toy_model, [g0, g0])
    assert acc_gap0 == 0.0 and loss_gap0 < 1e-9


def test_get_metrics_against_sklearn(rng):
    pytest.importorskip("sklearn")
    logits = rng.normal(size=(100, 3))
    labels = rng.integers(0, 3, size=100)
    loss, acc, auc, bal = em.get_metrics(logits, labels)
    assert 0 <= acc <= 1 and 0 <= bal <= 1 and 0 <= auc <= 1
    np.testing.assert_allclose(acc, (logits.argmax(1) == labels).mean(), atol=1e-9)
    assert loss > 0


def test_compute_accuracy_and_confusion(toy_model, rng):
    ds = make_ds(rng, 60)
    acc, cm = em.compute_accuracy(linear_forward, toy_model, ds, get_confusion_matrix=True)
    assert cm.sum() == 60
    np.testing.assert_allclose(np.trace(cm) / 60, acc, atol=1e-9)
    # list-of-datasets path (utils.py:1014-1017)
    acc2 = em.compute_accuracy(linear_forward, toy_model, [ds, ds])
    np.testing.assert_allclose(acc2, acc, atol=1e-9)


def test_linear_cka_properties(rng):
    X = jnp.asarray(rng.normal(size=(20, 6)), jnp.float32)
    # CKA(X, X) == 1; invariant to orthogonal transform + scale
    np.testing.assert_allclose(float(rep.linear_cka(X, X)), 1.0, atol=1e-5)
    Q, _ = np.linalg.qr(rng.normal(size=(6, 6)))
    Y = X @ jnp.asarray(Q, jnp.float32) * 3.0
    np.testing.assert_allclose(float(rep.linear_cka(X, Y)), 1.0, atol=1e-4)
    Z = jnp.asarray(rng.normal(size=(20, 6)), jnp.float32)
    assert float(rep.linear_cka(X, Z)) < 0.9


def test_kernel_cka_self_is_one(rng):
    X = jnp.asarray(rng.normal(size=(15, 4)), jnp.float32)
    np.testing.assert_allclose(float(rep.kernel_cka(X, X)), 1.0, atol=1e-4)


def test_swd_zero_for_identical_and_positive_for_shifted(rng):
    X = jnp.asarray(rng.normal(size=(64, 8)), jnp.float32)
    key = jax.random.key(0)
    d0 = float(rep.sliced_wasserstein_distance(X, X, key))
    np.testing.assert_allclose(d0, 0.0, atol=1e-10)
    d1 = float(rep.sliced_wasserstein_distance(X, X + 5.0, key))
    assert d1 > 1.0


def test_irm_loss_zero_when_equal(rng):
    p = jax.nn.softmax(jnp.asarray(rng.normal(size=(4, 4)), jnp.float32), axis=-1)
    val = float(rep.get_irm_loss(p, p))
    np.testing.assert_allclose(val, 0.0, atol=1e-6)
    q = jax.nn.softmax(jnp.asarray(rng.normal(size=(4, 4)), jnp.float32), axis=-1)
    assert float(rep.get_irm_loss(p, q)) > 0


def test_average_meters():
    m = AverageMeter()
    m.update(1.0)
    m.update(3.0)
    assert m.avg == 2.0 and m.count == 2 and m.sum == 4.0
    m.update(5.0, n=2)
    assert m.count == 4 and m.avg == pytest.approx(3.5)
    ml = AverageMeterList(2)
    ml.update([1.0, 2.0])
    ml.update([3.0, 4.0])
    assert ml.avg == [2.0, 3.0]
    ml.reset()
    assert ml.avg == [0.0, 0.0]
