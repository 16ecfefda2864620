"""Evaluation extras: fairness metrics, richer classification metrics, and
confusion matrices.

Reference: ``federated_learning/utils.py:928-1043``
(``evaluation_statistical_parity``, ``evaluation_group_fairness``,
``get_metrics`` acc/AUC/balanced-acc, ``compute_accuracy`` + confusion
matrix). Pure functions over logits/labels wherever possible so the model
forward runs once on device and the metrics run on host numpy.
"""

from __future__ import annotations

from typing import Callable, List, Sequence, Tuple

import numpy as np

from shapley_vit_tpu.data.arrays import ArrayDataset, batches as make_batches
from shapley_vit_tpu.fl.evaluation import evaluate_model


def collect_logits(
    forward_fn: Callable, params, ds: ArrayDataset, batch_size: int = 128
) -> Tuple[np.ndarray, np.ndarray]:
    """Run the forward over a dataset, gather logits+labels on host."""
    import jax

    step = jax.jit(forward_fn)
    logits_all = []
    for images, labels in make_batches(ds, batch_size):
        logits_all.append(np.asarray(step(params, images)))
    return np.concatenate(logits_all, axis=0), np.asarray(ds.labels)


def statistical_parity_gap(
    forward_fn: Callable, params, group_datasets: Sequence[ArrayDataset],
    positive_class: int = 1, batch_size: int = 128,
) -> float:
    """Max-min positive-prediction rate across sensitive groups
    (utils.py:928-950: only class==1 counts as a positive prediction)."""
    rates = []
    for ds in group_datasets:
        logits, _ = collect_logits(forward_fn, params, ds, batch_size)
        rates.append(float((logits.argmax(axis=1) == positive_class).mean()))
    rates = np.asarray(rates)
    return float(rates.max() - rates.min())


def group_fairness_gaps(
    forward_fn: Callable, params, group_datasets: Sequence[ArrayDataset],
    batch_size: int = 128,
) -> Tuple[float, float]:
    """(max-min accuracy, max-min loss) across groups (utils.py:953-966)."""
    accs, losses = [], []
    for ds in group_datasets:
        acc, loss = evaluate_model(
            forward_fn, params, make_batches(ds, batch_size), dataset_size=len(ds)
        )
        accs.append(acc)
        losses.append(loss)
    accs, losses = np.asarray(accs), np.asarray(losses)
    return float(accs.max() - accs.min()), float(losses.max() - losses.min())


def get_metrics(logits: np.ndarray, labels: np.ndarray):
    """(loss, acc, auc, balanced_acc) from gathered logits
    (utils.py:969-994 — including its quirk of feeding log-probabilities back
    through CrossEntropyLoss, i.e. a double log-softmax on the loss)."""
    from sklearn.metrics import (
        accuracy_score,
        balanced_accuracy_score,
        roc_auc_score,
    )

    logits = np.asarray(logits, dtype=np.float64)
    logp = logits - _logsumexp(logits)
    # reference: criterion(log_softmax(logits), y) -> CE over log-probs
    logp2 = logp - _logsumexp(logp)
    loss = float(-logp2[np.arange(len(labels)), labels].sum() / len(labels))

    pred = logp.argmax(axis=1)
    prob = np.exp(logp)
    acc = accuracy_score(y_pred=pred, y_true=labels)
    bal_acc = balanced_accuracy_score(y_pred=pred, y_true=labels)
    if prob.shape[1] == 2:
        auc = roc_auc_score(labels, prob[:, 1])
    else:
        auc = roc_auc_score(labels, prob, multi_class="ovr")
    return loss, float(acc), float(auc), float(bal_acc)


def _logsumexp(x: np.ndarray) -> np.ndarray:
    m = x.max(axis=1, keepdims=True)
    return m + np.log(np.exp(x - m).sum(axis=1, keepdims=True))


def compute_accuracy(
    forward_fn: Callable, params, datasets, get_confusion_matrix: bool = False,
    batch_size: int = 128,
):
    """Accuracy (+ optional confusion matrix) over one or several datasets
    (utils.py:997-1043)."""
    from sklearn.metrics import confusion_matrix

    if isinstance(datasets, ArrayDataset):
        datasets = [datasets]
    preds: List[np.ndarray] = []
    trues: List[np.ndarray] = []
    for ds in datasets:
        logits, labels = collect_logits(forward_fn, params, ds, batch_size)
        preds.append(logits.argmax(axis=1))
        trues.append(labels)
    preds_all = np.concatenate(preds)
    trues_all = np.concatenate(trues)
    acc = float((preds_all == trues_all).mean())
    if get_confusion_matrix:
        return acc, confusion_matrix(trues_all, preds_all)
    return acc
