"""Native dataset-format readers (data/formats.py): fabricate the STANDARD
on-disk layouts (CIFAR python pickles, MNIST/EMNIST idx ±gzip, SVHN .mat) in
temp dirs — the same approach as tests/test_medical.py — and assert the
registry returns the real arrays instead of synthetics. Reference loaders:
federated_learning/utils.py:250-348 (torchvision caches)."""

import gzip
import os
import pickle
import struct

import numpy as np
import pytest

from shapley_vit_tpu.data import formats
from shapley_vit_tpu.data.registry import get_dataset


# ---------------------------------------------------------------------------
# layout fabricators
# ---------------------------------------------------------------------------

def _write_idx(path: str, arr: np.ndarray, gz: bool = False) -> None:
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    payload = bytes([0, 0, 0x08, arr.ndim]) + struct.pack(
        f">{arr.ndim}i", *arr.shape
    ) + arr.tobytes()
    if gz:
        with gzip.open(path + ".gz", "wb") as f:
            f.write(payload)
    else:
        with open(path, "wb") as f:
            f.write(payload)


def _fabricate_mnist(root: str, n_train=20, n_test=8, gz=False) -> tuple:
    raw = os.path.join(root, "MNIST", "raw")
    os.makedirs(raw)
    rng = np.random.default_rng(0)
    tr_x = rng.integers(0, 256, size=(n_train, 28, 28), dtype=np.uint8)
    tr_y = rng.integers(0, 10, size=n_train, dtype=np.uint8)
    te_x = rng.integers(0, 256, size=(n_test, 28, 28), dtype=np.uint8)
    te_y = rng.integers(0, 10, size=n_test, dtype=np.uint8)
    _write_idx(os.path.join(raw, "train-images-idx3-ubyte"), tr_x, gz)
    _write_idx(os.path.join(raw, "train-labels-idx1-ubyte"), tr_y, gz)
    _write_idx(os.path.join(raw, "t10k-images-idx3-ubyte"), te_x, gz)
    _write_idx(os.path.join(raw, "t10k-labels-idx1-ubyte"), te_y, gz)
    return tr_x, tr_y, te_x, te_y


def _fabricate_cifar10(root: str, per_batch=4) -> tuple:
    d = os.path.join(root, "cifar-10-batches-py")
    os.makedirs(d)
    rng = np.random.default_rng(1)
    all_rows, all_labels = [], []
    for i in range(1, 6):
        rows = rng.integers(0, 256, size=(per_batch, 3072), dtype=np.uint8)
        labels = rng.integers(0, 10, size=per_batch).tolist()
        with open(os.path.join(d, f"data_batch_{i}"), "wb") as f:
            pickle.dump({b"data": rows, b"labels": labels}, f)
        all_rows.append(rows)
        all_labels += labels
    te_rows = rng.integers(0, 256, size=(6, 3072), dtype=np.uint8)
    te_labels = rng.integers(0, 10, size=6).tolist()
    with open(os.path.join(d, "test_batch"), "wb") as f:
        pickle.dump({b"data": te_rows, b"labels": te_labels}, f)
    return np.concatenate(all_rows), all_labels, te_rows, te_labels


# ---------------------------------------------------------------------------
# reader unit tests
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("gz", [False, True])
def test_mnist_idx_roundtrip(tmp_path, gz):
    tr_x, tr_y, te_x, te_y = _fabricate_mnist(str(tmp_path), gz=gz)
    train, test = formats.load_mnist_idx(str(tmp_path))
    assert train.images.shape == (20, 28, 28, 1)
    assert train.images.dtype == np.float32
    np.testing.assert_allclose(
        train.images[..., 0], tr_x.astype(np.float32) / 255.0
    )
    np.testing.assert_array_equal(train.labels, tr_y.astype(np.int32))
    np.testing.assert_array_equal(test.labels, te_y.astype(np.int32))
    assert test.images.shape == (8, 28, 28, 1)


def test_emnist_idx_transposes(tmp_path):
    """EMNIST raw images are stored transposed; the reader un-transposes
    (matching torchvision's load)."""
    raw = tmp_path / "EMNIST" / "raw"
    raw.mkdir(parents=True)
    rng = np.random.default_rng(2)
    x = rng.integers(0, 256, size=(5, 28, 28), dtype=np.uint8)
    y = rng.integers(0, 47, size=5, dtype=np.uint8)
    for part, xs, ys in (("train", x, y), ("test", x[:2], y[:2])):
        _write_idx(str(raw / f"emnist-balanced-{part}-images-idx3-ubyte"), xs)
        _write_idx(str(raw / f"emnist-balanced-{part}-labels-idx1-ubyte"), ys)
    train, test = formats.load_emnist_idx(str(tmp_path))
    np.testing.assert_allclose(
        train.images[..., 0],
        x.transpose(0, 2, 1).astype(np.float32) / 255.0,
    )
    assert len(test) == 2


def test_cifar10_pickles_roundtrip(tmp_path):
    tr_rows, tr_labels, te_rows, te_labels = _fabricate_cifar10(str(tmp_path))
    train, test = formats.load_cifar10_pickles(str(tmp_path))
    assert train.images.shape == (20, 32, 32, 3)
    want = tr_rows.reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1) / 255.0
    np.testing.assert_allclose(train.images, want.astype(np.float32))
    np.testing.assert_array_equal(train.labels, np.asarray(tr_labels, np.int32))
    np.testing.assert_array_equal(test.labels, np.asarray(te_labels, np.int32))


def test_cifar100_pickles_fine_labels(tmp_path):
    d = tmp_path / "cifar-100-python"
    d.mkdir()
    rng = np.random.default_rng(3)
    for split, n in (("train", 10), ("test", 4)):
        rows = rng.integers(0, 256, size=(n, 3072), dtype=np.uint8)
        fine = rng.integers(0, 100, size=n).tolist()
        coarse = rng.integers(0, 20, size=n).tolist()
        with open(d / split, "wb") as f:
            pickle.dump(
                {b"data": rows, b"fine_labels": fine, b"coarse_labels": coarse}, f
            )
        if split == "train":
            want_fine = fine
    train, test = formats.load_cifar100_pickles(str(tmp_path))
    np.testing.assert_array_equal(train.labels, np.asarray(want_fine, np.int32))
    assert train.images.shape == (10, 32, 32, 3)
    assert len(test) == 4


def test_svhn_mat_layout_and_label_remap(tmp_path):
    from scipy.io import savemat

    rng = np.random.default_rng(4)
    for split, n in (("train", 12), ("test", 5)):
        X = rng.integers(0, 256, size=(32, 32, 3, n), dtype=np.uint8)
        # published labels are 1..10 with 10 == digit 0
        y = rng.integers(1, 11, size=(n, 1)).astype(np.uint8)
        savemat(str(tmp_path / f"{split}_32x32.mat"), {"X": X, "y": y})
        if split == "train":
            want_x, want_y = X, y
    train, test = formats.load_svhn_mat(str(tmp_path))
    assert train.images.shape == (12, 32, 32, 3)
    np.testing.assert_allclose(
        train.images, want_x.transpose(3, 0, 1, 2).astype(np.float32) / 255.0
    )
    np.testing.assert_array_equal(
        train.labels, (want_y.reshape(-1) % 10).astype(np.int32)
    )
    assert len(test) == 5


# ---------------------------------------------------------------------------
# registry integration
# ---------------------------------------------------------------------------

def test_registry_uses_native_mnist(tmp_path):
    tr_x, tr_y, _, _ = _fabricate_mnist(str(tmp_path))
    splits, info = get_dataset("mnist", data_dir=str(tmp_path))
    assert len(splits["train"]) == 20  # real files, not the synthetic sizes
    np.testing.assert_array_equal(splits["train"].labels, tr_y.astype(np.int32))
    assert info["num_classes"] == 10


def test_registry_uses_native_cifar10_with_val_split(tmp_path):
    """CIFAR-10 through the registry keeps the reference's 50/50 val/test
    split of the test set (utils.py:300-348, seed 42)."""
    _fabricate_cifar10(str(tmp_path), per_batch=8)
    splits, info = get_dataset("cifar10", data_dir=str(tmp_path))
    assert len(splits["train"]) == 40
    # test batch had 6 rows -> split 3/3
    assert len(splits["val"]) + len(splits["test"]) == 6
    assert info["num_classes"] == 10


def test_registry_absent_layout_falls_back_to_synthetic(tmp_path):
    splits, _ = get_dataset("svhn", data_dir=str(tmp_path), synthetic_ok=True)
    assert splits["train"].names is not None  # synthetic sets carry names
    assert splits["train"].names[0].endswith(".synthetic")
