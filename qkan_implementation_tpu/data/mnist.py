"""MNIST / digits loading for the classification pipeline.

The reference uses torchvision's MNIST download (fixed_kan_tests.py:316-321,
mnist_sampling_diagnostics.py).  This environment has no torchvision and no
network egress, so the loader resolves, in order:

1. raw MNIST idx files (train-images-idx3-ubyte etc.) under ``root``;
2. an ``mnist.npz`` (Keras-style: x_train/y_train/x_test/y_test) under
   ``root``;
3. the sklearn ``digits`` dataset (1797 8x8 images, 10 classes) as a
   compatible stand-in, flagged in the returned metadata.

Images are flattened and scaled to [0, 1] like the reference's
``.reshape(-1, 784).float() / 255`` (fixed_kan_tests.py:325).
"""

from __future__ import annotations

import gzip
import os
import struct
from pathlib import Path

import numpy as np


def _read_idx(path: Path) -> np.ndarray:
    opener = gzip.open if str(path).endswith(".gz") else open
    with opener(path, "rb") as f:
        zero, dtype_code, ndim = struct.unpack(">HBB", f.read(4))
        shape = struct.unpack(">" + "I" * ndim, f.read(4 * ndim))
        return np.frombuffer(f.read(), dtype=np.uint8).reshape(shape)


def _find(root: Path, names: list[str]) -> Path | None:
    for name in names:
        for cand in (root / name, root / (name + ".gz")):
            if cand.exists():
                return cand
    return None


def load_mnist(root: str | None = None, train: bool = True):
    """Load (x [N, D] in [0,1], y [N] int labels, meta dict).

    ``meta['source']`` is 'mnist-idx', 'mnist-npz', or 'digits'.
    """
    roots = [Path(root)] if root else [Path("./data"), Path("./data/MNIST/raw")]
    for r in roots:
        if not r.exists():
            continue
        img_name = (
            ["train-images-idx3-ubyte", "train-images.idx3-ubyte"]
            if train
            else ["t10k-images-idx3-ubyte", "t10k-images.idx3-ubyte"]
        )
        lbl_name = (
            ["train-labels-idx1-ubyte", "train-labels.idx1-ubyte"]
            if train
            else ["t10k-labels-idx1-ubyte", "t10k-labels.idx1-ubyte"]
        )
        img_path = _find(r, img_name)
        lbl_path = _find(r, lbl_name)
        if img_path and lbl_path:
            x = _read_idx(img_path).reshape(-1, 784).astype(np.float64) / 255.0
            y = _read_idx(lbl_path).astype(np.int64)
            return x, y, {"source": "mnist-idx", "image_dim": 784}
        npz = r / "mnist.npz"
        if npz.exists():
            data = np.load(npz)
            split = "train" if train else "test"
            x = data[f"x_{split}"].reshape(-1, 784).astype(np.float64) / 255.0
            y = data[f"y_{split}"].astype(np.int64)
            return x, y, {"source": "mnist-npz", "image_dim": 784}

    # stand-in: sklearn digits (8x8), deterministic split
    from sklearn.datasets import load_digits

    digits = load_digits()
    x = digits.data.astype(np.float64) / 16.0
    y = digits.target.astype(np.int64)
    n_train = int(0.8 * len(x))
    if train:
        x, y = x[:n_train], y[:n_train]
    else:
        x, y = x[n_train:], y[n_train:]
    return x, y, {"source": "digits", "image_dim": 64}


def to_one_hot(labels: np.ndarray, num_classes: int = 10) -> np.ndarray:
    """One-hot targets, like the reference's scatter_ (fixed_kan_tests.py:330)."""
    out = np.zeros((len(labels), num_classes), dtype=np.float64)
    out[np.arange(len(labels)), labels] = 1.0
    return out


def sample_train_subset(x, y, train_size: int, seed: int = 0):
    """Random permutation subset (fixed_kan_tests.py:323-325)."""
    rng = np.random.default_rng(seed)
    idx = rng.permutation(len(x))[:train_size]
    return x[idx], y[idx]
