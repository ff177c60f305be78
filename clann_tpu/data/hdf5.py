"""ann-benchmarks HDF5 dataset loading.

TPU-native equivalent of the reference loader
(reference: src/utils/mod.rs:25-57 — reads datasets ``train``, ``test`` and
``distances`` from an ann-benchmarks layout file).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import numpy as np

from clann_tpu.errors import DataError


@dataclasses.dataclass
class AnnDataset:
    """An ann-benchmarks dataset triple (reference: src/utils/mod.rs:18-23)."""

    train: np.ndarray  # (n, d) float32
    test: np.ndarray  # (q, d) float32
    distances: Optional[np.ndarray]  # (q, k_gt) float32 ground-truth distances
    neighbors: Optional[np.ndarray]  # (q, k_gt) int32 ground-truth ids (extra)
    name: str = ""


def load_hdf5_dataset(path: str, name: str = "") -> AnnDataset:
    """Load an ann-benchmarks file (reference: src/utils/mod.rs:25-57).

    The reference requires train/test/distances; we additionally pick up the
    ``neighbors`` dataset when present (ann-benchmarks files always carry it)
    since id-level ground truth makes recall checks cheaper than the
    distance-threshold method.
    """
    import h5py

    if not os.path.exists(path):
        raise DataError(f"dataset file not found: {path}")
    with h5py.File(path, "r") as f:
        for key in ("train", "test"):
            if key not in f:
                raise DataError(f"dataset {path} missing required key {key!r}")
        train = np.asarray(f["train"], dtype=np.float32)
        test = np.asarray(f["test"], dtype=np.float32)
        distances = (
            np.asarray(f["distances"], dtype=np.float32) if "distances" in f else None
        )
        neighbors = (
            np.asarray(f["neighbors"], dtype=np.int32) if "neighbors" in f else None
        )
    if not name:
        name = os.path.splitext(os.path.basename(path))[0]
    return AnnDataset(train=train, test=test, distances=distances, neighbors=neighbors, name=name)


def save_hdf5_dataset(path: str, ds: AnnDataset) -> None:
    """Write an ann-benchmarks layout file (inverse of load_hdf5_dataset)."""
    import h5py

    with h5py.File(path, "w") as f:
        f.create_dataset("train", data=ds.train)
        f.create_dataset("test", data=ds.test)
        if ds.distances is not None:
            f.create_dataset("distances", data=ds.distances)
        if ds.neighbors is not None:
            f.create_dataset("neighbors", data=ds.neighbors)
