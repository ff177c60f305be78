"""ann-benchmarks HDF5 dataset path (reference: src/utils/mod.rs:25-57).

bench.py now consumes its dataset through this loader on every run
(VERDICT r4 #8 — prove the real-data path end-to-end without real data):
these tests pin that the save->load round trip is byte-exact, that search
results through the loaded file equal the in-memory path, and that the
loader enforces the reference's required keys.
"""

import numpy as np
import pytest

from clann_tpu.data.hdf5 import (
    AnnDataset,
    load_hdf5_dataset,
    save_hdf5_dataset,
)
from clann_tpu.errors import DataError


def _mini(n=400, d=16, q=8, seed=0):
    rng = np.random.default_rng(seed)
    train = rng.standard_normal((n, d)).astype(np.float32)
    train /= np.linalg.norm(train, axis=1, keepdims=True)
    test = rng.standard_normal((q, d)).astype(np.float32)
    test /= np.linalg.norm(test, axis=1, keepdims=True)
    d_full = 1.0 - test @ train.T
    gt_i = np.argsort(d_full, axis=1)[:, :10].astype(np.int32)
    gt_d = np.take_along_axis(d_full, gt_i, axis=1).astype(np.float32)
    return AnnDataset(train=train, test=test, distances=gt_d,
                      neighbors=gt_i, name="mini")


class TestRoundTrip:
    def test_byte_exact(self, tmp_path):
        ds = _mini()
        p = str(tmp_path / "mini.hdf5")
        save_hdf5_dataset(p, ds)
        back = load_hdf5_dataset(p)
        np.testing.assert_array_equal(back.train, ds.train)
        np.testing.assert_array_equal(back.test, ds.test)
        np.testing.assert_array_equal(back.distances, ds.distances)
        np.testing.assert_array_equal(back.neighbors, ds.neighbors)
        assert back.name == "mini"

    def test_optional_gt_absent(self, tmp_path):
        ds = _mini()
        p = str(tmp_path / "nogt.hdf5")
        save_hdf5_dataset(p, AnnDataset(
            train=ds.train, test=ds.test, distances=None, neighbors=None,
        ))
        back = load_hdf5_dataset(p)
        assert back.distances is None and back.neighbors is None

    def test_missing_required_key(self, tmp_path):
        import h5py

        p = str(tmp_path / "bad.hdf5")
        with h5py.File(p, "w") as f:
            f.create_dataset("train", data=np.zeros((4, 4), np.float32))
        with pytest.raises(DataError):
            load_hdf5_dataset(p)

    def test_missing_file(self):
        with pytest.raises(DataError):
            load_hdf5_dataset("/nonexistent/x.hdf5")


class TestSearchEquality:
    def test_loaded_equals_in_memory(self, tmp_path):
        """Search through the loaded file == search on in-memory arrays
        (the bench.py contract: the hdf5 hop changes nothing)."""
        from clann_tpu.config import Config
        from clann_tpu.core.index import build_index
        from clann_tpu.ops.ivf import scan_search

        ds = _mini()
        p = str(tmp_path / "mini.hdf5")
        save_hdf5_dataset(p, ds)
        back = load_hdf5_dataset(p)

        cfg = Config(num_tables=4, num_clusters_factor=0.5, k=5, delta=0.8,
                     hash_family="simhash", seed=0)
        i_mem = build_index(ds.train, cfg)
        i_h5 = build_index(back.train, cfg)
        d0, id0, _ = scan_search(i_mem, ds.test, k=5, exact=True)
        d1, id1, _ = scan_search(i_h5, back.test, k=5, exact=True)
        np.testing.assert_array_equal(np.asarray(id0), np.asarray(id1))
        np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
