"""Tests for the dense IVF probing path (ops/ivf.py)."""

import numpy as np
import pytest

import clann_tpu
from clann_tpu.config import Config
from clann_tpu.core.index import build_index
from clann_tpu.metrics.recall import recall_by_ids, recall_values
from clann_tpu.ops.distances import brute_force_topk
from clann_tpu.ops.ivf import auto_n_probe, auto_probe_cap, dense_search


@pytest.fixture(scope="module")
def built(small_angular_dataset):
    ds = small_angular_dataset
    cfg = Config(
        num_tables=8,
        num_clusters_factor=0.4,
        k=10,
        hash_family="simhash",
        candidate_chunk=128,
        seed=11,
        dense_layout=True,
    )
    return build_index(ds.train, cfg), ds


class TestDenseLayout:
    def test_segments_padded_correctly(self, built):
        index, ds = built
        seg_ids = np.asarray(index.seg_ids)
        sizes = np.asarray(index.seg_sizes)
        R = seg_ids.shape[0]
        for r in [0, R // 2, R - 1]:
            row = seg_ids[r]
            assert np.all(row[: sizes[r]] >= 0)
            assert np.all(row[sizes[r] :] == -1)
        # padded vectors are zero
        sv = np.asarray(index.seg_vectors)
        pads = seg_ids < 0
        assert np.allclose(sv[pads], 0.0)
        # rows inherit their owner cluster's center
        owner = np.asarray(index.seg_cluster)
        centers = np.asarray(index.centers)
        np.testing.assert_allclose(
            np.asarray(index.seg_centers), centers[owner], atol=1e-6
        )

    def test_all_points_covered(self, built):
        index, ds = built
        seg_ids = np.asarray(index.seg_ids)
        real = seg_ids[seg_ids >= 0]
        assert len(real) == ds.train.shape[0]
        assert len(np.unique(real)) == ds.train.shape[0]


class TestDenseSearch:
    def test_full_probe_equals_brute_force(self, built):
        index, ds = built
        C = int(index.seg_centers.shape[0])
        gt_d, gt_i = brute_force_topk(ds.train, ds.test[:32], k=10, metric="angular")
        dists, ids, stats = dense_search(index, ds.test[:32], k=10, n_probe=C)
        # probing every cluster == exact search
        np.testing.assert_allclose(dists, np.asarray(gt_d), atol=1e-4)
        assert int(stats.dropped_probes) == 0
        assert np.all(np.asarray(stats.uncertified) == 0)
        np.testing.assert_array_equal(
            np.asarray(stats.distance_computations), ds.train.shape[0]
        )

    def test_partial_probe_recall(self, built):
        index, ds = built
        dists, ids, stats = dense_search(index, ds.test, k=10, n_probe=12)
        mean_recall, _, _ = recall_values(ds.distances, dists, count=10)
        assert mean_recall >= 0.9, mean_recall
        # probing fewer clusters means fewer distance computations
        assert np.mean(stats.distance_computations) < ds.train.shape[0]

    def test_results_sorted_unique(self, built):
        index, ds = built
        dists, ids, _ = dense_search(index, ds.test[:16], k=10, n_probe=6)
        assert np.all(np.diff(dists, axis=1) >= -1e-6)
        for row in ids:
            real = [i for i in row.tolist() if i >= 0]
            assert len(set(real)) == len(real)

    def test_uncertified_counts(self, built):
        index, ds = built
        # tiny probe budget leaves overlapping clusters unprobed
        _, _, s1 = dense_search(index, ds.test, k=10, n_probe=1)
        _, _, s2 = dense_search(
            index, ds.test, k=10, n_probe=int(index.seg_centers.shape[0])
        )
        assert np.mean(s1.uncertified) >= np.mean(s2.uncertified)
        assert np.all(np.asarray(s2.uncertified) == 0)

    def test_heuristics(self):
        assert auto_n_probe(100) >= 8
        assert auto_n_probe(4) == 4
        cap = auto_probe_cap(512, 8, 64)
        assert cap % 8 == 0 and cap >= 8


class TestModeDispatch:
    def test_api_auto_uses_dense(self, built):
        index, ds = built
        h = clann_tpu.Clann(ds.train, index.config)
        h.index = index
        d1, i1, s1 = h.search_batch(ds.test[:8], mode="dense")
        d2, i2, s2 = h.search_batch(ds.test[:8], mode="auto")
        np.testing.assert_array_equal(i1, i2)
        from clann_tpu.ops.ivf import DenseSearchStats

        assert isinstance(s2, DenseSearchStats)

    def test_lsh_mode_still_works(self, built):
        index, ds = built
        h = clann_tpu.Clann(ds.train, index.config)
        h.index = index
        d, i, s = h.search_batch(ds.test[:8], mode="lsh")
        from clann_tpu.ops.query import SearchStats

        assert isinstance(s, SearchStats)
        assert d.shape == (8, 10)

    def test_dense_layout_disabled(self, small_angular_dataset):
        ds = small_angular_dataset
        cfg = Config(
            num_tables=4, num_clusters_factor=0.3, k=5,
            hash_family="simhash", dense_layout=False, seed=1,
        )
        index = build_index(ds.train[:500], cfg)
        assert index.seg_vectors is None
        with pytest.raises(ValueError):
            dense_search(index, ds.test[:4], k=5)
        # auto falls back to lsh
        h = clann_tpu.Clann(ds.train[:500], cfg)
        h.index = index
        d, i, s = h.search_batch(ds.test[:4], mode="auto")
        assert d.shape == (4, 5)


class TestAdaptiveDense:
    def test_exact_when_run_to_completion(self, built):
        from clann_tpu.ops.ivf import adaptive_dense_search

        index, ds = built
        dists, ids, stats = adaptive_dense_search(index, ds.test, k=10, wave=4)
        mean_recall, _, _ = recall_values(ds.distances, dists, count=10)
        # exact up to the reference's non-metric ball-bound caveat
        assert mean_recall >= 0.98, mean_recall
        assert np.all(stats.uncertified == 0)

    def test_stops_early_on_clustered_data(self, built):
        from clann_tpu.ops.ivf import adaptive_dense_search

        index, ds = built
        _, _, stats = adaptive_dense_search(index, ds.test, k=10, wave=4)
        R = int(index.seg_centers.shape[0])
        # at least some queries retire before visiting every row
        assert np.mean(stats.clusters_visited) < R

    def test_api_mode(self, built):
        index, ds = built
        h = clann_tpu.Clann(ds.train, index.config)
        h.index = index
        d, i, s = h.search_batch(ds.test[:8], mode="adaptive")
        assert d.shape == (8, 10)


class TestScanPullModes:
    def test_ids_pull_matches_packed(self, built):
        """pull="ids" must deliver the same ids as the packed pull; the
        caller-side exact reconstruction must reproduce the packed
        distances (sims are deterministic per id)."""
        from clann_tpu.ops.ivf import scan_search

        index, ds = built
        q = ds.test[:32]
        d1, i1, st1 = scan_search(index, q, k=5, batch_q=16)
        d2, i2, st2 = scan_search(index, q, k=5, batch_q=16, pull="ids")
        assert d2 is None
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_array_equal(
            st1.distance_computations, st2.distance_computations
        )
        tn = ds.train / np.linalg.norm(ds.train, axis=-1, keepdims=True)
        qn = q / np.linalg.norm(q, axis=-1, keepdims=True)
        safe = np.clip(i2, 0, tn.shape[0] - 1)
        rec = 1.0 - np.einsum("qkd,qd->qk", tn[safe], qn)
        rec = np.where(i2 >= 0, np.clip(rec, 0.0, 2.0), np.inf)
        np.testing.assert_allclose(rec, d1, atol=2e-5)

    def test_ids_pull_pallas(self, built):
        from clann_tpu.ops.ivf import scan_search

        index, ds = built
        q = ds.test[:16]
        d1, i1, _ = scan_search(index, q, k=5, use_pallas=True, batch_q=16)
        d2, i2, _ = scan_search(index, q, k=5, use_pallas=True,
                                batch_q=16, pull="ids")
        assert d2 is None
        np.testing.assert_array_equal(i1, i2)

    def test_ids_packed_pull_matches_ids(self, built):
        """pull="ids-packed" must deliver byte-identical ids to "ids" on
        both scan paths (device bit-pack + exact host unpack)."""
        from clann_tpu.ops.ivf import scan_search

        index, ds = built
        q = ds.test[:32]
        for kw in (dict(), dict(use_pallas=True, pallas_auto_route=False)):
            _, i1, st1 = scan_search(index, q, k=5, batch_q=16,
                                     pull="ids", **kw)
            d3, i3, st3 = scan_search(index, q, k=5, batch_q=16,
                                      pull="ids-packed", **kw)
            assert d3 is None
            np.testing.assert_array_equal(i1, i3)
            np.testing.assert_array_equal(
                st1.distance_computations, st3.distance_computations
            )

    def test_ids_bit_roundtrip_with_sentinels(self):
        """Pack/unpack is exact across word boundaries and -1 slots."""
        from clann_tpu.ops.ivf import (
            _ids_pack_spec, _pack_ids_device, _unpack_ids_host,
        )
        import jax.numpy as jnp

        rng = np.random.default_rng(0)
        for n, k in ((1_183_514, 10), (2**21 - 1, 10), (100, 3),
                     (7, 17), (2**30, 4)):
            bits, words = _ids_pack_spec(n, k)
            assert k * bits <= words * 32
            ids = rng.integers(0, n, size=(23, k)).astype(np.int32)
            ids[::3, -1] = -1  # empty-slot sentinels
            ids[0, :] = n - 1  # max value everywhere
            packed = np.asarray(_pack_ids_device(
                jnp.asarray(ids), n=n, bits=bits, words=words))
            assert packed.shape == (23, words)
            out = _unpack_ids_host(packed, n=n, bits=bits, k=k)
            np.testing.assert_array_equal(ids, out)
