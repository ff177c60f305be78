"""Incremental insert + rebuild.

Models the reference's incremental-rebuild contract: Index::insert appends
to the Dataset only (collection.hpp:218-222), rebuild hashes the points
inserted since the last rebuild and rebuilds every table
(collection.hpp:241-306, tested at collection_test.hpp:258-289), and an
index serialized BEFORE a rebuild still round-trips
(collection_test.hpp:367-380). Beyond the reference: insertion into the
clustered geometry (nearest center + ball growth, core/index.insert).
"""

import numpy as np
import pytest

import clann_tpu
from clann_tpu.config import Config
from clann_tpu.core.index import (
    build_index,
    build_lsh_index,
    insert,
    rebuild,
)
from clann_tpu.data.synthetic import clustered_unit_vectors, random_unit_vectors
from clann_tpu.errors import DataError
from clann_tpu.ops.query import search


def _cfg(**kw):
    base = dict(
        num_tables=10,
        k=5,
        delta=0.9,
        hash_family="simhash",
        candidate_chunk=128,
        seed=7,
    )
    base.update(kw)
    return Config(**base)


def _table_pairs(index):
    """Canonical per-table (hash, id) multisets for comparison."""
    h = np.asarray(index.sorted_hash)
    i = np.asarray(index.sorted_idx)
    out = []
    for t in range(h.shape[0]):
        order = np.lexsort((i[t], h[t]))
        out.append(np.stack([h[t][order], i[t][order]], axis=1))
    return np.stack(out)


class TestIncrementalRebuild:
    def test_incremental_equals_fresh_build(self):
        """insert + rebuild == building from scratch on the full data:
        stored hash functions are reused, so pre-existing points keep
        their exact hashes and the merged tables are identical."""
        data = random_unit_vectors(1000, 24, seed=0)
        cfg = _cfg()
        fresh = build_lsh_index(data, cfg)

        inc = build_lsh_index(data[:700], cfg)
        inc = insert(inc, data[700:])
        assert inc.num_pending == 300
        inc = rebuild(inc)
        assert inc.num_pending == 0
        assert inc.n == 1000

        np.testing.assert_array_equal(_table_pairs(inc), _table_pairs(fresh))
        np.testing.assert_array_equal(
            np.asarray(inc.sketches), np.asarray(fresh.sketches)
        )
        np.testing.assert_allclose(
            np.asarray(inc.radii), np.asarray(fresh.radii), atol=1e-5
        )

    def test_two_rounds_of_insertion(self):
        data = random_unit_vectors(900, 16, seed=2)
        cfg = _cfg(num_tables=6)
        idx = build_lsh_index(data[:300], cfg)
        idx = rebuild(insert(idx, data[300:600]))
        idx = rebuild(insert(idx, data[600:]))
        fresh = build_lsh_index(data, cfg)
        np.testing.assert_array_equal(_table_pairs(idx), _table_pairs(fresh))

    def test_pending_invisible_until_rebuild(self):
        data = random_unit_vectors(500, 16, seed=3)
        extra = random_unit_vectors(40, 16, seed=4)
        idx = insert(build_lsh_index(data, _cfg(num_tables=6)), extra)
        # LSH path: pending ids (>= 500) must not appear
        _, ids, _ = search(idx, extra[:8], k=5, delta=0.9)
        assert ids.max() < 500
        idx = rebuild(idx)
        # after rebuild, a pending point finds itself
        dists, ids, _ = search(idx, extra[:8], k=5, delta=0.9)
        for row, d_row in zip(ids, dists):
            assert 500 <= row[0] < 540
            assert d_row[0] < 1e-5

    def test_clustered_insert_grows_balls(self):
        data = clustered_unit_vectors(2000, 16, n_modes=8, seed=5)
        extra = clustered_unit_vectors(100, 16, n_modes=8, seed=6)
        cfg = _cfg(num_clusters_factor=0.3, brute_force_threshold=20)
        idx = build_index(data, cfg)
        radii0 = np.asarray(idx.radii)
        idx2 = insert(idx, extra)
        # every new point is inside its (possibly grown) cluster ball
        cd = 1.0 - np.asarray(idx2.vectors[2000:]) @ np.asarray(
            idx2.centers
        ).T
        assign = np.asarray(idx2.assignment[2000:])
        radii = np.asarray(idx2.radii)
        assert np.all(
            cd[np.arange(100), assign] <= radii[assign] + 1e-5
        )
        assert np.all(radii >= radii0 - 1e-7)
        idx2 = rebuild(idx2)
        dists, ids, _ = search(idx2, extra[:16], k=5, delta=0.9)
        self_found = [
            2000 <= row[0] < 2100 and d[0] < 1e-5
            for row, d in zip(ids, dists)
        ]
        # cosine ball bound is approximate (triangle-inequality caveat,
        # ops/query.py docstring) — the vast majority must self-find
        assert np.mean(self_found) >= 0.9

    def test_insert_errors(self):
        idx = build_lsh_index(random_unit_vectors(200, 8, seed=0), _cfg())
        with pytest.raises(DataError):
            insert(idx, np.zeros((0, 8), np.float32))
        with pytest.raises(DataError):
            insert(idx, np.zeros((3, 9), np.float32))


class TestSerializeBeforeRebuild:
    def test_roundtrip_then_rebuild(self, tmp_path):
        """collection_test.hpp:367-380 analog: serialize with pending
        insertions, load, rebuild, and the pending points are indexed."""
        data = random_unit_vectors(600, 16, seed=8)
        extra = random_unit_vectors(30, 16, seed=9)
        cfg = _cfg(num_tables=6, dataset_name="ins")
        h = clann_tpu.init_with_config(data, cfg)
        clann_tpu.build(h)
        clann_tpu.insert(h, extra)
        path = clann_tpu.serialize(h, str(tmp_path))

        full = np.concatenate([data, extra / np.linalg.norm(
            extra, axis=1, keepdims=True)])
        h2 = clann_tpu.init_from_file(full, path)
        assert h2.index.num_pending == 30
        clann_tpu.rebuild(h2)
        assert h2.index.num_pending == 0
        _, ids, _ = search(h2.index, extra[:8], k=5, delta=0.9)
        assert all(600 <= row[0] < 630 for row in ids)

    def test_api_roundtrip_matches(self):
        data = random_unit_vectors(400, 16, seed=10)
        extra = random_unit_vectors(50, 16, seed=11)
        cfg = _cfg(num_tables=6)
        h = clann_tpu.init_with_config(data, cfg)
        clann_tpu.build(h)
        clann_tpu.rebuild(clann_tpu.insert(h, extra))
        fresh = build_lsh_index(
            np.asarray(h.index.vectors), cfg
        )
        np.testing.assert_array_equal(
            _table_pairs(h.index), _table_pairs(fresh)
        )
