"""Tests for the upstream-PUFFINN-compatible Python API (clann_tpu.puffinn).

Models the upstream wrapper's surface (python_wrapper.cpp:243-584) and the
vendored C++ suite's contracts:
- brute-force correctness on tiny fixtures (collection_test.hpp:36-85)
- statistical recall >= 0.8 * recall * k * samples (collection_test.hpp:87-176)
- search_from_index == search with self removed (collection_test.hpp:382-401)
- closest_pairs vs the brute-force join oracle (collection.hpp:390-521)
- pickle round-trip (python_wrapper.cpp:570-572)
"""

import pickle

import numpy as np
import pytest

from clann_tpu import puffinn
from clann_tpu.errors import DataError, IndexCreationError

MEM = 256 * 1024 * 1024


def unit_vectors(n, d, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


class TestConstruction:
    def test_bad_metric(self):
        with pytest.raises(ValueError):
            puffinn.Index("euclidean", 10, MEM)

    def test_bad_hash_function(self):
        with pytest.raises(ValueError):
            puffinn.Index("angular", 10, MEM, hash_function="minhash")
        with pytest.raises(ValueError):
            puffinn.Index("jaccard", 10, MEM, hash_function="simhash")

    def test_bad_source_and_kwargs(self):
        with pytest.raises(ValueError):
            puffinn.Index("angular", 10, MEM, hash_source="bogus")
        with pytest.raises(TypeError):
            puffinn.Index("angular", 10, MEM, bogus_arg=1)
        with pytest.raises(TypeError):
            puffinn.Index("angular", 10, MEM, hash_args={"bogus": 1})

    def test_insufficient_memory(self):
        # c_binder.cpp:53-60 maps a failed rebuild to "insufficient memory"
        idx = puffinn.Index("angular", 16, 10_000)
        for v in unit_vectors(200, 16):
            idx.insert(v)
        with pytest.raises(IndexCreationError):
            idx.rebuild()

    def test_dimension_check(self):
        idx = puffinn.Index("angular", 8, MEM)
        with pytest.raises(ValueError):
            idx.insert([1.0, 2.0])

    def test_universe_check(self):
        idx = puffinn.Index("jaccard", 10, MEM)
        with pytest.raises(DataError):
            idx.insert([3, 11])

    def test_empty_rebuild(self):
        with pytest.raises(DataError):
            puffinn.Index("angular", 8, MEM).rebuild()


class TestAngular:
    @pytest.fixture(scope="class")
    def built(self):
        x = unit_vectors(600, 24, seed=7)
        idx = puffinn.Index("angular", 24, MEM, hash_function="simhash",
                            seed=3)
        for v in x:
            idx.insert(v)
        idx.rebuild()
        return idx, x

    def test_get_normalized(self, built):
        idx, x = built
        got = np.asarray(idx.get(5))
        np.testing.assert_allclose(got, x[5] / np.linalg.norm(x[5]),
                                   rtol=1e-6)
        assert len(idx) == 600

    def test_recall_contract(self, built):
        # collection_test.hpp:87-176: correct >= 0.8 * recall * k * samples
        idx, x = built
        rng = np.random.default_rng(11)
        queries = rng.normal(size=(40, 24)).astype(np.float32)
        queries /= np.linalg.norm(queries, axis=1, keepdims=True)
        sims = queries @ x.T
        k, recall = 5, 0.8
        correct = 0
        for qi, q in enumerate(queries):
            gt_kth = np.sort(sims[qi])[::-1][k - 1]
            res = idx.search(q, k, recall)
            assert len(res) == k
            correct += sum(sims[qi, r] >= gt_kth - 1e-6 for r in res)
        assert correct >= 0.8 * recall * k * len(queries)

    def test_search_from_index_excludes_self(self, built):
        # collection.hpp:335-356 + collection_test.hpp:382-401
        idx, x = built
        for i in (0, 17, 599):
            res = idx.search_from_index(i, 5, 0.8)
            assert i not in res
            assert len(res) == 5

    def test_closest_pairs(self, built):
        idx, x = built
        pairs = idx.closest_pairs(10, 0.8)
        assert 0 < len(pairs) <= 10
        sims = (x @ x.T + 1.0) * 0.5
        iu = np.triu_indices(len(x), k=1)
        true_top = np.sort(sims[iu])[::-1][:10]
        got = [sims[a, b] for a, b in pairs]
        # at least half the reported pairs are within the true top-10 range
        assert np.mean(np.asarray(got) >= true_top[-1] - 1e-6) >= 0.5

    def test_filter_types(self, built):
        idx, x = built
        q = x[3]
        r_def = idx.search(q, 5, 0.8, filter_type="default")
        r_none = idx.search(q, 5, 0.8, filter_type="none")
        r_simple = idx.search(q, 5, 0.8, filter_type="simple")
        assert r_def[0] == r_none[0] == r_simple[0] == 3
        with pytest.raises(ValueError):
            idx.search(q, 5, 0.8, filter_type="bogus")

    def test_pickle_roundtrip(self, built):
        idx, x = built
        blob = pickle.dumps(idx)
        idx2 = pickle.loads(blob)
        # deterministic seed -> identical tables -> identical results
        for qi in (1, 250):
            assert idx.search(x[qi], 5, 0.9) == idx2.search(x[qi], 5, 0.9)

    def test_insert_after_rebuild_pending(self, built):
        idx, x = built
        # pending points are not searchable until the next rebuild
        # (collection.hpp:218-222 contract)
        idx.insert(np.roll(x[0], 1))
        assert len(idx) == 601
        res = idx.search(x[0], 5, 0.9)
        assert all(r < 600 for r in res)
        # regression: pickling with pending inserts must restore EXACTLY
        # the serialized state — the pending point stays pending (the
        # lazy restore used to rebuild over ALL buffered points, making
        # it searchable and changing the derived table count)
        idx2 = pickle.loads(pickle.dumps(idx))
        res2 = idx2.search(x[0], 5, 0.9)
        assert res2 == res
        assert idx2._built_count == 600 and len(idx2) == 601

    def test_source_args_pool_size(self):
        x = unit_vectors(200, 16, seed=4)
        idx = puffinn.Index("angular", 16, MEM, hash_function="simhash",
                            hash_source="pool",
                            source_args={"pool_size": 19})
        for v in x:
            idx.insert(v)
        idx.rebuild()
        assert idx._index.config.pool_size == 19
        res = idx.search(x[3], 5, 0.9)
        assert res[0] == 3

    def test_jaccard_rejects_non_independent_source(self):
        with pytest.raises(NotImplementedError):
            puffinn.Index("jaccard", 100, MEM, hash_source="pool")


class TestMemoryDerivedTables:
    def test_more_memory_more_tables(self):
        x = unit_vectors(300, 16, seed=2)
        small = puffinn.Index("angular", 16, 2 * 1024 * 1024,
                              hash_function="simhash")
        big = puffinn.Index("angular", 16, 64 * 1024 * 1024,
                            hash_function="simhash")
        for v in x:
            small.insert(v)
            big.insert(v)
        small.rebuild()
        big.rebuild()
        ls = small._index.config.num_tables
        lb = big._index.config.num_tables
        assert ls >= 1 and lb > ls
        assert lb <= 256


class TestJaccard:
    @pytest.fixture(scope="class")
    def built(self):
        from clann_tpu.data.synthetic import clustered_sets

        universe = 500
        sets = clustered_sets(400, universe, avg_size=14, n_modes=10,
                              core_share=0.9, pool_factor=1.2, seed=5)
        idx = puffinn.Index("jaccard", universe, MEM, seed=1)
        for s in sets:
            idx.insert(s)
        idx.rebuild()
        return idx, sets

    @staticmethod
    def jaccard(a, b):
        a, b = set(a), set(b)
        return len(a & b) / len(a | b)

    def test_get(self, built):
        idx, sets = built
        assert idx.get(7) == sorted(set(sets[7]))

    def test_recall_contract(self, built):
        idx, sets = built
        k, recall = 3, 0.8
        correct = 0
        samples = range(0, 400, 16)
        for qi in samples:
            sims = np.asarray(
                [self.jaccard(sets[qi], s) for s in sets]
            )
            gt_kth = np.sort(sims)[::-1][k - 1]
            res = idx.search(sets[qi], k, recall)
            correct += sum(sims[r] >= gt_kth - 1e-6 for r in res)
        assert correct >= 0.8 * recall * k * len(list(samples))

    def test_search_from_index(self, built):
        idx, _ = built
        res = idx.search_from_index(4, 3, 0.8)
        assert 4 not in res and len(res) == 3

    def test_closest_pairs_vs_oracle(self, built):
        from clann_tpu.data.setdata import JaccardData
        from clann_tpu.ops.join import jaccard_bf_join

        idx, sets = built
        pairs = idx.closest_pairs(10, 0.8)
        assert 0 < len(pairs) <= 10
        bf_pairs, bf_sims = jaccard_bf_join(JaccardData(sets, 500), k=10)
        got = [self.jaccard(sets[a], sets[b]) for a, b in pairs]
        assert np.mean(np.asarray(got) >= bf_sims[-1] - 1e-6) >= 0.5

    def test_1bit_minhash_tables(self):
        from clann_tpu.data.synthetic import clustered_sets

        sets = clustered_sets(200, 300, avg_size=10, n_modes=8, seed=8)
        idx = puffinn.Index("jaccard", 300, MEM,
                            hash_function="1bit_minhash")
        for s in sets:
            idx.insert(s)
        idx.rebuild()
        res = idx.search(sets[0], 1, 0.8)
        assert res and self.jaccard(sets[res[0]], sets[0]) >= 0.99

    def test_pickle_roundtrip(self, built):
        idx, sets = built
        idx2 = pickle.loads(pickle.dumps(idx))
        assert idx.search(sets[2], 3, 0.9) == idx2.search(sets[2], 3, 0.9)
