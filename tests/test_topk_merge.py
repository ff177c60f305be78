"""Unit tests for the batched top-k merge (the MaxBuffer/heap equivalent).

Mirrors the reference's heap semantics tests (src/core/heap.rs:51-161 —
capacity, replacement, ordering, empty) and MaxBuffer behaviours
(maxbuffer.hpp + test/include/maxbuffer_test.hpp — dedup, clamping,
smallest_value threshold).
"""

import jax.numpy as jnp
import numpy as np

from clann_tpu.ops.query import _merge_topk


def merge(topk_sims, topk_ids, cand_ids, cand_sims, n=1000):
    s, i = _merge_topk(
        jnp.asarray(topk_sims, jnp.float32),
        jnp.asarray(topk_ids, jnp.int32),
        jnp.asarray(cand_ids, jnp.int32),
        jnp.asarray(cand_sims, jnp.float32),
        n_sentinel=n,
    )
    return np.asarray(s), np.asarray(i)


def empty(k=3):
    return np.zeros((1, k), np.float32), np.full((1, k), -1, np.int32)


class TestMergeTopk:
    def test_fill_from_empty(self):
        s0, i0 = empty()
        s, i = merge(s0, i0, [[5, 7, 9]], [[0.5, 0.9, 0.7]])
        assert i[0].tolist() == [7, 9, 5]
        np.testing.assert_allclose(s[0], [0.9, 0.7, 0.5])

    def test_capacity_keeps_best(self):
        # reference: heap.rs capacity tests — worst of k is replaced
        s0, i0 = merge(*empty(), [[1, 2, 3]], [[0.3, 0.2, 0.1]])
        s, i = merge(s0, i0, [[4]], [[0.25]])
        assert i[0].tolist() == [1, 4, 2]
        assert 3 not in i[0].tolist()

    def test_rejects_worse_than_kth(self):
        s0, i0 = merge(*empty(), [[1, 2, 3]], [[0.9, 0.8, 0.7]])
        s, i = merge(s0, i0, [[4]], [[0.1]])
        assert i[0].tolist() == [1, 2, 3]

    def test_dedup_within_chunk(self):
        # reference: maxbuffer.hpp dedup — same id twice enters once
        s, i = merge(*empty(), [[5, 5, 6]], [[0.9, 0.9, 0.8]])
        ids = i[0].tolist()
        assert ids.count(5) == 1
        assert 6 in ids

    def test_dedup_against_existing(self):
        s0, i0 = merge(*empty(), [[5, 6, 7]], [[0.9, 0.8, 0.7]])
        s, i = merge(s0, i0, [[5, 8]], [[0.9, 0.75]])
        ids = i[0].tolist()
        assert ids.count(5) == 1
        assert ids == [5, 6, 8] or ids == [5, 6, 7]  # 8 (0.75) beats 7 (0.7)
        assert ids == [5, 6, 8]

    def test_sentinel_never_enters(self):
        s, i = merge(*empty(), [[1000, 3]], [[0.99, 0.5]], n=1000)
        assert 1000 not in i[0].tolist()

    def test_zero_similarity_discarded(self):
        # reference: maxbuffer.hpp:66-70 — sim <= minval (0) is discarded
        s, i = merge(*empty(), [[3]], [[0.0]])
        assert i[0].tolist() == [-1, -1, -1]

    def test_descending_order_maintained(self):
        rng = np.random.default_rng(0)
        s0, i0 = empty(3)
        for step in range(5):
            ids = rng.choice(100, size=(1, 8), replace=False)
            sims = rng.uniform(0.01, 1, size=(1, 8)).astype(np.float32)
            s0, i0 = merge(s0, i0, ids, sims)
            assert np.all(np.diff(s0[0]) <= 1e-7)
        # final content == true top-3 of everything inserted

    def test_batched_rows_independent(self):
        s0 = np.zeros((2, 2), np.float32)
        i0 = np.full((2, 2), -1, np.int32)
        s, i = merge(s0, i0, [[1, 2], [3, 4]], [[0.9, 0.1], [0.2, 0.8]])
        assert i[0].tolist() == [1, 2]
        assert i[1].tolist() == [4, 3]
