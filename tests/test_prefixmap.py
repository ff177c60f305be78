"""Tests for the sorted-table layout and prefix-range stream.

Coverage/disjointness invariants replace the reference's pointer-walk
semantics (prefixmap.hpp get_next_range): the union of all revealed ranges
over the full peeling walk must be the whole segment, with no overlaps and
no double counting (SURVEY.md §7 hard parts: "must not double-count
candidates").
"""

import jax.numpy as jnp
import numpy as np
import pytest

from clann_tpu.ops.prefixmap import (
    build_prefix_directory,
    candidate_stream,
    depth_bounds,
    sort_tables_segmented,
)

D = 12  # small hash width keeps the test readable


@pytest.fixture(scope="module")
def table():
    rng = np.random.default_rng(0)
    n = 400
    hashes = rng.integers(0, 1 << D, size=(2, n)).astype(np.uint32)
    clusters = np.sort(rng.integers(0, 3, size=n)).astype(np.int32)
    sh, si = sort_tables_segmented(jnp.asarray(hashes), jnp.asarray(clusters))
    starts = np.searchsorted(clusters, np.arange(4))
    return np.asarray(sh), np.asarray(si), starts, clusters


class TestSortTables:
    def test_sorted_within_segments(self, table):
        sh, si, starts, clusters = table
        for t in range(2):
            for c in range(3):
                seg = sh[t, starts[c] : starts[c + 1]]
                assert np.all(np.diff(seg.astype(np.int64)) >= 0)

    def test_ids_match_cluster(self, table):
        sh, si, starts, clusters = table
        for c in range(3):
            ids = si[0, starts[c] : starts[c + 1]]
            assert np.all(clusters[ids] == c)


class TestDepthBounds:
    def test_bounds_nested_and_correct(self, table):
        sh, si, starts, clusters = table
        qh = np.asarray([[0x2A3, 0x7FF]], np.uint32)  # one query, 2 tables
        seg_lo = np.asarray([starts[1]], np.int32)
        seg_hi = np.asarray([starts[2]], np.int32)
        lo, hi = depth_bounds(
            jnp.asarray(sh), jnp.asarray(qh), jnp.asarray(seg_lo),
            jnp.asarray(seg_hi), D, n_iters=10,
        )
        lo, hi = np.asarray(lo)[0], np.asarray(hi)[0]
        for t in range(2):
            for d in range(D + 1):
                # exact definition via numpy
                pref = (qh[0, t] >> (D - d)) << (D - d) if d > 0 else 0
                upper = pref + (1 << (D - d)) if d > 0 else 1 << 30
                seg = sh[t, seg_lo[0] : seg_hi[0]].astype(np.int64)
                np_lo = seg_lo[0] + np.searchsorted(seg, pref, side="left")
                np_hi = seg_lo[0] + np.searchsorted(seg, upper, side="left")
                assert lo[t, d] == np_lo, (t, d)
                assert hi[t, d] == np_hi, (t, d)
                if d > 0:
                    # nesting: deeper prefix range inside shallower
                    assert lo[t, d] >= lo[t, d - 1]
                    assert hi[t, d] <= hi[t, d - 1]


class TestPrefixDirectory:
    def test_directory_buckets_exact(self, table):
        sh, si, starts, clusters = table
        dir_bits = 4
        pdir = np.asarray(
            build_prefix_directory(
                jnp.asarray(sh), jnp.asarray(starts.astype(np.int32)),
                dir_bits, n_iters=10, max_hashbits=D,
            )
        )
        for t in range(2):
            for c in range(3):
                seg = sh[t, starts[c] : starts[c + 1]].astype(np.int64)
                for p in range((1 << dir_bits) + 1):
                    key = p << (D - dir_bits)
                    expect = starts[c] + np.searchsorted(seg, key, "left")
                    assert pdir[t, c, p] == expect, (t, c, p)

    def test_seeded_bounds_match_unseeded(self, table):
        """Directory-seeded depth_bounds == plain depth_bounds exactly."""
        sh, si, starts, clusters = table
        rng = np.random.default_rng(7)
        qh = rng.integers(0, 1 << D, size=(8, 2)).astype(np.uint32)
        cluster = rng.integers(0, 3, size=8).astype(np.int32)
        seg_lo = starts[cluster].astype(np.int32)
        seg_hi = starts[cluster + 1].astype(np.int32)
        lo0, hi0 = depth_bounds(
            jnp.asarray(sh), jnp.asarray(qh), jnp.asarray(seg_lo),
            jnp.asarray(seg_hi), D, n_iters=10,
        )
        dir_bits = 4
        pdir = build_prefix_directory(
            jnp.asarray(sh), jnp.asarray(starts.astype(np.int32)),
            dir_bits, n_iters=10, max_hashbits=D,
        )
        max_bucket = int(jnp.max(pdir[:, :, 1:] - pdir[:, :, :-1]))
        iters = int(np.ceil(np.log2(max(2, max_bucket)))) + 1
        lo1, hi1 = depth_bounds(
            jnp.asarray(sh), jnp.asarray(qh), jnp.asarray(seg_lo),
            jnp.asarray(seg_hi), D, n_iters=iters,
            prefix_dir=pdir, cluster=jnp.asarray(cluster),
            dir_bits=dir_bits,
        )
        np.testing.assert_array_equal(np.asarray(lo0), np.asarray(lo1))
        np.testing.assert_array_equal(np.asarray(hi0), np.asarray(hi1))


class TestCandidateStream:
    def test_partition_of_segment(self, table):
        """Ranges of the full walk exactly tile each table segment."""
        sh, si, starts, clusters = table
        qh = np.asarray([[0x0F0, 0x555]], np.uint32)
        seg_lo = np.asarray([starts[0]], np.int32)
        seg_hi = np.asarray([starts[1]], np.int32)
        lo, hi = depth_bounds(
            jnp.asarray(sh), jnp.asarray(qh), jnp.asarray(seg_lo),
            jnp.asarray(seg_hi), D, n_iters=10,
        )
        st, sz = candidate_stream(lo, hi, jnp.asarray(qh), D, min_depth=1)
        st, sz = np.asarray(st)[0], np.asarray(sz)[0]
        L = 2
        for t in range(L):
            slots = []
            for level in range(D):  # depths D..1
                jdx = level * L + t
                slots.extend(range(st[jdx], st[jdx] + sz[jdx]))
            # depth 1 leaves the non-matching top-bit half unexplored,
            # exactly like the reference walk (depth loop ends at 1)
            covered = set(slots)
            assert len(slots) == len(covered), "overlapping ranges"
            d1 = 1
            pref = (qh[0, t] >> (D - d1)) << (D - d1)
            seg = sh[t, seg_lo[0] : seg_hi[0]].astype(np.int64)
            explored = {
                seg_lo[0] + i
                for i, h in enumerate(seg)
                if (h >> (D - 1)) == (pref >> (D - 1))
            }
            assert covered == explored

    def test_sizes_nonnegative_and_bounded(self, table):
        sh, si, starts, clusters = table
        rng = np.random.default_rng(1)
        qh = rng.integers(0, 1 << D, size=(5, 2)).astype(np.uint32)
        seg_lo = np.full(5, starts[1], np.int32)
        seg_hi = np.full(5, starts[2], np.int32)
        lo, hi = depth_bounds(
            jnp.asarray(sh), jnp.asarray(qh), jnp.asarray(seg_lo),
            jnp.asarray(seg_hi), D, n_iters=10,
        )
        st, sz = candidate_stream(lo, hi, jnp.asarray(qh), D, min_depth=1)
        sz = np.asarray(sz)
        assert np.all(sz >= 0)
        seg_len = starts[2] - starts[1]
        # per (q, t), total stream <= segment length
        per_table = sz.reshape(5, D, 2).sum(axis=1)
        assert np.all(per_table <= seg_len)


class TestOnehotDirectory:
    """The f32 (one-hot MXU) directory path must be bit-identical to the
    i32 gather path, and the entry-cap walk must preserve the recall
    contract (kernel-vs-reference equivalence, math_test.hpp analog)."""

    def test_onehot_matches_gather(self):
        import jax.numpy as jnp

        from clann_tpu.ops.prefixmap import (
            build_prefix_directory,
            depth_bounds,
            sort_tables_segmented,
        )

        rng = np.random.default_rng(5)
        n, L, D, db = 3000, 6, 16, 7
        clusters = np.sort(rng.integers(0, 5, n)).astype(np.int32)
        starts = np.searchsorted(clusters, np.arange(6)).astype(np.int32)
        hashes = rng.integers(0, 1 << D, (L, n), dtype=np.uint32)
        sh, si = sort_tables_segmented(jnp.asarray(hashes), jnp.asarray(clusters))
        pdir = build_prefix_directory(
            sh, jnp.asarray(starts), db, 14, max_hashbits=D
        )

        Q = 24
        qh = jnp.asarray(rng.integers(0, 1 << D, (Q, L), dtype=np.uint32))
        qc = jnp.asarray(rng.integers(0, 5, Q, dtype=np.int32))
        slo = jnp.asarray(starts)[qc]
        shi = jnp.asarray(starts)[qc + 1]
        kw = dict(up_to_depth=12, cluster=qc, dir_bits=db)
        lo_g, hi_g = depth_bounds(sh, qh, slo, shi, D, 8,
                                  prefix_dir=pdir, **kw)
        lo_o, hi_o = depth_bounds(sh, qh, slo, shi, D, 8,
                                  prefix_dir=pdir.astype(jnp.float32), **kw)
        np.testing.assert_array_equal(np.asarray(lo_g), np.asarray(lo_o))
        np.testing.assert_array_equal(np.asarray(hi_g), np.asarray(hi_o))

    def test_entry_cap_recall_contract(self):
        from clann_tpu.config import Config
        from clann_tpu.core.index import build_index
        from clann_tpu.data.synthetic import clustered_unit_vectors, random_unit_vectors
        from clann_tpu.metrics.recall import recall_by_ids
        from clann_tpu.ops.distances import brute_force_topk
        from clann_tpu.ops.query import search

        train = clustered_unit_vectors(2500, 16, n_modes=24, seed=8)
        queries = random_unit_vectors(32, 16, seed=9)
        gt_d, gt_i = brute_force_topk(train, queries, k=5, metric="angular")
        cfg = Config(
            num_tables=10, num_clusters_factor=0.4, k=5, delta=0.9,
            hash_family="simhash", candidate_chunk=128,
            brute_force_threshold=20, seed=6, lsh_entry_cap=True,
            prefix_dir_bits=8,
        )
        index = build_index(train, cfg)
        dists, ids, st = search(index, queries, k=5, delta=0.9)
        r = recall_by_ids(np.asarray(gt_i), ids, count=5)
        assert r >= 0.6, r
        # entering at the directory granularity consumes coarser entry
        # ranges; still adaptive, never the whole dataset
        assert np.mean(st.distance_computations) < train.shape[0]


class TestLazyChunkStream:
    """The lazy depth-window stream (chunk_stream_direct) must reproduce
    the eager depth_bounds + candidate_stream layout exactly, window by
    window, in both directory lookup modes."""

    def _fixture(self):
        from clann_tpu.ops.prefixmap import (
            build_prefix_directory,
            sort_tables_segmented,
        )

        rng = np.random.default_rng(11)
        n, L, D, db = 4000, 5, 16, 8
        clusters = np.sort(rng.integers(0, 7, n)).astype(np.int32)
        starts = np.searchsorted(clusters, np.arange(8)).astype(np.int32)
        hashes = rng.integers(0, 1 << D, (L, n), dtype=np.uint32)
        sh, si = sort_tables_segmented(
            jnp.asarray(hashes), jnp.asarray(clusters)
        )
        pdir = build_prefix_directory(
            sh, jnp.asarray(starts), db, 14, max_hashbits=D
        )
        Q = 16
        qh = jnp.asarray(rng.integers(0, 1 << D, (Q, L), dtype=np.uint32))
        qc = jnp.asarray(rng.integers(0, 7, Q, dtype=np.int32))
        slo = jnp.asarray(starts)[qc]
        shi = jnp.asarray(starts)[qc + 1]
        return sh, pdir, qh, qc, slo, shi, D, db, L

    @pytest.mark.parametrize("onehot", [False, True])
    @pytest.mark.parametrize("lc", [1, 3, 4])
    def test_chunks_concat_to_eager_stream(self, onehot, lc):
        from clann_tpu.ops.prefixmap import (
            candidate_stream,
            chunk_stream_direct,
            depth_bounds,
        )

        sh, pdir, qh, qc, slo, shi, D, db, L = self._fixture()
        d_entry, min_depth = 8, 1
        nd = d_entry - min_depth + 1

        lo, hi = depth_bounds(
            sh, qh, slo, shi, D, 8, up_to_depth=d_entry,
            prefix_dir=pdir, cluster=qc, dir_bits=db,
        )
        st_e, sz_e = candidate_stream(
            lo, hi, qh, D, min_depth, start_depth=d_entry
        )
        st_e, sz_e = np.asarray(st_e), np.asarray(sz_e)

        cdir_kw = (
            {"cdir_oh": jnp.asarray(pdir.astype(jnp.float32))[:, qc, :]}
            if onehot
            else {"cdir": pdir[:, qc, :]}
        )
        chunks = []
        n_chunks = -(-nd // lc)
        for ci in range(n_chunks):
            st_c, sz_c = chunk_stream_direct(
                qh,
                jnp.asarray(d_entry - ci * lc, jnp.int32),
                jnp.asarray(ci == 0),
                lc, D, db, min_depth, d_entry,
                **cdir_kw,
            )
            chunks.append((np.asarray(st_c), np.asarray(sz_c)))
        st_l = np.concatenate([c[0] for c in chunks], axis=1)
        sz_l = np.concatenate([c[1] for c in chunks], axis=1)

        m = nd * L
        np.testing.assert_array_equal(sz_l[:, :m], sz_e)
        live = sz_e > 0
        np.testing.assert_array_equal(
            np.where(live, st_l[:, :m], 0), np.where(live, st_e, 0)
        )
        # levels below min_depth (final partial window) are masked out
        assert (sz_l[:, m:] == 0).all()
