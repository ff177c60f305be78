"""Tests for set data / MinHash / Jaccard index and closest-pairs join.

Models reference coverage:
- SetFormat universe checks (format/set.hpp:30-48; format_test.hpp)
- Jaccard similarity fixtures (similarity_measure_test.hpp)
- MinHash collision-probability contract (hash_test.hpp:63-100 analog)
- recall contract for the Jaccard index (collection_test.hpp:87-176)
- closest-pairs join vs the brute-force join oracle
  (collection.hpp:390-521)
"""

import jax
import numpy as np
import pytest

from clann_tpu.config import Config
from clann_tpu.data.setdata import (
    JaccardData,
    brute_force_jaccard_topk,
    jaccard_similarity_block,
    pad_sets,
)
from clann_tpu.errors import DataError
from clann_tpu.ops.minhash import MinHash, MinHash1Bit


def random_sets(n, universe, avg_size, seed=0):
    rng = np.random.default_rng(seed)
    sets = []
    for _ in range(n):
        size = max(2, rng.poisson(avg_size))
        sets.append(rng.choice(universe, size=min(size, universe), replace=False))
    return sets


class TestSetFormat:
    def test_pad_and_sort(self):
        out = pad_sets([[3, 1, 2], [5]], universe=10)
        assert out.shape == (2, 3)
        assert out[0].tolist() == [1, 2, 3]
        assert out[1].tolist() == [5, -1, -1]

    def test_universe_check(self):
        # reference: set.hpp:30-48
        with pytest.raises(DataError):
            pad_sets([[0, 11]], universe=10)
        with pytest.raises(DataError):
            pad_sets([[-1]], universe=10)

    def test_jaccard_values(self):
        # reference: similarity_measure_test.hpp fixtures
        a = pad_sets([[0, 1, 2, 3]], universe=10)
        b = pad_sets([[0, 1, 2, 3], [2, 3, 4, 5], [7, 8]], universe=10, t_max=4)
        sims = np.asarray(jaccard_similarity_block(a, b))
        assert sims[0, 0] == pytest.approx(1.0)
        assert sims[0, 1] == pytest.approx(2 / 6)
        assert sims[0, 2] == pytest.approx(0.0)


class TestMinHash:
    def test_bits_and_range(self):
        fam = MinHash(universe=100)
        assert fam.bits_per_function == 7  # ceil_log(100)
        params = fam.sample(jax.random.PRNGKey(0), 16)
        tokens = pad_sets(random_sets(50, 100, 8, seed=1), 100)
        h = np.asarray(fam.hash(params, tokens))
        assert h.shape == (50, 16)
        assert h.max() < (1 << 7)

    def test_identical_sets_collide(self):
        fam = MinHash(universe=64)
        params = fam.sample(jax.random.PRNGKey(1), 8)
        tokens = pad_sets([[1, 5, 9], [1, 5, 9]], universe=64)
        h = np.asarray(fam.hash(params, tokens))
        assert np.array_equal(h[0], h[1])

    def test_collision_probability_formula(self):
        # reference: minhash.hpp:244-253
        fam = MinHash(universe=64)
        # full-width hash: p == sim
        assert float(fam.collision_probability(0.5, fam.bits_per_function)) == (
            pytest.approx(0.5, abs=1e-6)
        )
        assert float(fam.collision_probability(0.3, 0)) == 1.0
        # fewer bits -> higher collision probability
        p1 = float(fam.collision_probability(0.5, 1))
        p3 = float(fam.collision_probability(0.5, 3))
        assert p1 > p3 > 0.5

    def test_empirical_collision_rate(self):
        # two sets with known jaccard; empirical vs formula
        fam = MinHash(universe=200)
        params = fam.sample(jax.random.PRNGKey(2), 600)
        a = list(range(0, 40))
        b = list(range(20, 60))  # |inter|=20 |union|=60 -> sim=1/3
        tokens = pad_sets([a, b], universe=200)
        h = np.asarray(fam.hash(params, tokens))
        emp = (h[0] == h[1]).mean()
        claimed = float(fam.collision_probability(1 / 3, fam.bits_per_function))
        assert abs(emp - claimed) < 0.07, (emp, claimed)

    def test_one_bit_variant(self):
        # reference: minhash.hpp:256-283
        fam = MinHash1Bit(universe=64)
        assert fam.bits_per_function == 1
        params = fam.sample(jax.random.PRNGKey(3), 32)
        tokens = pad_sets(random_sets(20, 64, 6, seed=2), 64)
        h = np.asarray(fam.hash(params, tokens))
        assert set(np.unique(h)).issubset({0, 1})


class TestJaccardIndex:
    @pytest.fixture(scope="class")
    def built(self):
        from clann_tpu.core.jaccard import build_jaccard_index

        universe = 500
        sets = random_sets(800, universe, 12, seed=5)
        data = JaccardData(sets, universe)
        cfg = Config(
            num_tables=16, k=5, delta=0.8, candidate_chunk=128,
            max_hashbits=16, seed=7,
        )
        return build_jaccard_index(data, cfg), data

    def test_structure(self, built):
        index, data = built
        assert index.sorted_hash.shape == (16, 800)
        sh = np.asarray(index.sorted_hash)
        assert np.all(np.diff(sh.astype(np.int64), axis=1) >= 0)

    def test_recall_contract(self, built):
        from clann_tpu.core.jaccard import jaccard_search

        index, data = built
        queries = data.tokens[:60]
        gt_s, gt_i = brute_force_jaccard_topk(data, queries, k=5)
        sims, ids, stats = jaccard_search(index, queries, k=5, delta=0.8)
        # recall vs ground-truth kth similarity threshold
        kth = gt_s[:, 4]
        hits = (sims >= kth[:, None] - 1e-6).sum(axis=1)
        recall = hits.mean() / 5
        # reference contract: observed >= 0.8 * delta
        # (puffinn.rs:216-224 analog)
        assert recall >= 0.8 * 0.8, recall
        assert np.mean(stats.distance_computations) < 800

    def test_self_query(self, built):
        from clann_tpu.core.jaccard import jaccard_search

        index, data = built
        sims, ids, _ = jaccard_search(index, data.tokens[:20], k=1, delta=0.9)
        assert (sims[:, 0] >= 1.0 - 1e-6).mean() >= 0.9

    def test_dense_scan_exact(self, built):
        """jaccard_scan is the exact oracle: identical similarities and
        threshold-equivalent ids (ties may reorder) at every k, including
        a block size that forces the fori_loop path + tail padding."""
        from clann_tpu.core.jaccard import jaccard_scan

        index, data = built
        queries = data.tokens[40:72]
        for k in (1, 5):
            gt_s, gt_i = brute_force_jaccard_topk(data, queries, k=k)
            sims, ids, stats = jaccard_scan(index, queries, k=k, block=128)
            np.testing.assert_allclose(sims, gt_s, rtol=0, atol=1e-6)
            # every returned id must be at least as similar as gt kth
            assert np.all(sims >= gt_s[:, -1:] - 1e-6)
            assert np.all(ids >= 0)
            assert int(stats.distance_computations[0]) == data.num_points()

    def test_blocked_hashing_identical(self, built):
        """_map_point_blocks (the large-n OOM guard for the (n, T, F)
        MinHash rank tensor) is bit-identical to one-shot hashing,
        including the padded tail block."""
        from clann_tpu.core.jaccard import _map_point_blocks
        from clann_tpu.ops.minhash import MinHash

        index, data = built
        import jax.numpy as jnp

        fam = MinHash(data.universe)
        params = fam.sample(jax.random.PRNGKey(3), 40)
        tokens = jnp.asarray(data.tokens[:333])
        one_shot = fam.hash(params, tokens)
        blocked = _map_point_blocks(
            lambda tk: fam.hash(params, tk), tokens, 40,
            budget_bytes=40 * data.tokens.shape[1] * 4 * 64,  # 64-row blocks
        )
        np.testing.assert_array_equal(
            np.asarray(one_shot), np.asarray(blocked)
        )

    def test_dense_scan_k_exceeds_n(self, built):
        from clann_tpu.core.jaccard import jaccard_scan

        index, data = built
        sims, ids, _ = jaccard_scan(index, data.tokens[:4], k=1000)
        assert sims.shape == (4, 1000)
        assert np.all(ids[:, data.num_points():] == -1)


class TestClosestPairs:
    def test_matches_brute_force_join(self, small_angular_dataset):
        from clann_tpu.core.index import build_lsh_index
        from clann_tpu.ops.join import closest_pairs, global_bf_join

        ds = small_angular_dataset
        x = ds.train[:600]
        cfg = Config(
            num_tables=12, k=10, hash_family="simhash",
            candidate_chunk=128, seed=3,
        )
        index = build_lsh_index(x, cfg)
        pairs, sims = closest_pairs(index, k=10, delta=0.8)
        bf_pairs, bf_sims = global_bf_join(index, k=10)
        # recall of true top-10 pairs
        found = {tuple(p) for p in pairs.tolist()}
        truth = {tuple(p) for p in bf_pairs.tolist()}
        recall = len(found & truth) / 10
        assert recall >= 0.6, (recall, sims[:3], bf_sims[:3])
        # returned sims are correct for the returned pairs
        xn = x / np.linalg.norm(x, axis=1, keepdims=True)
        for (i, j), s in zip(pairs.tolist(), sims.tolist()):
            if i >= 0:
                true_s = (np.dot(xn[i], xn[j]) + 1) / 2
                assert abs(true_s - s) < 1e-4

    def test_pairs_canonical_and_unique(self, small_angular_dataset):
        from clann_tpu.core.index import build_lsh_index
        from clann_tpu.ops.join import closest_pairs

        ds = small_angular_dataset
        cfg = Config(num_tables=8, k=10, hash_family="simhash", seed=4)
        index = build_lsh_index(ds.train[:400], cfg)
        pairs, sims = closest_pairs(index, k=20, delta=0.8)
        seen = set()
        for i, j in pairs.tolist():
            if i < 0:
                continue
            assert i < j
            assert (i, j) not in seen
            seen.add((i, j))
        assert np.all(np.diff(sims) <= 1e-6)


class TestDedupTopkPairs:
    def test_large_ids_no_overflow(self):
        # the packed lo*n+hi int64 key silently truncated to int32 under
        # x64=off and corrupted pairs beyond n ~ 46k; the 2-key sort form
        # must rank and dedup exactly at any id magnitude
        import jax.numpy as jnp

        from clann_tpu.ops.join import dedup_topk_pairs

        lo = jnp.asarray([70_000, 70_000, 1_000_000, 5, 70_000], jnp.int32)
        hi = jnp.asarray([90_000, 90_000, 2_000_000, 9, 90_001], jnp.int32)
        sims = jnp.asarray([0.9, 0.9, 0.8, 0.7, 0.6], jnp.float32)
        top_s, pairs = dedup_topk_pairs(sims, lo, hi, k=4)
        assert pairs.tolist() == [
            [70_000, 90_000],
            [1_000_000, 2_000_000],
            [5, 9],
            [70_000, 90_001],
        ]
        assert np.allclose(top_s, [0.9, 0.8, 0.7, 0.6])

    def test_underfull_masks_missing(self):
        import jax.numpy as jnp

        from clann_tpu.ops.join import dedup_topk_pairs

        lo = jnp.asarray([1, 1], jnp.int32)
        hi = jnp.asarray([2, 2], jnp.int32)
        sims = jnp.asarray([0.5, 0.5], jnp.float32)
        top_s, pairs = dedup_topk_pairs(sims, lo, hi, k=2)
        assert pairs.tolist() == [[1, 2], [-1, -1]]


class TestClusteredJaccard:
    """CLANN composition over the set metric (beyond the reference, which
    wires only cosine into its clustered layer — SURVEY §2.2). 1 - J is a
    true metric, so the ball filter must be EXACT: identical results to
    the flat index, strictly less work on clusterable data."""

    @pytest.fixture(scope="class")
    def pair(self):
        from clann_tpu.core.jaccard import build_jaccard_index
        from clann_tpu.data.synthetic import clustered_sets

        universe = 2000
        # hub tokens put MinHash in the long-tail-collision regime the
        # reference's clustering exists to cut (src/lib.rs:3-4): every set
        # shares 10 stop-word tokens, so cross-mode candidates collide in
        # the tables yet can never be true neighbors
        sets = clustered_sets(
            1000, universe, avg_size=20, n_modes=16, core_share=0.95,
            pool_factor=1.1, hub_tokens=10, seed=11,
        )
        data = JaccardData(sets, universe)
        cfg = Config(
            num_tables=16, num_clusters_factor=1.5, k=5, delta=0.8,
            candidate_chunk=32, max_hashbits=16, seed=13,
        )
        flat = build_jaccard_index(data, cfg)
        clus = build_jaccard_index(data, cfg, clustered=True)
        return data, flat, clus

    def test_geometry(self, pair):
        data, _, clus = pair
        C = clus.center_ids.shape[0]
        assert C == int(1.5 * np.sqrt(1000))
        r = np.asarray(clus.radii)
        assert np.all((r >= 0) & (r <= 1.0 + 1e-6))
        a = np.asarray(clus.assignment)
        assert a.shape == (1000,) and a.max() < C
        # every point lies inside its assigned ball
        from clann_tpu.data.setdata import jaccard_similarity_block

        centers = np.asarray(clus.tokens)[np.asarray(clus.center_ids)]
        for i in range(0, 1000, 97):
            d = 1.0 - float(
                np.asarray(
                    jaccard_similarity_block(
                        np.asarray(clus.tokens)[i : i + 1], centers[a[i] : a[i] + 1]
                    )
                )[0, 0]
            )
            assert d <= r[a[i]] + 1e-6

    def test_exact_vs_flat(self, pair):
        from clann_tpu.core.jaccard import jaccard_search

        data, flat, clus = pair
        queries = data.tokens[:48]
        s_f, i_f, st_f = jaccard_search(flat, queries, k=5, delta=0.8)
        s_c, i_c, st_c = jaccard_search(clus, queries, k=5, delta=0.8)
        # the ball filter only drops provably non-improving candidates:
        # returned similarity profiles must be identical
        np.testing.assert_allclose(s_c, s_f, atol=1e-6)
        # and the work must not grow (dc counts sketch+ball passers)
        assert (
            np.asarray(st_c.distance_computations).sum()
            <= np.asarray(st_f.distance_computations).sum()
        )
        # clusters_visited reports the feasible-ball certificate; on this
        # mode-separated data only a handful of balls stay feasible
        C = clus.center_ids.shape[0]
        assert np.asarray(st_c.clusters_visited).mean() < 0.25 * C

    def test_balls_prune_when_sketches_off(self, pair):
        # with the 1-bit sketch filter disabled (FilterType::None parity),
        # the ball filter is the only dc protection against hub-token
        # collisions — it must cut scored candidates substantially while
        # returning identical results
        from clann_tpu.core.jaccard import jaccard_search

        data, flat, clus = pair
        queries = data.tokens[:48]
        s_f, _, st_f = jaccard_search(
            flat, queries, k=5, delta=0.8, filter_type="none"
        )
        s_c, _, st_c = jaccard_search(
            clus, queries, k=5, delta=0.8, filter_type="none"
        )
        np.testing.assert_allclose(s_c, s_f, atol=1e-6)
        dc_f = np.asarray(st_f.distance_computations).mean()
        dc_c = np.asarray(st_c.distance_computations).mean()
        assert dc_c < 0.67 * dc_f, (dc_f, dc_c)

    def test_recall_contract(self, pair):
        from clann_tpu.core.jaccard import jaccard_search
        from clann_tpu.data.setdata import brute_force_jaccard_topk

        data, _, clus = pair
        queries = data.tokens[:48]
        gt_s, _ = brute_force_jaccard_topk(data, queries, k=5)
        sims, _, _ = jaccard_search(clus, queries, k=5, delta=0.8)
        kth = gt_s[:, 4]
        recall = (sims >= kth[:, None] - 1e-6).sum(axis=1).mean() / 5
        assert recall >= 0.8 * 0.8, recall


class TestJaccardPersistence:
    """Own-format H5 round trip for the set index (the upstream wrapper
    serializes Jaccard indexes too, python_wrapper.cpp:570-572); the file
    is self-contained (tokens are the index's own storage)."""

    def test_roundtrip_flat_and_clustered(self, tmp_path):
        from clann_tpu.core.jaccard import (
            build_jaccard_index, jaccard_search,
        )
        from clann_tpu.data.synthetic import clustered_sets
        from clann_tpu.io.h5 import load_jaccard_index, save_jaccard_index

        sets = clustered_sets(300, 800, avg_size=12, n_modes=8, seed=4)
        data = JaccardData(sets, 800)
        cfg = Config(num_tables=8, k=3, delta=0.8, candidate_chunk=32,
                     max_hashbits=16, dataset_name="sets")
        for clustered in (False, True):
            idx = build_jaccard_index(data, cfg, clustered=clustered)
            p = save_jaccard_index(idx, str(tmp_path / f"j{clustered}.h5"))
            idx2 = load_jaccard_index(p)
            assert idx2.universe == 800
            assert idx2.table_hash == "minhash"
            s1, i1, _ = jaccard_search(idx, sets[:20], k=3, delta=0.8)
            s2, i2, _ = jaccard_search(idx2, sets[:20], k=3, delta=0.8)
            np.testing.assert_array_equal(i1, i2)
            np.testing.assert_allclose(s1, s2)

    def test_roundtrip_1bit_tables(self, tmp_path):
        from clann_tpu.core.jaccard import (
            build_jaccard_index, jaccard_search,
        )
        from clann_tpu.data.synthetic import clustered_sets
        from clann_tpu.io.h5 import load_jaccard_index, save_jaccard_index

        sets = clustered_sets(200, 400, avg_size=10, n_modes=6, seed=2)
        data = JaccardData(sets, 400)
        cfg = Config(num_tables=8, k=3, delta=0.8, candidate_chunk=32,
                     max_hashbits=12, dataset_name="sets1b")
        idx = build_jaccard_index(data, cfg, table_hash="1bit_minhash")
        p = save_jaccard_index(idx, str(tmp_path))
        idx2 = load_jaccard_index(p)
        assert idx2.table_hash == "1bit_minhash"
        s1, i1, _ = jaccard_search(idx, sets[:10], k=3, delta=0.8)
        s2, i2, _ = jaccard_search(idx2, sets[:10], k=3, delta=0.8)
        np.testing.assert_array_equal(i1, i2)

    def test_missing_file(self):
        from clann_tpu.errors import SerializeError
        from clann_tpu.io.h5 import load_jaccard_index

        with pytest.raises(SerializeError):
            load_jaccard_index("/nonexistent/x.h5")
