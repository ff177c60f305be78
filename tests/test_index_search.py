"""End-to-end build + search tests: the recall contract.

Models the reference's statistical recall tests
(reference: src/puffinn_binds/puffinn.rs:179-225 — observed recall >= 0.8 x
expected recall; libpuffinn/test/include/collection_test.hpp:87-176 —
num_correct >= 0.8 * recall * k * samples) plus brute-force equivalence on
tiny datasets (collection_test.hpp:36-85).
"""

import numpy as np
import pytest

from clann_tpu.config import Config
from clann_tpu.core.index import build_index, build_lsh_index
from clann_tpu.metrics.recall import recall_by_ids, recall_values
from clann_tpu.ops.query import search


@pytest.fixture(scope="module")
def ds(small_angular_dataset):
    return small_angular_dataset


class TestSingleClusterIndex:
    """C=1 == plain PUFFINN-equivalent LSH index (the minimum slice)."""

    @pytest.fixture(scope="class")
    def index(self, ds):
        cfg = Config(
            num_tables=20,
            k=10,
            delta=0.9,
            hash_family="simhash",
            candidate_chunk=256,
            seed=3,
        )
        return build_lsh_index(ds.train, cfg)

    def test_structure(self, index, ds):
        n = ds.train.shape[0]
        assert index.n == n
        assert index.n_clusters == 1
        assert index.sorted_hash.shape == (20, n)
        # each table's hashes are sorted
        sh = np.asarray(index.sorted_hash)
        assert np.all(np.diff(sh.astype(np.int64), axis=1) >= 0)
        # every point appears exactly once per table
        si = np.sort(np.asarray(index.sorted_idx), axis=1)
        assert np.array_equal(si, np.tile(np.arange(n), (20, 1)))

    def test_recall_contract(self, index, ds):
        dists, ids, stats = search(index, ds.test, k=10, delta=0.9)
        mean_recall, _, _ = recall_values(ds.distances, dists, count=10)
        # reference contract: observed >= 0.8 * delta (puffinn.rs:216-224)
        assert mean_recall >= 0.8 * 0.9, f"recall {mean_recall}"
        # sanity: LSH did not degenerate to brute force on every query
        assert np.mean(stats.distance_computations) < ds.train.shape[0]

    def test_results_sorted_and_valid(self, index, ds):
        dists, ids, _ = search(index, ds.test[:10], k=10)
        assert np.all(np.diff(dists, axis=1) >= -1e-6)
        assert ids.min() >= 0 and ids.max() < ds.train.shape[0]
        # no duplicate ids per query
        for row in ids:
            assert len(set(row.tolist())) == len(row)

    def test_self_query_finds_self(self, index, ds):
        dists, ids, _ = search(index, ds.train[:20], k=1, delta=0.9)
        found = (ids[:, 0] == np.arange(20)).mean()
        assert found >= 0.9  # delta-recall on the easiest possible query


class TestClusteredIndex:
    @pytest.fixture(scope="class")
    def index(self, ds):
        cfg = Config(
            num_tables=20,
            num_clusters_factor=0.4,
            k=10,
            delta=0.9,
            hash_family="simhash",
            candidate_chunk=256,
            brute_force_threshold=100,
            seed=5,
        )
        return build_index(ds.train, cfg)

    def test_cluster_geometry(self, index, ds):
        n = ds.train.shape[0]
        C = index.n_clusters
        assert C == Config(num_clusters_factor=0.4).num_clusters(n)
        starts = np.asarray(index.cluster_starts)
        assert starts[0] == 0 and starts[-1] == n
        assert np.all(np.diff(starts) >= 0)
        # segments of each table hold exactly the cluster's points
        assignment = np.asarray(index.assignment)
        si = np.asarray(index.sorted_idx)
        for c in [0, C // 2, C - 1]:
            seg = si[0, starts[c] : starts[c + 1]]
            assert set(seg.tolist()) == set(np.where(assignment == c)[0].tolist())

    def test_recall_contract(self, index, ds):
        dists, ids, stats = search(index, ds.test, k=10, delta=0.9)
        mean_recall, _, _ = recall_values(ds.distances, dists, count=10)
        assert mean_recall >= 0.8 * 0.9, f"recall {mean_recall}"
        # ball-bound termination should keep most queries from scanning
        # every cluster
        assert np.mean(stats.clusters_visited) < index.n_clusters

    def test_id_recall(self, index, ds):
        _, ids, _ = search(index, ds.test, k=10, delta=0.9)
        r = recall_by_ids(ds.neighbors, ids, count=10)
        assert r >= 0.6  # id-level recall is stricter than distance recall

    def test_distance_computation_savings(self, index, ds):
        # the point of clustering: fewer distance computations than n per
        # query on a clustered dataset
        _, _, stats = search(index, ds.test, k=10, delta=0.9)
        assert np.mean(stats.distance_computations) < ds.train.shape[0]


class TestBruteForceClusters:
    def test_tiny_dataset_all_brute(self):
        # all clusters below threshold -> pure brute force, recall == 1
        rng = np.random.default_rng(0)
        x = rng.standard_normal((300, 16)).astype(np.float32)
        cfg = Config(
            num_tables=4, num_clusters_factor=0.3, k=5,
            hash_family="simhash", candidate_chunk=128, seed=1,
        )
        index = build_index(x, cfg)
        assert bool(np.all(np.asarray(index.brute)))
        from clann_tpu.ops.distances import brute_force_topk

        gt_d, gt_i = brute_force_topk(x, x[:30], k=5, metric="angular")
        dists, ids, _ = search(index, x[:30], k=5)
        # Not exactly the oracle: the ball-overlap bound uses 1-cos, which
        # is not a metric (no triangle inequality), so the reference's own
        # termination rule can skip a cluster holding a true neighbor
        # (index.rs:342-361). Require near-perfect agreement.
        assert recall_by_ids(np.asarray(gt_i), ids, count=5) >= 0.97
        mismatched = np.abs(dists - np.asarray(gt_d)) > 1e-4
        assert mismatched.mean() <= 0.02

    def test_tiny_dataset_no_termination_is_exact(self):
        # with the ball bound unable to fire (delta irrelevant for brute
        # clusters; termination needs a full queue), k == n gives exact
        # results
        rng = np.random.default_rng(3)
        x = rng.standard_normal((120, 8)).astype(np.float32)
        cfg = Config(
            num_tables=4, num_clusters_factor=0.2, k=120,
            hash_family="simhash", candidate_chunk=64, seed=2,
        )
        index = build_index(x, cfg)
        from clann_tpu.ops.distances import brute_force_topk

        gt_d, _ = brute_force_topk(x, x[:10], k=120, metric="angular")
        dists, ids, _ = search(index, x[:10], k=120)
        np.testing.assert_allclose(dists, np.asarray(gt_d), atol=1e-4)


class TestLazyLevelWindows:
    """Lazy depth-window materialization (config.lsh_level_chunk) must
    preserve the walk's semantics: same recall contract, same candidate
    consumption order, with descent only when the delta check demands it."""

    @pytest.fixture(scope="class")
    def built(self, ds):
        cfg = Config(
            num_tables=12,
            num_clusters_factor=0.4,
            k=10,
            delta=0.9,
            hash_family="simhash",
            candidate_chunk=128,
            seed=4,
        )
        return cfg, build_index(ds.train, cfg)

    @pytest.mark.parametrize("lc,rg", [(2, 1), (1, 1), (3, 4)])
    def test_matches_eager_contract(self, built, ds, lc, rg):
        cfg, index = built
        eager = index.replace(
            config=cfg.replace(lsh_level_chunk=0, lsh_group_ranks=rg)
        )
        lazy = index.replace(
            config=cfg.replace(lsh_level_chunk=lc, lsh_group_ranks=rg)
        )
        d_e, i_e, st_e = search(eager, ds.test, k=10, delta=0.9)
        d_l, i_l, st_l = search(lazy, ds.test, k=10, delta=0.9)
        r_e, _, _ = recall_values(ds.distances, d_e, count=10)
        r_l, _, _ = recall_values(ds.distances, d_l, count=10)
        assert r_l >= 0.8 * 0.9, f"lazy recall {r_l}"
        # window-edge stop points differ slightly from the eager walk's
        # (a window cannot straddle a chunk boundary) but the adaptive
        # behaviour must stay in the same regime
        assert abs(r_l - r_e) < 0.1, (r_l, r_e)
        dc_e = np.mean(st_e.distance_computations)
        dc_l = np.mean(st_l.distance_computations)
        assert dc_l < ds.train.shape[0]
        assert 0.5 * dc_e < dc_l < 2.0 * dc_e + 100, (dc_e, dc_l)
        # no duplicate ids within any result row
        for row in i_l:
            live = row[row >= 0]
            assert len(set(live.tolist())) == len(live)


class TestHashInBlocks:
    def test_blocked_matches_single_shot(self):
        # the block streamer must be transparent: same values as one fn
        # call over the whole array, including a non-multiple tail block
        # (it streams via dynamic_slice to avoid full-dataset copies —
        # the MS-MARCO-shard OOM fix)
        import jax.numpy as jnp

        from clann_tpu.core.index import _hash_in_blocks

        x = np.random.RandomState(0).randn(133, 16).astype(np.float32)
        xd = jnp.asarray(x)

        def fn(b):
            return jnp.concatenate(
                [jnp.sum(b * b, axis=-1, keepdims=True), b[:, :2]], axis=-1
            )

        out_b = np.asarray(_hash_in_blocks(fn, xd, 32))   # 4 blocks + tail 5
        out_1 = np.asarray(fn(xd))
        np.testing.assert_allclose(out_b, out_1, rtol=1e-6)

    def test_real_hash_blocked(self, ds):
        cfg = Config(num_tables=6, num_clusters_factor=0.2, k=5, seed=3,
                     hash_family="simhash")
        i1 = build_index(ds.train[:300], cfg, hash_block=64)
        i2 = build_index(ds.train[:300], cfg, hash_block=100_000)
        np.testing.assert_array_equal(
            np.asarray(i1.sorted_hash), np.asarray(i2.sorted_hash)
        )
        np.testing.assert_array_equal(
            np.asarray(i1.sketches), np.asarray(i2.sketches)
        )
