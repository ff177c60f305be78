"""Multi-chip sharded search tests on the virtual 8-device CPU mesh.

The reference has no distributed backend (SURVEY.md §2.5); these tests
validate the TPU-native replacement: cluster-sharded shard_map search with
all_gather top-k merge, equivalence to single-device search, and the
dryrun_multichip driver entry.
"""

import numpy as np
import pytest

from clann_tpu.config import Config
from clann_tpu.core.index import build_index
from clann_tpu.data.synthetic import clustered_unit_vectors, random_unit_vectors
from clann_tpu.metrics.recall import recall_by_ids
from clann_tpu.ops.query import search
from clann_tpu.parallel.mesh import make_mesh
from clann_tpu.parallel.sharded import (
    partition_clusters,
    shard_index,
    sharded_search,
)


@pytest.fixture(scope="module")
def setup():
    cfg = Config(
        num_tables=8,
        num_clusters_factor=0.5,
        k=5,
        delta=0.9,
        hash_family="simhash",
        candidate_chunk=128,
        brute_force_threshold=20,
        seed=4,
    )
    train = clustered_unit_vectors(2000, 16, n_modes=24, seed=2)
    index = build_index(train, cfg)
    queries = random_unit_vectors(24, 16, seed=3)
    return cfg, train, index, queries


class TestPartition:
    def test_balanced(self):
        sizes = np.array([100, 90, 10, 10, 10, 10, 50, 50])
        groups = partition_clusters(sizes, 4)
        loads = sorted(int(sizes[g].sum()) for g in groups)
        assert sum(loads) == sizes.sum()
        assert loads[-1] - loads[0] <= 100  # max piece bounds imbalance

    def test_all_clusters_assigned(self):
        sizes = np.arange(1, 14)
        groups = partition_clusters(sizes, 4)
        got = sorted(int(c) for g in groups for c in g)
        assert got == list(range(13))

    def test_lpt_spread_invariant_random(self):
        """The greedy packer's exact guarantee (assert_balanced doc):
        max_load - min_load <= max cluster size, for any input."""
        rng = np.random.default_rng(7)
        for m in (2, 4, 8, 16):
            for _ in range(20):
                sizes = rng.integers(1, 500, size=rng.integers(1, 60))
                groups = partition_clusters(sizes, m)
                loads = np.array(
                    [int(sizes[g].sum()) if len(g) else 0 for g in groups]
                )
                assert loads.max() - loads.min() <= sizes.max()

    def test_assert_balanced_on_real_shard(self, setup):
        from clann_tpu.parallel.sharded import assert_balanced

        _, _, index, _ = setup
        sharded = shard_index(index, 4)
        sizes = np.diff(np.asarray(index.cluster_starts))
        bound = assert_balanced(sharded, sizes)
        assert bound == int(sizes.max())


class TestShardedSearch:
    def test_shard_structure(self, setup):
        _, train, index, _ = setup
        sharded = shard_index(index, 4)
        assert sharded.n_devices == 4
        gids = np.asarray(sharded.global_ids)
        real = gids[gids >= 0]
        # every point on exactly one device
        assert len(real) == train.shape[0]
        assert len(np.unique(real)) == train.shape[0]

    def test_matches_unsharded_recall(self, setup):
        cfg, train, index, queries = setup
        from clann_tpu.ops.distances import brute_force_topk

        gt_d, gt_i = brute_force_topk(train, queries, k=5, metric="angular")
        d1, i1, s1 = search(index, queries, k=5)
        sharded = shard_index(index, 4)
        mesh = make_mesh(4)
        d2, i2, s2 = sharded_search(sharded, queries, k=5, mesh=mesh)
        r1 = recall_by_ids(np.asarray(gt_i), i1, count=5)
        r2 = recall_by_ids(np.asarray(gt_i), i2, count=5)
        # weaker per-device ball-bound pruning can only help recall
        assert r2 >= r1 - 0.05
        assert r2 >= 0.7
        # results sorted, ids valid & unique
        assert np.all(np.diff(d2, axis=1) >= -1e-5)
        for row in i2:
            real = [i for i in row.tolist() if i >= 0]
            assert len(set(real)) == len(real)

    def test_eight_devices(self, setup):
        _, train, index, queries = setup
        sharded = shard_index(index, 8)
        mesh = make_mesh(8)
        d, ids, stats = sharded_search(sharded, queries, mesh=mesh)
        assert d.shape == (24, 5)
        assert int(np.asarray(stats.distance_computations).sum()) > 0


class TestDryrun:
    def test_graft_entry_dryrun(self):
        import sys, os

        sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
        import __graft_entry__

        __graft_entry__.dryrun_multichip(8)


class TestShardedScan:
    def test_matches_oracle(self, setup):
        from clann_tpu.parallel.sharded import sharded_scan_search
        from clann_tpu.ops.distances import brute_force_topk

        cfg, train, index, queries = setup
        sharded = shard_index(index, 8)
        mesh = make_mesh(8)
        dists, ids, stats = sharded_scan_search(
            sharded, queries, k=5, exact=True, mesh=mesh
        )
        gt_d, gt_i = brute_force_topk(train, queries, k=5, metric="angular")
        np.testing.assert_allclose(dists, np.asarray(gt_d), atol=1e-3)
        r = recall_by_ids(np.asarray(gt_i), ids, count=5)
        assert r >= 0.99, r

    def test_approx_recall(self, setup):
        from clann_tpu.parallel.sharded import sharded_scan_search
        from clann_tpu.ops.distances import brute_force_topk

        cfg, train, index, queries = setup
        sharded = shard_index(index, 4)
        mesh = make_mesh(4)
        dists, ids, _ = sharded_scan_search(
            sharded, queries, k=5, recall_target=0.95, mesh=mesh
        )
        gt_d, gt_i = brute_force_topk(train, queries, k=5, metric="angular")
        r = recall_by_ids(np.asarray(gt_i), ids, count=5)
        assert r >= 0.85, r

    def test_pallas_kernel_over_mesh(self, setup):
        from clann_tpu.ops.distances import brute_force_topk
        from clann_tpu.parallel.sharded import sharded_scan_search

        cfg, train, index, queries = setup
        sharded = shard_index(index, 4)
        mesh = make_mesh(4)
        dists, ids, _ = sharded_scan_search(
            sharded, queries, k=5, use_pallas=True, mesh=mesh
        )
        gt_d, gt_i = brute_force_topk(train, queries, k=5, metric="angular")
        r = recall_by_ids(np.asarray(gt_i), ids, count=5)
        assert r >= 0.85, r
        assert np.all(np.diff(dists, axis=1) >= -1e-5)


class TestShardedGlobal:
    """Point-sharded ball-filtered global LSH over the mesh."""

    @pytest.fixture(scope="class")
    def gsetup(self):
        cfg = Config(
            num_tables=8, num_clusters_factor=0.5, k=5, delta=0.9,
            hash_family="simhash", candidate_chunk=128,
            brute_force_threshold=20, seed=4, lsh_engine="both",
        )
        train = clustered_unit_vectors(2000, 16, n_modes=24, seed=2)
        index = build_index(train, cfg)
        queries = random_unit_vectors(24, 16, seed=3)
        return cfg, train, index, queries

    def test_matches_single_chip_recall(self, gsetup):
        from clann_tpu.ops.distances import brute_force_topk
        from clann_tpu.ops.global_query import global_search
        from clann_tpu.parallel.sharded import sharded_global_search

        cfg, train, index, queries = gsetup
        gt_d, gt_i = brute_force_topk(train, queries, k=5, metric="angular")
        d1, i1, _ = global_search(index, queries, k=5, delta=0.9)
        sharded = shard_index(index, 8)
        assert sharded.g_records is not None
        d2, i2, st = sharded_global_search(
            sharded, queries, k=5, mesh=make_mesh(8)
        )
        r1 = recall_by_ids(np.asarray(gt_i), i1, count=5)
        r2 = recall_by_ids(np.asarray(gt_i), i2, count=5)
        # per-shard termination is conservative: sharded recall must not
        # fall below single-chip (minus tie noise)
        assert r2 >= r1 - 0.05, (r1, r2)
        assert i2.max() < 2000
        assert np.all(np.diff(d2, axis=1) >= -1e-5)
        assert int(np.asarray(st.distance_computations).sum()) > 0

    def test_missing_structures_raise(self, setup):
        from clann_tpu.parallel.sharded import sharded_global_search

        cfg, train, _, queries = setup
        # lsh_engine now defaults to "global"; pin the clustered engine so
        # the index genuinely lacks global structures
        index = build_index(train, cfg.replace(lsh_engine="clustered"))
        sharded = shard_index(index, 4)
        with pytest.raises(ValueError):
            sharded_global_search(sharded, queries, mesh=make_mesh(4))


class TestShardedJaccard:
    """Point-sharded set-LSH search (parallel/jaccard.py) vs the flat
    index and the brute-force Jaccard oracle."""

    @pytest.fixture(scope="class")
    def jsetup(self):
        from clann_tpu.core.jaccard import build_jaccard_index
        from clann_tpu.data.setdata import JaccardData

        rng = np.random.default_rng(11)
        universe = 400
        sets = []
        for _ in range(900):
            size = max(2, rng.poisson(10))
            sets.append(
                rng.choice(universe, size=min(size, universe), replace=False)
            )
        data = JaccardData(sets, universe)
        cfg = Config(
            num_tables=12, k=5, delta=0.8, candidate_chunk=128,
            max_hashbits=16, seed=9,
        )
        return build_jaccard_index(data, cfg), data

    def test_matches_flat_and_oracle(self, jsetup):
        from clann_tpu.core.jaccard import jaccard_search
        from clann_tpu.data.setdata import brute_force_jaccard_topk
        from clann_tpu.parallel.jaccard import (
            shard_jaccard_index,
            sharded_jaccard_search,
        )

        index, data = jsetup
        sh = shard_jaccard_index(index, 8)
        assert sh.tokens.shape[0] == 8
        # every real point appears exactly once across shards
        gids = np.asarray(sh.global_ids)
        real = gids[gids >= 0]
        assert sorted(real.tolist()) == list(range(900))

        queries = data.tokens[:40]
        s_sh, i_sh, st = sharded_jaccard_search(sh, queries, k=5, delta=0.8)
        assert s_sh.shape == (40, 5)
        assert np.all(np.diff(s_sh, axis=1) <= 1e-6)
        assert i_sh.max() < 900
        # per-shard termination uses the local kth (never larger than the
        # global kth), so the sharded run works at least as hard: its
        # recall vs the oracle kth threshold must meet the same contract
        gt_s, _ = brute_force_jaccard_topk(data, queries, k=5)
        kth = gt_s[:, 4]
        recall = (s_sh >= kth[:, None] - 1e-6).sum(axis=1).mean() / 5
        assert recall >= 0.8 * 0.8, recall
        # and should be >= the flat engine's recall up to tie noise
        s_fl, _, _ = jaccard_search(index, queries, k=5, delta=0.8)
        r_flat = (s_fl >= kth[:, None] - 1e-6).sum(axis=1).mean() / 5
        assert recall >= r_flat - 0.05
        assert int(np.asarray(st.distance_computations).sum()) > 0

    def test_self_query(self, jsetup):
        from clann_tpu.parallel.jaccard import (
            shard_jaccard_index,
            sharded_jaccard_search,
        )

        index, data = jsetup
        sh = shard_jaccard_index(index, 8)
        sims, ids, _ = sharded_jaccard_search(sh, data.tokens[:16], k=1,
                                              delta=0.9)
        found = (ids[:, 0] == np.arange(16)).mean()
        assert found >= 0.85

    def test_direct_sharded_build_identical(self, jsetup):
        # build_jaccard_sharded must produce byte-identical shards to
        # shard_jaccard_index(build_jaccard_index(...)): same seed ->
        # same functions -> same per-shard hashes and sorts
        from clann_tpu.parallel.jaccard import (
            build_jaccard_sharded,
            shard_jaccard_index,
        )
        from clann_tpu.parallel.mesh import make_mesh

        index, data = jsetup
        via_flat = shard_jaccard_index(index, 8)
        direct = build_jaccard_sharded(
            data, data.universe, index.config, mesh=make_mesh(8)
        )
        for f in ("tokens", "set_sizes", "sorted_hash", "sorted_idx",
                  "sketches", "global_ids", "probs_table",
                  "sketch_p1_table"):
            np.testing.assert_array_equal(
                np.asarray(getattr(via_flat, f)),
                np.asarray(getattr(direct, f)),
                err_msg=f,
            )
        assert direct.table_hash == "minhash"

    def test_direct_sharded_build_blocked_hashing_identical(self, jsetup):
        # a tiny hash budget forces the lax.map blocked-hashing path
        # (the large-shard OOM guard); results must be bit-identical to
        # the single-shot build
        from clann_tpu.parallel.jaccard import build_jaccard_sharded
        from clann_tpu.parallel.mesh import make_mesh

        index, data = jsetup
        one_shot = build_jaccard_sharded(
            data, data.universe, index.config, mesh=make_mesh(8)
        )
        blocked = build_jaccard_sharded(
            data, data.universe, index.config, mesh=make_mesh(8),
            hash_budget_bytes=1 << 16,
        )
        for f in ("sorted_hash", "sorted_idx", "sketches"):
            np.testing.assert_array_equal(
                np.asarray(getattr(one_shot, f)),
                np.asarray(getattr(blocked, f)),
                err_msg=f,
            )

    def test_direct_sharded_build_search(self, jsetup):
        from clann_tpu.data.setdata import brute_force_jaccard_topk
        from clann_tpu.parallel.jaccard import (
            build_jaccard_sharded,
            sharded_jaccard_search,
        )

        index, data = jsetup
        direct = build_jaccard_sharded(data, data.universe, index.config)
        queries = data.tokens[:24]
        sims, ids, _ = sharded_jaccard_search(direct, queries, k=5,
                                              delta=0.8)
        gt_s, _ = brute_force_jaccard_topk(data, queries, k=5)
        recall = (sims >= gt_s[:, 4][:, None] - 1e-6).sum(axis=1).mean() / 5
        assert recall >= 0.8 * 0.8, recall


class TestShardedClosestPairs:
    def test_matches_single_device(self, small_angular_dataset):
        from clann_tpu.core.index import build_lsh_index
        from clann_tpu.ops.join import closest_pairs
        from clann_tpu.parallel.join import sharded_closest_pairs

        ds = small_angular_dataset
        x = ds.train[:600]
        # L=12 not divisible by 8 devices -> exercises table padding
        cfg = Config(
            num_tables=12, k=10, hash_family="simhash",
            candidate_chunk=128, seed=3,
        )
        index = build_lsh_index(x, cfg)
        pairs_1, sims_1 = closest_pairs(index, k=10, delta=0.8)
        mesh = make_mesh(8)
        pairs_s, sims_s = sharded_closest_pairs(
            index, k=10, delta=0.8, mesh=mesh
        )
        # window for window the candidate set is identical; so are the
        # deduped winners
        np.testing.assert_allclose(sims_s, sims_1, rtol=0, atol=1e-6)
        assert pairs_s.tolist() == pairs_1.tolist()

    def test_oracle_recall(self, small_angular_dataset):
        from clann_tpu.core.index import build_lsh_index
        from clann_tpu.ops.join import global_bf_join
        from clann_tpu.parallel.join import sharded_closest_pairs

        ds = small_angular_dataset
        x = ds.train[:400]
        cfg = Config(num_tables=16, k=10, hash_family="simhash", seed=5)
        index = build_lsh_index(x, cfg)
        pairs, sims = sharded_closest_pairs(
            index, k=10, delta=0.8, mesh=make_mesh(8)
        )
        bf_pairs, _ = global_bf_join(index, k=10)
        found = {tuple(p) for p in pairs.tolist()}
        truth = {tuple(p) for p in bf_pairs.tolist()}
        assert len(found & truth) / 10 >= 0.6
        # canonical ordering + uniqueness
        seen = set()
        for i, j in pairs.tolist():
            if i >= 0:
                assert i < j and (i, j) not in seen
                seen.add((i, j))


class TestQueryClusterMesh2D:
    def test_matches_1d_cluster_mesh(self, setup):
        from clann_tpu.parallel.mesh import make_mesh_2d

        _, train, index, queries = setup
        sharded = shard_index(index, 4)
        d1, i1, st1 = sharded_search(sharded, queries, mesh=make_mesh(4))
        # same 4 cluster shards, queries additionally split 2-way;
        # len(queries)=24 is not divisible by... it is (24%2==0); use 23
        # to exercise the pad-and-slice path too
        mesh2d = make_mesh_2d(2, 4)
        d2, i2, st2 = sharded_search(sharded, queries[:23], mesh=mesh2d)
        assert d2.shape == (23, 5)
        np.testing.assert_array_equal(i2, i1[:23])
        np.testing.assert_allclose(d2, d1[:23], atol=1e-6)
        np.testing.assert_array_equal(
            np.asarray(st2.distance_computations),
            np.asarray(st1.distance_computations)[:23],
        )

    def test_global_engine_2d(self, setup):
        from clann_tpu.parallel.mesh import make_mesh_2d
        from clann_tpu.parallel.sharded import sharded_global_search

        cfg, train, index, queries = setup
        if index.g_records is None:
            import dataclasses

            from clann_tpu.core.index import build_index

            index = build_index(
                train, dataclasses.replace(cfg, lsh_engine="both")
            )
        sharded = shard_index(index, 4)
        d1, i1, _ = sharded_global_search(sharded, queries, mesh=make_mesh(4))
        d2, i2, _ = sharded_global_search(
            sharded, queries, mesh=make_mesh_2d(2, 4)
        )
        np.testing.assert_array_equal(i2, i1)
        np.testing.assert_allclose(d2, d1, atol=1e-6)

    def test_mesh_validation(self, setup):
        from clann_tpu.parallel.mesh import make_mesh_2d

        _, _, index, queries = setup
        sharded = shard_index(index, 4)
        with pytest.raises(ValueError, match="cluster shards"):
            sharded_search(sharded, queries, mesh=make_mesh(8))
