"""Block-probed fused scan (ops/pallas/block_scan.py).

The TPU-shaped synthesis of the reference's clustered pruning
(index.rs:311-439) and its dense SIMD scan (math.hpp): probe at the scan
kernel's own block granularity so pruning never introduces gathers.
Runs in Pallas interpret mode on the CPU test mesh.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from clann_tpu.config import Config
from clann_tpu.core.index import build_index
from clann_tpu.data.synthetic import clustered_unit_vectors
from clann_tpu.ops.distances import brute_force_topk, l2_normalize
from clann_tpu.ops.gmm import greedy_minimum_maximum
from clann_tpu.ops.pallas.block_scan import (
    auto_block_probe,
    block_scan_search,
    block_scan_topk_e2e,
    build_block_layout,
)


@pytest.fixture(scope="module")
def small_world():
    data = np.asarray(
        l2_normalize(
            jnp.asarray(clustered_unit_vectors(8192, 32, n_modes=16, seed=0))
        )
    )
    q = clustered_unit_vectors(200, 32, n_modes=16, seed=1)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    _, assign, _ = greedy_minimum_maximum(jnp.asarray(data), 40)
    layout = build_block_layout(data, np.asarray(assign), 512)
    _, gt_ids = brute_force_topk(data, qn, 10)
    return data, qn, layout, np.asarray(gt_ids)


def _recall(ids, gt):
    return np.mean(
        [len(set(a) & set(b)) / gt.shape[1] for a, b in zip(ids, gt)]
    )


class TestLayout:
    def test_geometry(self, small_world):
        data, _, lay, _ = small_world
        assert lay.n_blocks == 16
        gids = np.asarray(lay.gids)
        assert sorted(gids[gids >= 0].tolist()) == list(range(8192))
        # every member is inside its block's centroid ball
        xb = np.asarray(lay.base_f32).reshape(16, 512, 32)
        dist = np.linalg.norm(
            xb - np.asarray(lay.centroids)[:, None, :], axis=-1
        )
        real = (gids >= 0).reshape(16, 512)
        assert np.all(
            np.where(real, dist, 0.0) <= np.asarray(lay.radii)[:, None] + 1e-5
        )
        # permuted rows match the source vectors
        np.testing.assert_allclose(
            xb.reshape(-1, 32)[gids >= 0], data[gids[gids >= 0]], atol=1e-6
        )

    def test_cluster_major_order(self, small_world):
        data, _, lay, _ = small_world
        # gids follow a stable argsort of the assignment: block slices
        # hold contiguous cluster runs
        gids = np.asarray(lay.gids)
        assert lay.block_rows.sum() == 8192


class TestSearch:
    def test_recall_scales_with_probes(self, small_world):
        _, qn, lay, gt = small_world
        recalls = []
        for B in (2, 8, 16):
            _, ids, dc, _ = block_scan_topk_e2e(
                lay, jnp.asarray(qn), k=10, n_probe=B, rescore_m=64,
                num_bins=128, block_n=512, q_tile=64, interpret=True,
            )
            recalls.append(_recall(np.asarray(ids), gt))
            assert np.all(np.asarray(dc) == B * 512)
        assert recalls[0] < recalls[-1]
        assert recalls[1] >= 0.9  # per-query probing (voting lost ~0.2)
        assert recalls[2] >= 0.95

    def test_full_probe_matches_plain_scan_contract(self, small_world):
        """B = n_blocks == approx full scan; sims are exact for found ids."""
        data, qn, lay, gt = small_world
        sims, ids, dc, unc = block_scan_topk_e2e(
            lay, jnp.asarray(qn), k=10, n_probe=16, rescore_m=64,
            num_bins=128, block_n=512, q_tile=64, interpret=True,
        )
        sims, ids = np.asarray(sims), np.asarray(ids)
        # full probing certifies: no unprobed block can hide a neighbor
        assert np.all(np.asarray(unc) == 0)
        # returned values are EXACT dots of the returned ids
        ex = np.einsum("qd,qkd->qk", qn, data[np.clip(ids, 0, None)])
        np.testing.assert_allclose(sims, ex, atol=1e-4)
        # descending order
        assert np.all(np.diff(sims, axis=1) <= 1e-6)

    def test_certificate_semantics(self, small_world):
        """uncertified == 0 implies the result equals the exact top-k."""
        data, qn, lay, gt = small_world
        sims, ids, _, unc = block_scan_topk_e2e(
            lay, jnp.asarray(qn), k=10, n_probe=8, rescore_m=64,
            num_bins=512, block_n=512, q_tile=64, interpret=True,
        )
        ids, unc = np.asarray(ids), np.asarray(unc)
        certified = np.where(unc == 0)[0]
        # with per_bin=1 (num_bins == block_n) there is no binning loss,
        # so certified queries must be exactly right
        for qi in certified:
            assert set(ids[qi]) == set(gt[qi]), qi

    def test_index_level_entry(self, small_world):
        data = clustered_unit_vectors(4096, 32, n_modes=16, seed=3)
        q = clustered_unit_vectors(32, 32, n_modes=16, seed=4)
        cfg = Config(num_tables=4, k=10, num_clusters_factor=0.5,
                     dataset_name="bs")
        idx = build_index(data, cfg)
        dists, ids, stats = block_scan_search(idx, q, k=10)
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        _, bi = brute_force_topk(np.asarray(idx.vectors), qn, 10)
        assert _recall(ids, np.asarray(bi)) >= 0.95
        assert dists.shape == (32, 10)
        assert np.all(np.diff(dists, axis=1) >= -1e-6)

    def test_api_mode(self):
        import clann_tpu

        data = clustered_unit_vectors(4096, 16, n_modes=8, seed=5)
        q = clustered_unit_vectors(16, 16, n_modes=8, seed=6)
        cfg = Config(num_tables=4, k=5, dataset_name="bsm")
        h = clann_tpu.init_with_config(data, cfg)
        clann_tpu.build(h)
        dists, ids, stats = h.search_batch(q, k=5, mode="scan-block")
        assert ids.shape == (16, 5)
        assert stats.distance_computations.shape == (16,)
        d2, i2, st2 = h.search_batch(q, k=5, mode="scan-block-adaptive")
        assert i2.shape == (16, 5)
        assert np.all((st2.uncertified == 0) | (st2.clusters_visited >= 1))

    def test_single_query_and_overshoot(self, small_world):
        data = clustered_unit_vectors(2048, 16, n_modes=8, seed=7)
        cfg = Config(num_tables=4, k=5, dataset_name="bs1")
        idx = build_index(data, cfg)
        d, i, _ = block_scan_search(idx, data[3], k=5)
        assert i[0, 0] == 3 and d[0, 0] < 1e-5
        d2, i2, _ = block_scan_search(idx, data[:4], k=5, n_probe=10**6)
        assert i2.shape == (4, 5)


def test_auto_block_probe():
    assert auto_block_probe(1) == 1
    assert 2 <= auto_block_probe(37) <= 37
    assert auto_block_probe(400) == 100


class TestAdaptive:
    @pytest.fixture(scope="class")
    def built(self):
        data = clustered_unit_vectors(6000, 32, n_modes=12, seed=3)
        cfg = Config(num_tables=4, num_clusters_factor=0.5, k=10, seed=3)
        return data, build_index(data, cfg)

    def test_certified_or_full(self, built):
        from clann_tpu.ops.pallas.block_scan import (
            block_scan_search_adaptive,
            get_block_layout,
        )

        data, index = built
        q = clustered_unit_vectors(64, 32, n_modes=12, seed=4)
        # block_n=512 -> 12 blocks (the auto plan uses one block at this n)
        d, i, st = block_scan_search_adaptive(
            index, q, k=10, n_probe0=2, block_n=512
        )
        nb = get_block_layout(index, 512).n_blocks
        assert nb == 12
        # every query either block-certified or escalated to all blocks
        assert np.all((st.uncertified == 0) | (st.clusters_visited == nb))
        # escalated queries paid extra rounds (dc superset accumulation)
        esc = st.clusters_visited > 2
        if esc.any() and (~esc).any():
            assert (
                st.distance_computations[esc].min()
                > st.distance_computations[~esc].min()
            )
        # certified coverage translates into high exact recall
        gt_d, gt_i = brute_force_topk(data, q, 10)
        r = _recall(np.asarray(i).tolist(), np.asarray(gt_i))
        assert r >= 0.9, r

    def test_easy_queries_stop_early(self, built):
        from clann_tpu.ops.pallas.block_scan import block_scan_search_adaptive

        data, index = built
        # self-queries on strongly clustered data certify at small budgets:
        # a point's own block contains it at sim 1.0
        d, i, st = block_scan_search_adaptive(
            index, data[:32], k=1, n_probe0=2, block_n=512
        )
        assert (st.clusters_visited == 2).mean() >= 0.5
        assert (np.asarray(i)[:, 0] == np.arange(32)).mean() >= 0.9
