"""Tests for the fused Pallas scan kernel (interpret mode on CPU).

The kernel-vs-reference equivalence strategy mirrors the reference's
SIMD-vs-scalar tests (math_test.hpp:12-51): the fused kernel's candidate
set must reproduce brute-force top-k up to the binned-approximation
semantics, and returned values must be exact.
"""

import numpy as np
import pytest

from clann_tpu.data.synthetic import clustered_unit_vectors, random_unit_vectors
from clann_tpu.metrics.recall import recall_by_ids
from clann_tpu.ops.distances import brute_force_topk
from clann_tpu.ops.pallas.scan_topk import pallas_scan_topk


class TestFusedScan:
    def test_matches_brute_force(self):
        base = clustered_unit_vectors(3000, 32, n_modes=16, seed=0)
        queries = random_unit_vectors(64, 32, seed=1)
        gt_d, gt_i = brute_force_topk(base, queries, k=10, metric="angular")
        sims, ids = pallas_scan_topk(
            base, queries, k=10, num_bins=32, block_n=512, q_tile=64,
            interpret=True,
        )
        r = recall_by_ids(np.asarray(gt_i), ids, count=10)
        assert r >= 0.9, r
        # returned values are exact for returned ids
        bn = base / np.linalg.norm(base, axis=1, keepdims=True)
        qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
        for q in range(0, 64, 13):
            for j in range(10):
                if ids[q, j] >= 0:
                    true = float(bn[ids[q, j]] @ qn[q])
                    assert abs(true - sims[q, j]) < 1e-4

    def test_descending_and_unique(self):
        base = random_unit_vectors(1500, 16, seed=3)
        queries = random_unit_vectors(32, 16, seed=4)
        sims, ids = pallas_scan_topk(
            base, queries, k=8, num_bins=16, block_n=512, q_tile=32,
            interpret=True,
        )
        assert np.all(np.diff(sims, axis=1) <= 1e-6)
        for row in ids:
            real = [i for i in row.tolist() if i >= 0]
            assert len(set(real)) == len(real)

    def test_padding_never_returned(self):
        # n not a multiple of block_n: padded points must not appear
        base = random_unit_vectors(700, 16, seed=5)
        queries = random_unit_vectors(16, 16, seed=6)
        sims, ids = pallas_scan_topk(
            base, queries, k=5, num_bins=16, block_n=512, q_tile=16,
            interpret=True,
        )
        assert ids.max() < 700
        assert ids.min() >= 0

    def test_k_bounded_by_bins(self):
        base = random_unit_vectors(600, 16, seed=7)
        with pytest.raises(ValueError):
            pallas_scan_topk(base, base[:4], k=20, num_bins=16, interpret=True)


class TestPackedKernel:
    """Packed single-pass kernel + one-jit e2e wrapper (interpret mode)."""

    def _data(self, n=2048, d=24, q=32, seed=3):
        rng = np.random.default_rng(seed)
        base = rng.normal(size=(n, d)).astype(np.float32)
        base /= np.linalg.norm(base, axis=1, keepdims=True)
        qs = rng.normal(size=(q, d)).astype(np.float32)
        qs /= np.linalg.norm(qs, axis=1, keepdims=True)
        return base, qs

    def test_packed_matches_original_candidates(self):
        import jax.numpy as jnp

        from clann_tpu.ops.pallas.scan_topk import (
            fused_scan_candidates,
            fused_scan_candidates_packed,
        )

        base, qs = self._data()
        n_real = base.shape[0] - 17  # exercise padded-row masking
        base[n_real:] = 0.0
        dpad, bn, qt, nb = 128, 512, 32, 32
        bp = np.zeros((base.shape[0], dpad), np.float32)
        bp[:, : base.shape[1]] = base
        qp = np.zeros((qs.shape[0], dpad), np.float32)
        qp[:, : qs.shape[1]] = qs
        kw = dict(n_real=n_real, num_bins=nb, block_n=bn, q_tile=qt,
                  interpret=True)
        v0, i0 = fused_scan_candidates(
            jnp.asarray(bp, jnp.bfloat16), jnp.asarray(qp, jnp.bfloat16), **kw
        )
        v1, i1 = fused_scan_candidates_packed(
            jnp.asarray(bp, jnp.bfloat16), jnp.asarray(qp, jnp.bfloat16), **kw
        )
        i0, i1 = np.asarray(i0), np.asarray(i1)
        # same candidate sets up to score-quantization ties (2^-16)
        overlap = np.mean(
            [len(set(i0[q]) & set(i1[q])) / nb for q in range(len(qs))]
        )
        assert overlap > 0.97, overlap
        assert i1.max() < n_real and (i1 >= 0).all()

    def test_e2e_matches_brute_force(self):
        import jax.numpy as jnp

        from clann_tpu.ops.distances import brute_force_topk
        from clann_tpu.ops.pallas.scan_topk import fused_scan_topk_e2e

        base, qs = self._data(n=1500, d=24, q=48)
        bn = 512
        n_pad = ((base.shape[0] + bn - 1) // bn) * bn
        bp = np.zeros((n_pad, 128), np.float32)
        bp[: base.shape[0], : base.shape[1]] = base
        s, i = fused_scan_topk_e2e(
            jnp.asarray(bp, jnp.bfloat16),
            jnp.asarray(base),
            jnp.asarray(qs),
            n_real=base.shape[0], k=5, rescore_m=16,
            num_bins=32, block_n=bn, q_tile=16, interpret=True,
        )
        s, i = np.asarray(s), np.asarray(i)
        gt_d, gt_i = brute_force_topk(base, qs, k=5, metric="angular")
        # returned sims are exact f32; membership matches brute force for
        # nearly every query at these shapes
        match = np.mean([len(set(i[q]) & set(np.asarray(gt_i)[q])) / 5
                         for q in range(len(qs))])
        assert match > 0.9, match
        assert np.all(np.diff(s, axis=1) <= 1e-6)

    @pytest.mark.parametrize("group_r,acc_bf16", [(2, False), (4, False),
                                                  (1, True), (4, True)])
    def test_e2e_group_reduce_and_bf16_acc(self, group_r, acc_bf16):
        """group_r pre-reduction + bf16 accumulation keep result quality.

        The winner's identity is group-granular inside the kernel; the
        exact rescore over all group_r rows of each winning group must
        recover the true best rows, so brute-force membership and exact
        returned values must hold exactly as at group_r=1.
        """
        import jax.numpy as jnp

        from clann_tpu.ops.distances import brute_force_topk
        from clann_tpu.ops.pallas.scan_topk import fused_scan_topk_e2e

        base, qs = self._data(n=1500, d=24, q=48, seed=11)
        bn = 512
        n_pad = ((base.shape[0] + bn - 1) // bn) * bn
        bp = np.zeros((n_pad, 128), np.float32)
        bp[: base.shape[0], : base.shape[1]] = base
        s, i = fused_scan_topk_e2e(
            jnp.asarray(bp, jnp.bfloat16),
            jnp.asarray(base),
            jnp.asarray(qs),
            n_real=base.shape[0], k=5, rescore_m=16,
            num_bins=32, block_n=bn, q_tile=16,
            group_r=group_r, acc_bf16=acc_bf16, interpret=True,
        )
        s, i = np.asarray(s), np.asarray(i)
        gt_d, gt_i = brute_force_topk(base, qs, k=5, metric="angular")
        match = np.mean([len(set(i[q]) & set(np.asarray(gt_i)[q])) / 5
                         for q in range(len(qs))])
        assert match > 0.88, match
        assert np.all(np.diff(s, axis=1) <= 1e-6)
        # returned values exact (the rescore is f32 regardless of acc)
        bnrm = base / np.linalg.norm(base, axis=1, keepdims=True)
        qn = qs / np.linalg.norm(qs, axis=1, keepdims=True)
        for q in range(0, 48, 11):
            for j in range(5):
                if i[q, j] >= 0:
                    assert abs(float(bnrm[i[q, j]] @ qn[q]) - s[q, j]) < 1e-4

    def test_packed_group_ids_are_group_starts(self):
        import jax.numpy as jnp

        from clann_tpu.ops.pallas.scan_topk import (
            fused_scan_candidates_packed,
        )

        base, qs = self._data(n=1024, d=24, q=32, seed=9)
        dpad, bn, qt, nb, gr = 128, 512, 32, 32, 4
        bp = np.zeros((base.shape[0], dpad), np.float32)
        bp[:, : base.shape[1]] = base
        qp = np.zeros((qs.shape[0], dpad), np.float32)
        qp[:, : qs.shape[1]] = qs
        v, i = fused_scan_candidates_packed(
            jnp.asarray(bp, jnp.bfloat16), jnp.asarray(qp, jnp.bfloat16),
            n_real=base.shape[0], num_bins=nb, block_n=bn, q_tile=qt,
            group_r=gr, interpret=True,
        )
        i = np.asarray(i)
        assert (i >= 0).all() and i.max() < base.shape[0]
        assert (i % gr == 0).all(), "group ids must be group-aligned"
        # every query's true top-1 row lives inside some returned group
        sims = (base / np.linalg.norm(base, axis=1, keepdims=True)) @ (
            qs / np.linalg.norm(qs, axis=1, keepdims=True)
        ).T
        top1 = sims.argmax(axis=0)
        hit = np.mean([
            (top1[q] // gr) * gr in set(i[q].tolist()) for q in range(len(qs))
        ])
        assert hit > 0.95, hit


class TestAutoRoute:
    """Small shapes route off the kernel (VERDICT r2 #4): below the
    measured crossover, use_pallas falls back to the plain fused scan
    unless the caller pins pallas_auto_route=False."""

    def _tiny_index(self):
        from clann_tpu.config import Config
        from clann_tpu.core.index import build_index
        from clann_tpu.data.synthetic import clustered_unit_vectors

        train = clustered_unit_vectors(2000, 16, n_modes=8, seed=0)
        cfg = Config(
            num_tables=2, num_clusters_factor=0.01, k=5, delta=0.9,
            dataset_name="route", dense_layout=False, seed=0,
        )
        return train, build_index(train, cfg)

    def test_small_shape_takes_scan_path(self, monkeypatch):
        import clann_tpu.ops.pallas.scan_topk as scan_topk
        from clann_tpu.data.synthetic import random_unit_vectors
        from clann_tpu.ops.ivf import scan_search

        train, index = self._tiny_index()
        q = random_unit_vectors(16, 16, seed=1)

        def boom(*a, **k):
            raise AssertionError("kernel must not run below the crossover")

        monkeypatch.setattr(scan_topk, "fused_scan_topk_e2e", boom)
        d, i, _ = scan_search(index, q, k=5, use_pallas=True)
        assert i.shape == (16, 5)  # routed to the plain scan, still correct
        gt = np.argsort(
            1.0 - (train / np.linalg.norm(train, axis=1, keepdims=True))
            @ (q / np.linalg.norm(q, axis=1, keepdims=True)).T,
            axis=0,
        )[:1].T
        hit = np.mean([gt[r, 0] in i[r] for r in range(16)])
        assert hit >= 0.99

    def test_pinned_kernel_still_runs(self):
        from clann_tpu.data.synthetic import random_unit_vectors
        from clann_tpu.ops.ivf import scan_search

        _, index = self._tiny_index()
        q = random_unit_vectors(8, 16, seed=2)
        d, i, _ = scan_search(
            index, q, k=5, use_pallas=True, pallas_auto_route=False
        )
        assert i.shape == (8, 5)

    def test_viable_threshold(self):
        from clann_tpu.ops.ivf import PALLAS_SCAN_MIN_N, pallas_scan_viable

        assert not pallas_scan_viable(20_000)
        assert pallas_scan_viable(PALLAS_SCAN_MIN_N)
        assert pallas_scan_viable(1_183_514)


class TestPlanVMEMModel:
    """Pin pallas_scan_plan's VMEM model (round 4, MARCO_SHARD).

    The budget counts the f32 score tile once and the streamed bf16 base
    tile TWICE (Mosaic double-buffers grid-step inputs). These expected
    plans are the measured-working configs from BENCH (1.18M x 100),
    the 10M capacity run, NYTIMES_SHAPE (290k x 256), GLOVE25 (d=25),
    and the round-4 MARCO shard (1.56M x 768) — a plan drift here means
    re-measuring before shipping.
    """

    MEASURED_PLANS = {
        (1_183_514, 100): (32768, 64, 32, 512),
        (10_000_000, 100): (65536, 64, 32, 256),
        (1_562_500, 768): (16384, 64, 32, 256),
        (1_183_514, 25): (32768, 64, 32, 512),
        (290_000, 256): (32768, 256, 32, 512),
        (20_000, 25): (32768, 2048, 32, 512),
    }

    def test_measured_plans_reproduced(self):
        from clann_tpu.ops.ivf import pallas_scan_plan

        for (n, d), expect in self.MEASURED_PLANS.items():
            assert pallas_scan_plan(n, 10, d) == expect, (n, d)

    def test_budget_respected_everywhere(self):
        """score + 2*base must fit the 120MB budget at every shape."""
        from clann_tpu.ops.ivf import pallas_scan_plan

        for n in (4096, 50_000, 300_000, 1_500_000, 8_000_000, 40_000_000):
            for d in (16, 100, 256, 768, 1536, 4096, 8192):
                block_n, num_bins, m, q_tile = pallas_scan_plan(n, 10, d)
                dpad = ((d + 1 + 127) // 128) * 128
                vmem = block_n * (q_tile * 4 + 2 * dpad * 2)
                assert vmem <= 120 * 1024 * 1024, (n, d, vmem)
                assert num_bins <= block_n
