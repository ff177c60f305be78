"""Fused probe-filter kernel (ops/pallas/probe_filter.py) correctness.

The kernel must be BIT-IDENTICAL to the XLA filter path it replaces in
ops/global_query._loop_pieces: same sketch hamming threshold, same ball
feasibility bit, same lane validity — only the execution strategy differs.
Off-TPU the kernel runs interpreted (same lowering contract as the other
Pallas entry points).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from clann_tpu.config import Config
from clann_tpu.core.index import build_index
from clann_tpu.data.synthetic import make_synthetic_dataset
from clann_tpu.ops.pallas.probe_filter import pack_feasibility, probe_filter


class TestPackFeasibility:
    def test_roundtrip_bits(self, rng):
        for C in (1, 31, 32, 33, 178, 256, 435):
            ok = rng.random((5, C)) < 0.5
            packed = np.asarray(pack_feasibility(jnp.asarray(ok)))
            W32 = -(-C // 32)
            assert packed.shape == (5, W32)
            for q in range(5):
                for c in range(C):
                    bit = (packed[q, c >> 5] >> (c & 31)) & 1
                    assert bool(bit) == bool(ok[q, c]), (q, c)


class TestProbeFilterKernel:
    @pytest.mark.parametrize("C", [7, 178, 300])
    def test_matches_xla_filter(self, rng, C):
        Q, WL = 16, 512
        sk = rng.integers(0, 2**32, size=(Q, WL, 2), dtype=np.uint32)
        qsk = rng.integers(0, 2**32, size=(Q, WL, 2), dtype=np.uint32)
        cluster = rng.integers(0, C, size=(Q, WL)).astype(np.int32)
        valid = (rng.random((Q, WL)) < 0.7).astype(np.uint8)
        ok = rng.random((Q, C)) < 0.6
        maxdiff = rng.integers(0, 65, size=(Q,)).astype(np.int32)

        # oracle: the XLA path's algebra
        ham = (
            np.bitwise_count(sk[..., 0] ^ qsk[..., 0]).astype(np.int32)
            + np.bitwise_count(sk[..., 1] ^ qsk[..., 1]).astype(np.int32)
        )
        feas = np.take_along_axis(ok, cluster, axis=1)
        expect = (valid != 0) & feas & (ham <= maxdiff[:, None])

        got = probe_filter(
            jnp.asarray(sk[..., 0]), jnp.asarray(sk[..., 1]),
            jnp.asarray(qsk[..., 0]), jnp.asarray(qsk[..., 1]),
            jnp.asarray(cluster), jnp.asarray(valid),
            pack_feasibility(jnp.asarray(ok)),
            jnp.asarray(maxdiff)[:, None],
            q_tile=8, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(got) != 0, expect)

    def test_filter_none_threshold_passes_all_hams(self, rng):
        """maxdiff = 2*32*Wd (the filter_type='none' stand-in) must never
        reject: max possible hamming over two 32-bit words is 64."""
        Q, WL = 8, 256
        sk = rng.integers(0, 2**32, size=(Q, WL, 2), dtype=np.uint32)
        cluster = np.zeros((Q, WL), np.int32)
        valid = np.ones((Q, WL), np.uint8)
        ok = np.ones((Q, 1), bool)
        got = probe_filter(
            jnp.asarray(sk[..., 0]), jnp.asarray(sk[..., 1]),
            jnp.asarray(~sk[..., 0]), jnp.asarray(~sk[..., 1]),
            jnp.asarray(cluster), jnp.asarray(valid),
            pack_feasibility(jnp.asarray(ok)),
            jnp.full((Q, 1), 128, jnp.int32),
            q_tile=8, interpret=True,
        )
        assert (np.asarray(got) != 0).all()


class TestEndToEndAB:
    """Kernel on vs off through the full global engine: identical results."""

    @pytest.fixture(scope="class")
    def ds(self):
        return make_synthetic_dataset(
            n=4000, d=32, n_queries=48, k_gt=15, seed=3
        )

    def test_global_search_bit_identical(self, ds):
        from clann_tpu.ops.global_query import global_search

        base = dict(
            num_tables=10, num_clusters_factor=0.4, k=10, delta=0.9,
            dataset_name=ds.name, lsh_engine="global", dense_layout=False,
        )
        idx_off = build_index(ds.train, Config(**base))
        idx_on = idx_off.replace(
            config=Config(**base, probe_filter_kernel=True)
        )
        d0, i0, s0 = global_search(idx_off, ds.test, k=10, delta=0.9)
        d1, i1, s1 = global_search(idx_on, ds.test, k=10, delta=0.9)
        np.testing.assert_array_equal(i0, i1)
        np.testing.assert_array_equal(d0, d1)
        np.testing.assert_array_equal(
            np.asarray(s0.distance_computations),
            np.asarray(s1.distance_computations),
        )

    def test_window_index_dense_bit_identical(self, ds):
        from clann_tpu.ops.global_query import global_search

        base = dict(
            num_tables=10, num_clusters_factor=0.4, k=10, delta=0.9,
            dataset_name=ds.name, lsh_engine="global", dense_layout=False,
        )
        idx_off = build_index(ds.train, Config(**base))
        idx_on = idx_off.replace(
            config=Config(**base, window_index_dense=True)
        )
        d0, i0, _ = global_search(idx_off, ds.test, k=10, delta=0.9)
        d1, i1, _ = global_search(idx_on, ds.test, k=10, delta=0.9)
        np.testing.assert_array_equal(i0, i1)
        np.testing.assert_array_equal(d0, d1)
