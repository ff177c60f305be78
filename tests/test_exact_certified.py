"""Certified exact scan (VERDICT r4 #7) — exactness contracts.

The certified path (ops/distances._certified_scan_impl +
ops/ivf.scan_search(exact=True, exact_certify=True)) must return results
EQUAL to the direct lax.top_k exact path in every case: clean
certificates, forced fallbacks (a huge eps makes every near-tie trip the
count), and underfull corpora (n < k routes through the fallback).
"""

import jax.numpy as jnp
import numpy as np

from clann_tpu.config import Config
from clann_tpu.core.index import build_index
from clann_tpu.ops.distances import _certified_scan_jit, l2_normalize
from clann_tpu.ops.ivf import scan_search


def _data(n=3000, d=24, q=64, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    t = rng.standard_normal((q, d)).astype(np.float32)
    t /= np.linalg.norm(t, axis=1, keepdims=True)
    return x, t


def _build(x):
    cfg = Config(num_tables=4, num_clusters_factor=0.4, k=10, delta=0.9,
                 hash_family="simhash", seed=0)
    return build_index(x, cfg)


class TestCertifiedScan:
    def test_counts_and_equality(self):
        x, t = _data()
        xn = l2_normalize(jnp.asarray(x))
        tn = l2_normalize(jnp.asarray(t))
        ts, ti, cts = _certified_scan_jit(
            xn, tn, k=10, block_points=1024, recall_target=0.95,
            eps=1e-5,
        )
        # soundness: counted set always contains the winner set
        assert int(jnp.min(cts)) >= 10
        from clann_tpu.ops.distances import _dense_scan_jit

        es, ei = _dense_scan_jit(xn, tn, k=10, block_points=1024,
                                 recall_target=0.95, exact=True)
        ok = np.asarray(cts) == 10
        # certified rows must equal the direct exact answer in MEMBERSHIP;
        # scores may differ at float level (the certified path returns the
        # HIGHEST-precision rescore, the direct path the scan-precision
        # dot — measured gap ~2e-7)
        np.testing.assert_array_equal(np.asarray(ti)[ok], np.asarray(ei)[ok])
        np.testing.assert_allclose(np.asarray(ts)[ok], np.asarray(es)[ok],
                                   rtol=0, atol=1e-6)

    def test_scan_search_equals_direct(self):
        x, t = _data(seed=3)
        index = _build(x)
        d_c, i_c, st_c = scan_search(index, t, k=10, exact=True,
                                     exact_certify=True)
        d_d, i_d, _ = scan_search(index, t, k=10, exact=True,
                                  exact_certify=False)
        np.testing.assert_array_equal(i_c, i_d)
        np.testing.assert_allclose(d_c, d_d, rtol=0, atol=1e-6)
        assert st_c.uncertified.sum() <= len(t)  # recorded, bounded

    def test_forced_fallback_equals_direct(self):
        """A huge eps trips every certificate -> all queries re-run the
        direct sort; results must still be identical."""
        x, t = _data(seed=5)
        index = _build(x)
        d_c, i_c, st_c = scan_search(index, t, k=10, exact=True,
                                     exact_certify=True, exact_eps=1.0)
        d_d, i_d, _ = scan_search(index, t, k=10, exact=True,
                                  exact_certify=False)
        np.testing.assert_array_equal(i_c, i_d)
        np.testing.assert_array_equal(d_c, d_d)
        assert st_c.uncertified.sum() == len(t)

    def test_underfull_corpus_via_api(self):
        """k > n: the facade clamps (ops-layer scan_search requires
        k <= n for BOTH exact algorithms — unchanged, pre-existing)."""
        import clann_tpu

        x, t = _data(n=6, q=4, seed=7)
        cfg = Config(num_tables=4, num_clusters_factor=0.4, k=10,
                     delta=0.9, hash_family="simhash", seed=0,
                     dataset_name="underfull")
        h = clann_tpu.init_with_config(x, cfg)
        clann_tpu.build(h)
        d, i, _ = h.search_batch(t)
        assert i.shape == (4, 10)
        assert (i[:, 6:] == -1).all() or np.isinf(d[:, 6:]).all()
