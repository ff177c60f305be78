"""Tests for greedy minimum-maximum clustering.

Validates the JAX MXU implementation against a NumPy port of the reference
algorithm (SURVEY.md §7 step 3: "Validate radii/assignment against a NumPy
port of gmm.rs").
"""

import numpy as np
import pytest

from clann_tpu.data.synthetic import clustered_unit_vectors, random_unit_vectors
from clann_tpu.ops.gmm import (
    greedy_minimum_maximum,
    greedy_minimum_maximum_reference,
)


class TestGMM:
    @pytest.mark.parametrize("metric", ["angular", "euclidean"])
    def test_matches_reference_port(self, metric):
        x = clustered_unit_vectors(500, 16, n_modes=8, seed=11)
        c_j, a_j, r_j = greedy_minimum_maximum(x, 12, metric=metric)
        c_n, a_n, r_n = greedy_minimum_maximum_reference(x, 12, metric=metric)
        assert np.array_equal(c_j, c_n)
        assert np.array_equal(a_j, a_n)
        np.testing.assert_allclose(r_j, r_n, atol=1e-5)

    def test_first_center_is_point_zero(self):
        # reference: gmm.rs:33
        x = random_unit_vectors(100, 8, seed=0)
        c, _, _ = greedy_minimum_maximum(x, 5)
        assert c[0] == 0

    def test_degenerate_n_leq_k(self):
        # reference: gmm.rs:26-31
        x = random_unit_vectors(4, 8, seed=0)
        c, a, r = greedy_minimum_maximum(x, 10)
        assert np.array_equal(c, np.arange(4))
        assert np.array_equal(a, np.arange(4))
        assert np.all(r == 0)

    def test_radii_bound_assigned_points(self):
        x = clustered_unit_vectors(800, 10, n_modes=6, seed=3)
        centers, assignment, radii = greedy_minimum_maximum(x, 10)
        xn = x / np.linalg.norm(x, axis=1, keepdims=True)
        d_to_center = np.clip(
            1.0 - np.sum(xn * xn[centers[assignment]], axis=1), 0, 2
        )
        assert np.all(d_to_center <= radii[assignment] + 1e-5)

    def test_centers_are_spread(self):
        # each new center should be the farthest point at selection time;
        # sanity: no duplicate centers on a dataset with >k distinct points
        x = random_unit_vectors(300, 12, seed=5)
        c, _, _ = greedy_minimum_maximum(x, 20)
        assert len(set(c.tolist())) == 20

    def test_assignment_is_nearest_center(self):
        x = clustered_unit_vectors(400, 8, n_modes=5, seed=9)
        centers, assignment, _ = greedy_minimum_maximum(x, 8)
        xn = x / np.linalg.norm(x, axis=1, keepdims=True)
        dmat = np.clip(1.0 - xn @ xn[centers].T, 0, 2)  # (n, k)
        best = dmat.min(axis=1)
        got = dmat[np.arange(len(x)), assignment]
        np.testing.assert_allclose(got, best, atol=1e-5)


class TestShardedGMM:
    """Mesh-sharded GMM (parallel/gmm.py) must be bit-identical to the
    single-device path on the virtual 8-device CPU mesh."""

    @pytest.mark.parametrize("n,k", [(1000, 13), (999, 20), (513, 7)])
    def test_matches_single_device(self, n, k):
        from clann_tpu.ops.gmm import greedy_minimum_maximum
        from clann_tpu.parallel.gmm import sharded_gmm
        from clann_tpu.parallel.mesh import make_mesh

        x = random_unit_vectors(n, 24, seed=n)
        c1, a1, r1 = greedy_minimum_maximum(x, k)
        c2, a2, r2 = sharded_gmm(x, k, mesh=make_mesh(8))
        np.testing.assert_array_equal(c1, c2)
        np.testing.assert_array_equal(a1, a2)
        np.testing.assert_allclose(r1, r2, atol=1e-6)

    def test_degenerate(self):
        from clann_tpu.parallel.gmm import sharded_gmm
        from clann_tpu.parallel.mesh import make_mesh

        x = random_unit_vectors(5, 8, seed=1)
        c, a, r = sharded_gmm(x, 9, mesh=make_mesh(8))
        np.testing.assert_array_equal(c, np.arange(5))
        assert (r == 0).all()

    def test_build_index_with_mesh(self):
        from clann_tpu.config import Config
        from clann_tpu.core.index import build_index
        from clann_tpu.ops.query import search
        from clann_tpu.parallel.mesh import make_mesh

        x = clustered_unit_vectors(600, 16, n_modes=8, seed=3)
        cfg = Config(num_tables=4, num_clusters_factor=0.5, k=5, delta=0.8,
                     dataset_name="t", hash_family="simhash")
        idx = build_index(x, cfg, gmm_mesh=make_mesh(8))
        d, i, _ = search(idx, x[:8], k=5, delta=0.8)
        assert d.shape == (8, 5)
