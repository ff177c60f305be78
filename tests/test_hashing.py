"""Tests for hash families, sources, sketches, collision probabilities.

Models the reference C++ test strategy (SURVEY.md §4):
- hash-value range/uniformity checks (reference: hash_test.hpp:16-61,
  hash_source_test.hpp:13-45)
- empirical collision rate vs. collision_probability() claim
  (reference: hash_test.hpp:63-100, 2-3% tolerance)
- bits_per_function exact values (reference: hash_test.hpp:146-163)
- sketch pass/reject behaviour (reference: filterer_test.hpp:12-70)
"""

import jax
import numpy as np
import pytest

from clann_tpu.data.synthetic import random_unit_vectors
from clann_tpu.ops.collision import HashSourceProbs, cross_polytope_estimates
from clann_tpu.ops.hashing import (
    CrossPolytope,
    FHTCrossPolytope,
    SimHash,
    ceil_log2,
    hadamard_matrix,
)
from clann_tpu.ops.sketches import SketchFilterer, pack_bits_u32, simhash_p1
from clann_tpu.ops.sources import (
    IndependentHashSource,
    PooledHashSource,
    TensoredHashSource,
    make_hash_source,
)


def angular_sim(a, b):
    """PUFFINN similarity (dot+1)/2 of unit vectors."""
    return (np.dot(a, b) + 1.0) / 2.0


class TestBasics:
    def test_ceil_log2(self):
        # reference: math.hpp:105-113
        assert ceil_log2(1) == 0
        assert ceil_log2(2) == 1
        assert ceil_log2(25) == 5
        assert ceil_log2(128) == 7

    def test_hadamard_orthogonal(self):
        h = hadamard_matrix(4)
        np.testing.assert_allclose(h @ h.T, 16 * np.eye(16), atol=1e-5)

    def test_bits_per_function(self):
        # reference: hash_test.hpp:146-163, crosspolytope.hpp:301-303
        assert SimHash(25).bits_per_function == 1
        assert FHTCrossPolytope(25).bits_per_function == 6  # ceil_log(25)+1
        assert FHTCrossPolytope(128).bits_per_function == 8

    def test_pack_bits(self):
        bits = np.zeros((1, 64), np.uint32)
        bits[0, 0] = 1  # first column = MSB of word 0
        bits[0, 63] = 1  # last column = LSB of word 1
        packed = np.asarray(pack_bits_u32(np.asarray(bits)))
        assert packed.shape == (1, 2)
        assert packed[0, 0] == 1 << 31
        assert packed[0, 1] == 1


class TestHashRanges:
    @pytest.mark.parametrize("family_cls", [SimHash, FHTCrossPolytope, CrossPolytope])
    def test_values_in_range(self, family_cls):
        d = 25
        fam = family_cls(d)
        params = fam.sample(jax.random.PRNGKey(0), 8)
        x = random_unit_vectors(500, d, seed=1)
        h = np.asarray(fam.hash(params, x))
        assert h.shape == (500, 8)
        assert h.max() < (1 << fam.bits_per_function)

    @pytest.mark.parametrize("family_cls", [SimHash, FHTCrossPolytope, CrossPolytope])
    def test_all_bits_used(self, family_cls):
        # reference: hash_source_test.hpp:13-45 — every output bit varies
        d = 32
        fam = family_cls(d)
        params = fam.sample(jax.random.PRNGKey(2), 4)
        x = random_unit_vectors(2000, d, seed=3)
        h = np.asarray(fam.hash(params, x))
        for b in range(fam.bits_per_function):
            bit = (h >> b) & 1
            assert 0 < bit.mean() < 1, f"bit {b} constant"


class TestCollisionProbability:
    def test_simhash_closed_form(self):
        # reference: simhash.hpp:96-102
        fam = SimHash(10)
        assert float(fam.collision_probability(1.0, 1)) == pytest.approx(1.0)
        assert float(fam.collision_probability(0.0, 1)) == pytest.approx(0.0, abs=1e-6)
        assert float(fam.collision_probability(0.5, 1)) == pytest.approx(0.5)
        assert float(fam.collision_probability(0.3, 0)) == 1.0

    def test_simhash_empirical(self):
        # reference: hash_test.hpp:63-100 (2% tolerance -> 3% here, fewer
        # samples to keep CI fast)
        d = 16
        fam = SimHash(d)
        params = fam.sample(jax.random.PRNGKey(5), 400)
        rng = np.random.default_rng(0)
        for target_sim in [0.3, 0.5, 0.8]:
            a = rng.standard_normal(d)
            a /= np.linalg.norm(a)
            # construct b at the target similarity
            r = rng.standard_normal(d)
            r -= (r @ a) * a
            r /= np.linalg.norm(r)
            cos = 2 * target_sim - 1
            b = cos * a + np.sqrt(1 - cos * cos) * r
            x = np.stack([a, b]).astype(np.float32)
            h = np.asarray(fam.hash(params, x))
            emp = (h[0] == h[1]).mean()
            claimed = float(fam.collision_probability(target_sim, 1))
            assert abs(emp - claimed) < 0.08, (target_sim, emp, claimed)

    def test_cp_estimates_shape_and_monotonicity(self):
        table = cross_polytope_estimates(32, num_repetitions=300, eps=2e-2)
        log_dim = 5
        assert table.shape[0] == log_dim + 2
        # more bits -> lower collision probability
        assert np.all(table[0] >= table[-1] - 1e-6)
        # 0 bits always collide
        np.testing.assert_allclose(table[0], 1.0)
        # high similarity -> near-certain collision
        assert table[-1, -1] > 0.9

    def test_cp_empirical_vs_claim(self):
        # reference: hash_test.hpp:63-100 adapted to CP
        d = 32
        fam = FHTCrossPolytope(d, estimation_repetitions=2000, estimation_eps=1e-2)
        params = fam.sample(jax.random.PRNGKey(7), 600)
        rng = np.random.default_rng(1)
        a = rng.standard_normal(d)
        a /= np.linalg.norm(a)
        r = rng.standard_normal(d)
        r -= (r @ a) * a
        r /= np.linalg.norm(r)
        sim = 0.8
        cos = 2 * sim - 1
        b = cos * a + np.sqrt(1 - cos * cos) * r
        h = np.asarray(fam.hash(params, np.stack([a, b]).astype(np.float32)))
        emp = (h[0] == h[1]).mean()
        claimed = float(fam.collision_probability(sim, fam.bits_per_function))
        assert abs(emp - claimed) < 0.05, (emp, claimed)


class TestHashSources:
    @pytest.mark.parametrize("name", ["independent", "pool", "tensor"])
    def test_range_and_bits(self, name):
        d = 25
        fam = SimHash(d)
        src = make_hash_source(name, fam, num_hashers=10, num_bits=12).init(
            jax.random.PRNGKey(1)
        )
        x = random_unit_vectors(3000, d, seed=2)
        h = np.asarray(src.hash(np.asarray(x)))
        assert h.shape == (3000, 10)
        assert h.max() < (1 << 12)
        for b in range(12):
            bit = (h >> b) & 1
            assert 0 < bit.mean() < 1, f"{name}: bit {b} constant"

    def test_pool_params_roundtrip(self):
        # regression: pool_indices must live INSIDE params — restore
        # paths (rebuild_objects, io/h5) round-trip only params, and a
        # fresh source with externally-assigned params used to hash with
        # pool[:, None] (silent garbage: query hashes stopped matching
        # the tables)
        d = 16
        fam = SimHash(d)
        src = make_hash_source("pool", fam, num_hashers=6, num_bits=10).init(
            jax.random.PRNGKey(5)
        )
        assert "pool_indices" in src.params
        x = np.asarray(random_unit_vectors(200, d, seed=6))
        h1 = np.asarray(src.hash(x))
        restored = make_hash_source("pool", fam, num_hashers=6, num_bits=10)
        restored.params = src.params
        np.testing.assert_array_equal(np.asarray(restored.hash(x)), h1)

    def test_pool_size_override(self):
        fam = SimHash(16)
        src = make_hash_source(
            "pool", fam, num_hashers=6, num_bits=10, pool_size=17
        ).init(jax.random.PRNGKey(5))
        assert src.pool_size == 17
        assert src.params["dirs"].shape[0] == 17

    def test_pool_index_query_self_hit(self):
        # end-to-end: a pool-source index must find every indexed point
        # as its own nearest neighbor (this was 0.56 under the params bug)
        from clann_tpu.config import Config
        from clann_tpu.core.index import build_lsh_index
        from clann_tpu.ops.query import search

        x = np.asarray(random_unit_vectors(400, 16, seed=7))
        cfg = Config(num_tables=8, hash_family="simhash",
                     hash_source="pool", k=5, candidate_chunk=64,
                     brute_force_threshold=8)
        idx = build_lsh_index(x, cfg)
        src, _ = idx.rebuild_objects()
        from clann_tpu.core.index import unsort_hashes

        qh = np.asarray(src.hash(idx.vectors))
        bh = np.asarray(unsort_hashes(idx.sorted_hash, idx.sorted_idx)).T
        np.testing.assert_array_equal(qh, bh)
        _, ids, _ = search(idx, x[:16], k=5, delta=0.9)
        assert (ids[:, 0] == np.arange(16)).mean() == 1.0

    def test_independent_with_cp_family(self):
        d = 25
        fam = FHTCrossPolytope(d)
        src = IndependentHashSource(fam, num_hashers=4, num_bits=24).init(
            jax.random.PRNGKey(3)
        )
        # 24 bits / 6 bpf = 4 functions per hasher, 0 bits cut
        assert src.functions_per_hasher == 4
        assert src.bits_to_cut == 0
        x = random_unit_vectors(100, d, seed=4)
        h = np.asarray(src.hash(np.asarray(x)))
        assert h.max() < (1 << 24)

    def test_tensored_effective_table(self):
        # ops/collision.tensored_effective_table: (1-p_eff(d))^L must equal
        # the reference's per-depth tensor core F_d = 1 - A_d*B_d
        # (hash_source/tensor.hpp:127-163), and p_eff >= the raw table's p
        # is NOT required — what matters is failure >= independent model's
        # claim at moderate similarity (the correlated-tables correction)
        from clann_tpu.ops.collision import (
            HashSourceProbs,
            tensored_effective_table,
        )

        fam = SimHash(16)
        probs = HashSourceProbs(fam, 12)
        raw = probs.table.copy()
        L = 12
        eff = tensored_effective_table(raw, L)
        m = int(np.floor(np.sqrt(L)))
        for d in (2, 5, 9):
            for b in (40, 120, 180):
                a_ = 1 - (1 - raw[(d + 1) // 2, b]) ** m
                b_ = 1 - (1 - raw[d // 2, b]) ** m
                f = 1 - a_ * b_
                assert (1 - eff[d, b]) ** L == pytest.approx(f, rel=1e-4)
        # conservative vs the independent model at mid similarity: the
        # claimed failure (1-p)^L must be LARGER with the transform
        mid = 120
        d = 8
        assert (1 - eff[d, mid]) ** L >= (1 - raw[d, mid]) ** L

    def test_failure_probability_shape(self):
        # reference: independent.hpp:108-119
        fam = SimHash(16)
        probs = HashSourceProbs(fam, 24)
        # identical vectors, full depth: P(24 bits)=1 -> failure 0
        f = float(probs.failure_probability(24, 10, 10, 1.0))
        assert f == pytest.approx(0.0, abs=1e-6)
        # orthogonal vectors: P=0 -> failure 1
        f = float(probs.failure_probability(24, 10, 10, 0.5))
        assert 0.0 < f <= 1.0
        # more tables consumed -> lower failure
        f1 = float(probs.failure_probability(8, 2, 50, 0.9))
        f2 = float(probs.failure_probability(8, 40, 50, 0.9))
        assert f2 <= f1


class TestSketches:
    def test_identical_and_opposite(self):
        # reference: filterer_test.hpp:12-70
        d = 16
        f = SketchFilterer(d).init(jax.random.PRNGKey(0))
        a = random_unit_vectors(1, d, seed=0)[0]
        x = np.stack([a, -a]).astype(np.float32)
        sk = np.asarray(f.sketch(np.asarray(x)))
        assert sk.shape == (2, 32, 2)
        same = SketchFilterer.hamming(sk[0], sk[0])
        opp = SketchFilterer.hamming(sk[0], sk[1])
        assert np.all(np.asarray(same) == 0)
        assert np.all(np.asarray(opp) == 64)  # every bit flips

    def test_hamming_tracks_similarity(self):
        d = 24
        f = SketchFilterer(d).init(jax.random.PRNGKey(1))
        rng = np.random.default_rng(2)
        a = rng.standard_normal(d).astype(np.float32)
        a /= np.linalg.norm(a)
        near = a + 0.1 * rng.standard_normal(d).astype(np.float32)
        far = rng.standard_normal(d).astype(np.float32)
        x = np.stack([a, near / np.linalg.norm(near), far / np.linalg.norm(far)])
        sk = np.asarray(f.sketch(np.asarray(x.astype(np.float32))))
        h_near = int(np.asarray(SketchFilterer.hamming(sk[0], sk[1])).mean())
        h_far = int(np.asarray(SketchFilterer.hamming(sk[0], sk[2])).mean())
        assert h_near < h_far

    def test_maxdiff_threshold(self):
        # reference: filterer.hpp:108-111
        f = SketchFilterer(8)
        # kth_sim=1 -> p=1 -> maxdiff 0; kth_sim=0.5 -> p=0.5 -> 32
        assert int(f.max_sketch_diff(simhash_p1, 1.0)) == 0
        assert int(f.max_sketch_diff(simhash_p1, 0.5)) == 32
        assert int(f.max_sketch_diff(simhash_p1, 0.0)) == 64
