"""End-to-end recall contract for every (hash family x hash source) combo.

Mirrors the reference's backbone test (collection_test.hpp:87-242): for
each combination, insert random vectors, run queries, and require
num_correct >= 0.8 * recall * k * samples against the brute-force oracle.
The unit statistics of each family/source live in test_hashing.py; this
file proves the combinations work END TO END through build + adaptive
delta-recall search (both engines where built).
"""

import numpy as np
import pytest

from clann_tpu.config import Config
from clann_tpu.core.index import build_lsh_index
from clann_tpu.data.synthetic import random_unit_vectors
from clann_tpu.ops.query import search

N, D, Q, K, DELTA, L = 700, 16, 32, 5, 0.8, 12

FAMILIES = ["simhash", "cross_polytope", "fht_cross_polytope"]
SOURCES = ["independent", "pool", "tensor"]


@pytest.fixture(scope="module")
def data():
    x = np.asarray(random_unit_vectors(N, D, seed=0))
    q = np.asarray(random_unit_vectors(Q, D, seed=1))
    sims = q @ x.T
    kth = np.sort(sims, axis=1)[:, ::-1][:, K - 1]
    return x, q, sims, kth


@pytest.mark.parametrize("family", FAMILIES)
@pytest.mark.parametrize("source", SOURCES)
def test_recall_contract(data, family, source):
    x, q, sims, kth = data
    cfg = Config(
        num_tables=L, k=K, delta=DELTA, hash_family=family,
        hash_source=source, candidate_chunk=64, seed=3,
        brute_force_threshold=8,
        # keep the MC tabulation cheap for CP families on the test CPU
        estimation_repetitions=200,
    )
    index = build_lsh_index(x, cfg)
    d, ids, stats = search(index, q, k=K, delta=DELTA)
    correct = 0
    for qi in range(Q):
        correct += sum(
            sims[qi, r] >= kth[qi] - 1e-6 for r in ids[qi] if r >= 0
        )
    # reference contract (collection_test.hpp:87-176)
    assert correct >= 0.8 * DELTA * K * Q, (
        family, source, correct / (K * Q),
    )
    assert int(np.asarray(stats.distance_computations).sum()) > 0


@pytest.mark.parametrize("engine", ["clustered", "global"])
def test_recall_contract_int8_rescore(data, engine):
    # int8 ranking overestimates the k-th similarity by quantization
    # noise; without the q8_margin correction that inflated kth
    # irreversibly pruned feasible balls/candidates
    from clann_tpu.ops.global_query import global_search

    x, q, sims, kth = data
    cfg = Config(
        num_tables=L, k=K, delta=DELTA, hash_family="simhash",
        candidate_chunk=64, seed=3, brute_force_threshold=8,
        rescore_dtype="int8", lsh_engine=engine,
    )
    index = build_lsh_index(x, cfg)
    if engine == "global":
        d, ids, _ = global_search(index, q, k=K, delta=DELTA)
    else:
        d, ids, _ = search(index, q, k=K, delta=DELTA)
    correct = sum(
        sims[qi, r] >= kth[qi] - 1e-6
        for qi in range(Q) for r in ids[qi] if r >= 0
    )
    assert correct >= 0.8 * DELTA * K * Q, correct / (K * Q)


@pytest.mark.parametrize(
    "family,source",
    [("simhash", "pool"), ("fht_cross_polytope", "tensor"),
     ("cross_polytope", "independent")],
)
def test_recall_contract_global_engine(data, family, source):
    # the ball-filtered global engine shares the probs table with the
    # clustered walk; spot-check the correlated-source correction and
    # the pooled restore through it too
    from clann_tpu.ops.global_query import global_search

    x, q, sims, kth = data
    cfg = Config(
        num_tables=L, k=K, delta=DELTA, hash_family=family,
        hash_source=source, candidate_chunk=64, seed=3,
        brute_force_threshold=8, estimation_repetitions=200,
        lsh_engine="global",
    )
    index = build_lsh_index(x, cfg)
    d, ids, stats = global_search(index, q, k=K, delta=DELTA)
    correct = 0
    for qi in range(Q):
        correct += sum(
            sims[qi, r] >= kth[qi] - 1e-6 for r in ids[qi] if r >= 0
        )
    assert correct >= 0.8 * DELTA * K * Q, (
        family, source, correct / (K * Q),
    )
