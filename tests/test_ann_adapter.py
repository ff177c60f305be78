"""Tests for the ann-benchmarks adapter (clann_tpu/bench/ann_adapter.py).

The harness contract: fit(train) -> set_query_arguments -> query /
batch_query+get_batch_results, memory in kB, done() releases. Recall is
checked against brute force the way the harness computes it (id overlap
with the true top-k at threshold distance)."""

import numpy as np
import pytest

from clann_tpu.bench.ann_adapter import ClannTPU


@pytest.fixture(scope="module")
def fitted():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(3000, 24)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    algo = ClannTPU(metric="angular", num_tables=16,
                    num_clusters_factor=0.5, mode="lsh")
    algo.fit(x)
    return algo, x


class TestAdapter:
    def test_euclidean_rejected(self):
        with pytest.raises(NotImplementedError):
            ClannTPU(metric="euclidean")

    def test_single_query(self, fitted):
        algo, x = fitted
        algo.set_query_arguments(0.9)
        res = algo.query(x[5], 10)
        assert len(res) == 10 and res[0] == 5

    def test_batch_recall(self, fitted):
        algo, x = fitted
        algo.set_query_arguments(0.9)
        q = x[:64]
        algo.batch_query(q, 10)
        results = algo.get_batch_results()
        sims = q @ x.T
        hits = 0
        for qi, ids in enumerate(results):
            kth = np.sort(sims[qi])[::-1][9]
            hits += sum(sims[qi, i] >= kth - 1e-6 for i in ids)
        assert hits / (64 * 10) >= 0.8 * 0.9

    def test_memory_and_done(self, fitted):
        algo, _ = fitted
        assert algo.get_memory_usage() > 0
        assert "clann_tpu" in str(algo)
