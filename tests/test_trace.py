"""Tests for the hierarchical phase tracer (reference performance.hpp
timer-tree analog; off by default like PUFFINN_PERFORMANCE_TIME)."""

import numpy as np

from clann_tpu.metrics.trace import TRACER, Tracer


class TestTracer:
    def test_disabled_is_noop(self):
        t = Tracer(enabled=False)
        with t.span("a"):
            with t.span("b"):
                pass
        assert t.totals == {}

    def test_nested_paths(self):
        t = Tracer(enabled=True)
        with t.span("build"):
            with t.span("gmm"):
                pass
            with t.span("gmm"):
                pass
        assert set(t.totals) == {"build", "build/gmm"}
        assert t.counts["build/gmm"] == 2
        assert t.totals["build"] >= t.totals["build/gmm"]
        rep = t.report()
        assert "gmm" in rep and "x2" in rep
        t.clear()
        assert t.totals == {}

    def test_build_and_search_emit_spans(self):
        from clann_tpu.config import Config
        from clann_tpu.core.index import build_index
        from clann_tpu.data.synthetic import random_unit_vectors
        from clann_tpu.ops.query import search

        TRACER.enabled = True
        TRACER.clear()
        try:
            x = random_unit_vectors(500, 16, seed=0)
            cfg = Config(num_tables=4, num_clusters_factor=0.3, k=5,
                         delta=0.8, dataset_name="t", dense_layout=False)
            idx = build_index(x, cfg)
            search(idx, x[:4], k=5, delta=0.8)
            for key in ("build/gmm", "build/hashing", "build/table_sort",
                        "search/scan"):
                assert key in TRACER.totals, (key, sorted(TRACER.totals))
        finally:
            TRACER.enabled = False
            TRACER.clear()
