"""Capacity planner (parallel/capacity.py): analytic bytes vs real builds."""

import numpy as np

from clann_tpu.config import Config
from clann_tpu.core.index import build_index
from clann_tpu.data.synthetic import clustered_unit_vectors
from clann_tpu.parallel.capacity import HBM_V5E, plan_capacity


class TestPlanCapacity:
    def test_tracks_actual_memory(self):
        n, d = 20000, 32
        cfg = Config(num_tables=8, num_clusters_factor=0.4, k=10, seed=1)
        plan = plan_capacity(n, d, cfg)
        index = build_index(clustered_unit_vectors(n, d, seed=1), cfg)
        actual = index.memory_usage()
        # the plan models the dominant structures; require the right
        # magnitude and a conservative (not under-) estimate within 2x
        assert 0.8 * actual <= plan.total_bytes <= 2.0 * actual, (
            plan.total_bytes, actual,
        )

    def test_glove_scale_fits_one_chip(self):
        plan = plan_capacity(1_183_514, 100, Config(num_tables=50, k=10))
        assert plan.fits_single_chip
        assert plan.min_devices == 1

    def test_hundred_million_needs_a_pod_slice(self):
        cfg = Config(num_tables=50, k=10)
        plan = plan_capacity(100_000_000, 96, cfg)
        assert not plan.fits_single_chip
        # 100M x 96 with 50 tables: tables+records alone are ~2.4TB/16B a
        # slot — needs tens of chips; recommendation is a power of two
        assert plan.min_devices > 8
        assert plan.recommended_devices >= plan.min_devices
        assert plan.recommended_devices & (plan.recommended_devices - 1) == 0

    def test_monotone_in_n(self):
        cfg = Config(num_tables=50, k=10)
        sizes = [1_000_000, 10_000_000, 100_000_000]
        devs = [plan_capacity(s, 100, cfg).min_devices for s in sizes]
        assert devs == sorted(devs)

    def test_headroom_reserves_capacity(self):
        cfg = Config(num_tables=50, k=10)
        tight = plan_capacity(30_000_000, 100, cfg, headroom=0.0)
        safe = plan_capacity(30_000_000, 100, cfg, headroom=0.4)
        assert safe.min_devices >= tight.min_devices
