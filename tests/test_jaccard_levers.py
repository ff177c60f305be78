"""A/B equivalence tests for the Jaccard engine's round-5 levers.

The blocked-record loop (core/jaccard._jaccard_loop_pieces) ports the
cosine global engine's three measured levers (stream maps, blocked
gathers, dead-block routing — VERDICT r4 #2). These tests pin the
bit-identity contracts:

  - mapped (stream_block_map fast path) == unmapped (blocked_window
    fallback) — the same contract tests/test_stream_map.py pins for the
    cosine engine;
  - packed g_records == in-trace derivation (the shard_map/legacy path);
  - dead_block_routing on == off.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from clann_tpu.config import Config
from clann_tpu.core.jaccard import (
    _pack_jaccard_records,
    build_jaccard_index,
    jaccard_search,
    jaccard_search_batch,
    jaccard_search_batch_mapped,
)
from clann_tpu.data.setdata import JaccardData, pad_sets


def _dataset(n=300, universe=512, seed=0):
    rng = np.random.default_rng(seed)
    sets = [
        rng.choice(universe, size=rng.integers(4, 24), replace=False)
        for _ in range(n)
    ]
    return JaccardData(sets, universe)


def _queries(index, nq=16, seed=1):
    from clann_tpu.core.jaccard import (
        IndependentHashSource,
        jaccard_sketch_family,
        jaccard_table_family,
    )
    from clann_tpu.ops.sketches import pack_bits_u32

    rng = np.random.default_rng(seed)
    sets = [
        rng.choice(index.universe, size=rng.integers(4, 24), replace=False)
        for _ in range(nq)
    ]
    qt = jnp.asarray(pad_sets(sets, index.universe))
    cfg = index.config
    family = jaccard_table_family(index.table_hash, index.universe)
    source = IndependentHashSource(family, cfg.num_tables, cfg.max_hashbits)
    source.params = index.hash_params
    qh = source.hash(qt)
    sketch_family = jaccard_sketch_family(index.sketch_hash, index.universe)
    qbits = sketch_family.hash(index.sketch_params, qt)
    qsk = pack_bits_u32(
        qbits.reshape(qt.shape[0], cfg.num_sketches, cfg.sketch_bits)
    )
    return qt, qh, qsk


@pytest.fixture(scope="module", params=[False, True], ids=["flat", "balls"])
def built(request):
    cfg = Config(num_tables=8, max_hashbits=12, k=5, delta=0.8,
                 candidate_chunk=64, filter_expand=4, gather_block=8,
                 seed=3)
    data = _dataset()
    index = build_jaccard_index(data, cfg, clustered=request.param)
    return index


def _run(index, qt, qh, qsk, **kw):
    cfg = index.config
    args = dict(k=5, chunk=cfg.candidate_chunk, min_depth=cfg.min_depth,
                filter_expand=cfg.filter_expand)
    args.update(kw)
    return jaccard_search_batch(
        index, qt, qh, qsk, jnp.float32(0.8), **args
    )


class TestLeverEquivalence:
    def test_mapped_equals_unmapped(self, built):
        qt, qh, qsk = _queries(built)
        s0, i0, st0 = _run(built, qt, qh, qsk)
        s1, i1, st1 = jaccard_search_batch_mapped(
            built, qt, qh, qsk, 0.8, k=5,
            chunk=built.config.candidate_chunk,
            min_depth=built.config.min_depth,
            filter_expand=built.config.filter_expand,
        )
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
        np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
        np.testing.assert_array_equal(
            np.asarray(st0.distance_computations),
            np.asarray(st1.distance_computations),
        )

    def test_packed_records_equal_in_trace(self, built):
        qt, qh, qsk = _queries(built)
        s0, i0, st0 = _run(built, qt, qh, qsk)
        legacy = built.replace(g_records=None)
        s1, i1, st1 = _run(legacy, qt, qh, qsk)
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
        np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
        np.testing.assert_array_equal(
            np.asarray(st0.candidates), np.asarray(st1.candidates)
        )

    def test_dead_block_routing_bit_identical(self, built):
        qt, qh, qsk = _queries(built)
        s0, i0, _ = _run(built, qt, qh, qsk)
        routed_off = built.replace(
            config=built.config.replace(dead_block_routing=False)
        )
        s1, i1, _ = _run(routed_off, qt, qh, qsk)
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
        np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))

    def test_pack_respects_gather_block_padding(self, built):
        rec = _pack_jaccard_records(
            built.sorted_idx, built.sketches,
            built.assignment, pad_to=8,
        )
        assert rec.shape[1] % 8 == 0
        # record layout: [id, sketch words..., cluster]
        assert rec.shape[2] == 2 + built.sketches.shape[2]

    def test_filter_none_scores_streamed(self, built):
        qt, qh, qsk = _queries(built)
        _, _, st_def = _run(built, qt, qh, qsk)
        _, _, st_all = _run(built, qt, qh, qsk, filter_type="none")
        # FilterType::None rescoring >= default (sketch filter off)
        assert (
            np.asarray(st_all.distance_computations).sum()
            >= np.asarray(st_def.distance_computations).sum()
        )

    def test_host_wrapper_recall_contract(self, built):
        """jaccard_search end-to-end against brute force."""
        from clann_tpu.core.jaccard import jaccard_scan

        rng = np.random.default_rng(7)
        sets = [
            rng.choice(built.universe, size=rng.integers(4, 24),
                       replace=False)
            for _ in range(12)
        ]
        sims, ids, _ = jaccard_search(built, sets, k=5, delta=0.8)
        ex_s, ex_i, _ = jaccard_scan(built, sets, k=5)
        # delta-recall: per returned slot, found sims close to exact kth
        # contract — at least delta fraction of exact top-k recovered
        hits = 0
        for a, b in zip(ids, ex_i):
            hits += len(set(a.tolist()) & set(b.tolist()))
        assert hits / ex_i.size >= 0.6  # 0.8-contract with slack
