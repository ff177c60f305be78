"""Precomputed stream maps (ops/prefixmap.stream_block_map) correctness.

The maps must reproduce blocked_window's (table, block, lane-validity)
mapping bit-for-bit at every stream position — the fast path in
ops/global_query._loop_pieces only changes WHEN the mapping is computed
(once per batch instead of per loop iteration), never its values.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clann_tpu.config import Config
from clann_tpu.core.index import build_index
from clann_tpu.data.synthetic import make_synthetic_dataset
from clann_tpu.ops.prefixmap import blocked_window, stream_block_map


@pytest.fixture(scope="module")
def ds():
    return make_synthetic_dataset(n=4000, d=32, n_queries=48, k_gt=15, seed=3)


@pytest.fixture(scope="module")
def prepared(ds):
    from clann_tpu.ops.global_query import _prepare_streams

    cfg = Config(
        num_tables=10, num_clusters_factor=0.4, k=10, delta=0.9,
        dataset_name=ds.name, lsh_engine="global", dense_layout=False,
        gather_block=8,
    )
    index = build_index(ds.train, cfg)
    source, filterer = index.rebuild_objects()
    qn = jnp.asarray(
        ds.test / np.linalg.norm(ds.test, axis=1, keepdims=True)
    )
    streams = jax.jit(
        lambda i, q, h, s: _prepare_streams(i, q, h, s, min_depth=1)
    )(index, qn, source.hash(qn), filterer.sketch(qn))
    return index, streams


class TestStreamBlockMap:
    def test_matches_blocked_window_everywhere(self, prepared):
        index, streams = prepared
        fc = streams["fc"]
        bstarts, starts_s, sizes_s = (
            streams["bstarts"], streams["starts"], streams["sizes"],
        )
        G = index.config.gather_block
        g = int(np.log2(G))
        L = index.g_sorted_hash.shape[0]
        Q = fc.shape[0]
        WB = 16
        total = np.asarray(streams["total"])
        tb = int(total.max()) + WB + 1  # no clipping anywhere in the test

        smap = np.asarray(jax.jit(
            lambda fc, b, st, sz: stream_block_map(fc, b, st, sz, g, L, tb)
        )(fc, bstarts, starts_s, sizes_s))
        tmap, blkmap = smap[..., 0], smap[..., 1]
        lmask = smap[..., 2].view(np.uint32)

        lane = np.arange(G, dtype=np.uint32)
        for off0 in (0, 1, 3, 7, int(total.min()), int(total.max())):
            off = jnp.full((Q,), off0, jnp.int32)
            j, blk, _, lane_valid = blocked_window(
                fc, off, WB, bstarts, starts_s, sizes_s, g
            )
            j, blk = np.asarray(j), np.asarray(blk)
            lane_valid = np.asarray(lane_valid)
            pos = off0 + np.arange(WB)[None, :]
            np.testing.assert_array_equal(
                np.take_along_axis(tmap, pos, axis=1), j % L, err_msg=str(off0)
            )
            np.testing.assert_array_equal(
                np.take_along_axis(blkmap, pos, axis=1), blk,
                err_msg=str(off0),
            )
            m = np.take_along_axis(lmask, pos, axis=1)
            bits = ((m[:, :, None] >> lane[None, None, :]) & 1) != 0
            np.testing.assert_array_equal(bits, lane_valid, err_msg=str(off0))

    def test_positions_past_total_are_masked(self, prepared):
        index, streams = prepared
        G = index.config.gather_block
        g = int(np.log2(G))
        L = index.g_sorted_hash.shape[0]
        total = np.asarray(streams["total"])
        tb = int(total.max()) + 64
        smap = np.asarray(stream_block_map(
            streams["fc"], streams["bstarts"], streams["starts"],
            streams["sizes"], g, L, tb,
        ))
        lmask = smap[..., 2].view(np.uint32)
        pos = np.arange(tb)[None, :]
        assert (lmask[pos >= total[:, None]] == 0).all()


class TestEndToEndAB:
    """stream_map on vs off through the full engine: identical results."""

    @pytest.mark.parametrize("driver", ["batched", "continuous"])
    def test_global_search_bit_identical(self, ds, driver):
        from clann_tpu.ops.global_query import (
            global_search,
            global_search_continuous,
        )

        base = dict(
            num_tables=10, num_clusters_factor=0.4, k=10, delta=0.9,
            dataset_name=ds.name, lsh_engine="global", dense_layout=False,
        )
        idx_on = build_index(ds.train, Config(**base))
        idx_off = idx_on.replace(config=Config(**base, stream_map=False))
        if driver == "batched":
            run = lambda idx: global_search(idx, ds.test, k=10, delta=0.9)
        else:
            run = lambda idx: global_search_continuous(
                idx, ds.test, k=10, delta=0.9, lanes=16, step_iters=2
            )
        d0, i0, s0 = run(idx_off)
        d1, i1, s1 = run(idx_on)
        np.testing.assert_array_equal(i0, i1)
        np.testing.assert_array_equal(d0, d1)
        np.testing.assert_array_equal(
            np.asarray(s0.distance_computations),
            np.asarray(s1.distance_computations),
        )

    def test_capped_map_fallback_bit_identical(self, ds):
        """A map far shorter than the walk forces the lax.cond fallback
        mid-search; results must still match the unmapped path exactly.

        Also PROVES the fallback branch ran: the loop's final cursors are
        inspected directly, and a cursor that ended past the map depth
        must have crossed the `live_max + WB > tb` predicate while live
        (off advances by at most WB per iteration and freezes at done)."""
        from clann_tpu.ops.global_query import (
            _attach_stream_map,
            _init_state,
            _loop_pieces,
            _map_tb,
            _prepare_streams,
            global_search,
        )

        base = dict(
            num_tables=10, num_clusters_factor=0.4, k=10, delta=0.975,
            dataset_name=ds.name, lsh_engine="global", dense_layout=False,
        )
        idx_off = build_index(
            ds.train, Config(**base, stream_map=False)
        )
        # stream_map_blocks floors at 1024 in the orchestrator; with
        # chunk=512/fx=8/G=16 the window alone is 256 blocks, so deep
        # delta=0.975 walks overrun 1024 and exercise the fallback branch
        idx_capped = idx_off.replace(
            config=Config(**base, stream_map_blocks=1)
        )
        d0, i0, s0 = global_search(idx_off, ds.test, k=10, delta=0.975)
        d1, i1, s1 = global_search(idx_capped, ds.test, k=10, delta=0.975)
        np.testing.assert_array_equal(i0, i1)
        np.testing.assert_array_equal(d0, d1)
        np.testing.assert_array_equal(
            np.asarray(s0.distance_computations),
            np.asarray(s1.distance_computations),
        )

        # fallback-taken witness: replay the capped loop keeping the raw
        # state, mirroring global_search_batch_mapped's map sizing
        cfg = idx_capped.config
        source, filterer = idx_capped.rebuild_objects()
        qn = jnp.asarray(
            ds.test / np.linalg.norm(ds.test, axis=1, keepdims=True),
            jnp.float32,
        )
        streams = _prepare_streams(
            idx_capped, qn, source.hash(qn), filterer.sketch(qn),
            min_depth=cfg.min_depth,
        )
        G = cfg.gather_block
        wb = max(1, (cfg.candidate_chunk * cfg.filter_expand) // G)
        tb = _map_tb(
            int(jnp.max(streams["total"])), cfg.stream_map_blocks, wb,
            qn.shape[0],
        )
        streams = _attach_stream_map(
            streams, g=int(np.log2(G)),
            L=idx_capped.g_sorted_hash.shape[0], tb=tb,
        )
        cond, body = _loop_pieces(
            idx_capped, streams, jnp.float32(0.975), k=10,
            chunk=cfg.candidate_chunk, min_depth=cfg.min_depth,
            filter_type="default", filter_expand=cfg.filter_expand,
        )
        state = jax.lax.while_loop(
            cond, body,
            _init_state(qn.shape[0], 10, streams["total"]),
        )
        final_off = np.asarray(state[3])
        assert final_off.max() > tb, (
            f"no cursor overran the {tb}-position map "
            f"(max off {final_off.max()}); the test no longer exercises "
            "the lax.cond fallback — deepen delta or shrink the cap"
        )

    def test_dead_block_routing_bit_identical(self, ds):
        """Routing dead blocks' gathers to table-0/block-0 must be
        invisible: `valid` masks every consumer of gathered record data.
        A future consumer of unmasked records would break this equality
        (the routed lanes then read block 0's records, not their own),
        which is exactly the invariant ADVICE r3 asked to pin directly —
        both arms of the other A/B tests include the routing."""
        from clann_tpu.ops.global_query import global_search

        base = dict(
            num_tables=10, num_clusters_factor=0.4, k=10, delta=0.9,
            dataset_name=ds.name, lsh_engine="global", dense_layout=False,
        )
        idx_on = build_index(ds.train, Config(**base))
        assert idx_on.config.dead_block_routing
        idx_off = idx_on.replace(
            config=Config(**base, dead_block_routing=False)
        )
        d0, i0, s0 = global_search(idx_off, ds.test, k=10, delta=0.9)
        d1, i1, s1 = global_search(idx_on, ds.test, k=10, delta=0.9)
        np.testing.assert_array_equal(i0, i1)
        np.testing.assert_array_equal(d0, d1)
        np.testing.assert_array_equal(
            np.asarray(s0.distance_computations),
            np.asarray(s1.distance_computations),
        )
