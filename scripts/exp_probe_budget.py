"""Amortized per-iteration budget of the global LSH engine's probe loop.

scripts/prof_global.py times each stage as its own dispatch, so the
~25-30ms relay dispatch floor drowns stages below ~5ms. This experiment
times the probe-loop body run for a fixed number of iterations inside ONE
jit (lax.fori_loop) — the dispatch cost amortizes to <2ms/iter — and then
re-times a stage-toggled replica of the body with stages removed one at a
time; the deltas are the true amortized per-iteration stage costs. This is
the measurement that sizes the fused Pallas probe kernel (VERDICT round-2
item #1).

The replica with all toggles on is asserted to cost the same as the real
ops/global_query._loop_pieces body (within relay noise), so the ablation
numbers describe the production loop, not a strawman.

Run: python -m scripts.exp_probe_budget   [PROF_N / PROF_CHUNK / PROF_FX /
PROF_G / PROF_ITERS env knobs]
"""
import functools
import json
import os
import sys
import time

import numpy as np

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp_cache")
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax
import jax.numpy as jnp

from clann_tpu.config import Config
from clann_tpu.core.index import build_index
from clann_tpu.ops.global_query import (
    _entry_depth,
    _init_state,
    _loop_pieces,
    _prepare_streams,
)
from clann_tpu.ops.prefixmap import blocked_window, count_leq
from clann_tpu.ops.query import (
    _compact_take,
    _merge_topk,
    _score_candidates,
    probs_lookup,
)


def log(m):
    print(m, file=sys.stderr, flush=True)


N = int(os.environ.get("PROF_N", 200_000))
Q = 256
CHUNK = int(os.environ.get("PROF_CHUNK", 1024))
FX = int(os.environ.get("PROF_FX", 8))
G = int(os.environ.get("PROF_G", 16))
L = int(os.environ.get("PROF_L", 50))
ITERS = int(os.environ.get("PROF_ITERS", 20))
REPS = int(os.environ.get("PROF_REPS", 8))

cache = os.path.expanduser("~/.cache/clann_tpu/tune_200k_flat.npz")
if N > 200_000 or not os.path.exists(cache):
    cache = os.path.expanduser(
        "~/.cache/clann_tpu/bench_1183514x100_q10000.npz"
    )
z = np.load(cache)
train, test = z["train"][:N], z["test"][:Q]

cfg = Config(num_tables=L, num_clusters_factor=0.4, k=10, delta=0.9,
             candidate_chunk=CHUNK, filter_expand=FX, gather_block=G,
             lsh_engine="global", seed=0, dense_layout=False)
t0 = time.time()
index = build_index(train, cfg)
log(f"build {time.time() - t0:.0f}s")

source, filterer = index.rebuild_objects()
qn = jnp.asarray(test / np.linalg.norm(test, axis=1, keepdims=True))
qh = source.hash(qn)
qs = filterer.sketch(qn)

streams = jax.jit(
    functools.partial(_prepare_streams, min_depth=cfg.min_depth)
)(index, qn, qh, qs)
state0 = _init_state(Q, cfg.k, streams["total"])
delta = jnp.float32(0.9)

# ---- stage-toggled replica of ops/global_query._loop_pieces body ----
K = cfg.k
L = index.g_sorted_hash.shape[0]
S = index.sketches.shape[1]
Wd = index.sketches.shape[2]
R = index.g_records.shape[2]
n_pad = index.g_records.shape[1]
nb = n_pad // G
WB = max(1, (CHUNK * FX) // G)
WL = WB * G
CB = CHUNK + G
g_log = int(np.log2(G))
d_entry = _entry_depth(index, cfg.min_depth)
rec_view = index.g_records.reshape(L, nb, G * R)
C = index.centers.shape[0]
blk_iota = jnp.arange(WB, dtype=jnp.int32)
min_depth = cfg.min_depth


def make_body(on, index, streams):
    """Replica body; `on` toggles {gather, sketch, feas, compact, rescore,
    merge, probs, bookkeeping, consume, dense_index} — each off-path
    substitutes the cheapest shape-correct stand-in so the rest of the
    pipeline is undisturbed. bookkeeping=False replaces blocked_window
    with static precomputed window arrays (bounds the whole
    window-mapping cost); consume=False uses a constant consumed=WB/2;
    dense_index=True keeps bookkeeping but swaps the scatter-based
    window_range_index for the compare-and-sum variant."""
    rec_view = index.g_records.reshape(L, nb, G * R)
    feas_bound = streams["feas_bound"]
    ball_floor = streams["ball_floor"]
    starts_s, sizes_s = streams["starts"], streams["sizes"]
    bstarts, fc, total = streams["bstarts"], streams["fc"], streams["total"]
    queries_n = streams["qn"]
    query_sketches = streams["qsk"]

    # static window stand-in for bookkeeping=False (computed once,
    # loop-invariant — gather indices stay realistic, mapping cost -> 0)
    j_st, blk_st, lane_slot_st, lane_valid_st = jax.jit(
        lambda: blocked_window(
            fc, jnp.full((Q,), 3, jnp.int32), WB, bstarts, starts_s,
            sizes_s, g_log,
        )
    )()

    def body(s):
        topk_sims, topk_ids, qdone, off, dc, cand_ct = s

        if on.get("bookkeeping", True):
            j, blk, lane_slot, lane_valid = blocked_window(
                fc, off, WB, bstarts, starts_s, sizes_s, g_log,
                dense_index=on.get("dense_index", False),
            )
        else:
            j, blk, lane_slot, lane_valid = (
                j_st, blk_st + off[:, None] % 7, lane_slot_st, lane_valid_st
            )
        valid = (lane_valid & ~qdone[:, None, None]).reshape(Q, WL)
        t_sel = j % L

        if on["gather"]:
            rec = rec_view[t_sel, jnp.clip(blk, 0, nb - 1)]
            rec = rec.reshape(Q, WB, G, R)
            cand_ids = rec[..., 0].astype(jnp.int32).reshape(Q, WL)
            cand_sk = rec[..., 1:1 + Wd].reshape(Q, WL, Wd)
            cand_cluster = jnp.clip(
                rec[..., 1 + Wd].astype(jnp.int32).reshape(Q, WL), 0, C - 1)
        else:
            cand_ids = lane_slot.reshape(Q, WL) % N
            cand_sk = jnp.broadcast_to(
                blk[:, :, None, None].astype(jnp.uint32), (Q, WB, G, Wd)
            ).reshape(Q, WL, Wd)
            cand_cluster = jnp.clip(blk.reshape(Q, WB, 1) % C, 0, C - 1)
            cand_cluster = jnp.broadcast_to(
                cand_cluster, (Q, WB, G)).reshape(Q, WL)

        kth_sim = topk_sims[:, K - 1]
        full = topk_ids[:, K - 1] >= 0
        kth_dist = jnp.where(full, 2.0 * (1.0 - kth_sim), jnp.inf)

        if on["sketch"]:
            maxdiff = index.maxdiff_table[jnp.clip(
                (kth_sim / index.sim_eps).astype(jnp.int32), 0,
                index.maxdiff_table.shape[0] - 1)]
            q_sk = jnp.broadcast_to(
                jnp.take_along_axis(
                    query_sketches, (t_sel % S)[:, :, None], axis=1
                )[:, :, None, :], (Q, WB, G, Wd)).reshape(Q, WL, Wd)
            ham = jnp.sum(jax.lax.population_count(
                jnp.bitwise_xor(cand_sk, q_sk)), axis=-1).astype(jnp.int32)
            sketch_pass = ham <= maxdiff[:, None]
        else:
            sketch_pass = cand_sk[..., 0] >= 0  # always true, same dtype path

        if on["feas"]:
            ok = (feas_bound <= kth_dist[:, None]).astype(jnp.bfloat16)
            feas = (jnp.einsum(
                "qwc,qc->qw",
                jax.nn.one_hot(cand_cluster, C, dtype=jnp.bfloat16), ok,
                preferred_element_type=jnp.float32) >= 0.5)
        else:
            feas = cand_cluster >= 0

        passes = valid & feas & sketch_pass

        if on.get("consume", True):
            pb = jnp.sum(passes.reshape(Q, WB, G), axis=2)
            cum_pb = jnp.cumsum(pb, axis=1)
            consumed = jnp.maximum(jnp.sum(cum_pb <= CHUNK, axis=1), 1)
        else:
            consumed = jnp.full((Q,), WB // 2, jnp.int32)
        in_window = (jnp.broadcast_to(
            (blk_iota[None, :] < consumed[:, None])[:, :, None],
            (Q, WB, G))).reshape(Q, WL)
        take = passes & in_window

        if on["compact"]:
            compact_ids = _compact_take(take, cand_ids, cap=CB, n_sentinel=N)
        else:
            compact_ids = cand_ids[:, :CB]

        if on["rescore"]:
            safe_ids = jnp.clip(compact_ids, 0, N - 1)
            sims = _score_candidates(index, queries_n, None, safe_ids)
        else:
            sims = compact_ids.astype(jnp.float32) * 1e-9

        if on["merge"]:
            topk_sims, topk_ids = _merge_topk(
                topk_sims, topk_ids, compact_ids, sims, n_sentinel=N)
        else:
            topk_sims = topk_sims + sims[:, :K] * 0.0
            topk_ids = topk_ids

        dc = dc + jnp.sum(take, axis=1, dtype=jnp.int32)
        cand_ct = cand_ct + jnp.sum(valid & in_window, axis=1,
                                    dtype=jnp.int32)

        off_new = off + consumed
        exhausted = off_new >= total

        if on["probs"]:
            r_star = count_leq(fc, off_new[:, None])[:, 0]
            depth_cur = jnp.maximum(d_entry - r_star // L, min_depth)
            tables_consumed = (r_star % L).astype(jnp.float32)
            kth_sim = topk_sims[:, K - 1]
            full = topk_ids[:, K - 1] >= 0
            kth_dist = jnp.where(full, 2.0 * (1.0 - kth_sim), jnp.inf)
            p_d = probs_lookup(index, depth_cur, kth_sim)
            p_d1 = probs_lookup(index, depth_cur + 1, kth_sim)
            rest = jnp.where(depth_cur == d_entry, 0.0,
                             jnp.maximum(L - tables_consumed, 0.0))
            failure = jnp.power(1.0 - p_d, tables_consumed) * jnp.power(
                1.0 - p_d1, rest)
            ball_stop = full & (ball_floor > kth_dist)
            qdone = qdone | (failure <= 1.0 - delta) | exhausted | ball_stop
        else:
            qdone = qdone | exhausted

        return (topk_sims, topk_ids, qdone, off, dc, cand_ct)  # off frozen

    return body


def run_iters(body, iters, strm, st0):
    def step(_, s):
        topk_sims, topk_ids, qdone, off, dc, cand_ct = body(s)
        # force ITERS live iterations: cursor advances by a fixed stride,
        # qdone stays False, so every iteration pays full cost like the
        # pre-termination phase of a real search
        off = jnp.clip(s[3] + WB // 2, 0, jnp.maximum(strm["total"] - WB, 0))
        qdone = jnp.zeros_like(qdone)
        return (topk_sims, topk_ids, qdone, off, dc, cand_ct)

    return jax.lax.fori_loop(0, iters, step, st0)


def timed(name, body_maker, strm=None):
    """body_maker(index, streams) -> body. index/streams/state0 are jit
    ARGUMENTS, not closures: closed-over arrays are embedded as HLO
    constants (2.9GB at 1.18M/L=128) and the relay's remote_compile
    rejects or crawls on oversized payloads (round-3/4 lesson)."""
    strm = streams if strm is None else strm

    def f_impl(idx, s, st0):
        body = body_maker(idx, s)
        return jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(b.astype(jnp.float32)),
            run_iters(body, ITERS, s, st0), jnp.float32(0))

    f = jax.jit(f_impl)
    float(f(index, strm, state0))  # compile
    best = np.inf
    for _ in range(REPS):
        t0 = time.time()
        float(f(index, strm, state0))
        best = min(best, time.time() - t0)
    per_iter = best * 1000 / ITERS
    log(f"{name:30s} {per_iter:7.2f} ms/iter")
    return per_iter


ALL = {"gather": True, "sketch": True, "feas": True, "compact": True,
       "rescore": True, "merge": True, "probs": True}

log(f"shapes: Q={Q} N={N} WB={WB} WL={WL} CB={CB} C={C} "
    f"M={streams['starts'].shape[1]}")

ONLY_MAP = os.environ.get("PROF_ONLY") == "map"

results = {}
def _real_maker(idx, s):
    return _loop_pieces(idx, s, delta, k=K, chunk=CHUNK,
                        min_depth=min_depth, filter_type="default",
                        filter_expand=FX)[1]


results["real_body"] = timed("REAL body (_loop_pieces)", _real_maker)
if not ONLY_MAP:
    results["replica_all"] = timed(
        "replica (all on)", functools.partial(make_body, dict(ALL)))
    for stage in ("gather", "sketch", "feas", "compact", "rescore", "merge",
                  "probs", "bookkeeping", "consume"):
        off_t = dict(ALL)
        off_t[stage] = False
        results[f"no_{stage}"] = timed(
            f"  without {stage}", functools.partial(make_body, off_t))
    results["dense_index"] = timed(
        "  dense window index",
        functools.partial(make_body, {**ALL, "dense_index": True}))

# REAL body over precomputed stream maps (round-3 fast path): the
# bookkeeping stage collapses to three (Q, WB) row gathers
from clann_tpu.ops.global_query import _attach_stream_map, _map_tb

# cap like the production orchestrator (_map_tb), but at the exercised
# prefix rather than stream_map_blocks: run_iters advances off by WB/2
# per iteration, so ITERS*WB/2 + WB positions bound what the measurement
# walks — stay mapped for the whole measurement.
_total_max = int(np.asarray(jnp.max(streams["total"])))
_tb = _map_tb(_total_max, (ITERS + 4) * WB // 2, WB, Q)
streams_m = _attach_stream_map(
    streams, g=g_log, L=L, tb=_tb
)


results["stream_map"] = timed(
    "REAL body + stream maps", _real_maker, strm=streams_m)
# (round 4: the probe_filter_kernel variants were removed with the kernel
# itself — the fused stages cost ~0.1-0.2ms of the body and the only
# fusion that could matter, the gather, is DMA-measured slower in
# PALLAS_GATHER.json.)

deltas = {s: round(results["replica_all"] - results[f"no_{s}"], 2)
          for s in ("gather", "sketch", "feas", "compact", "rescore",
                    "merge", "probs", "bookkeeping", "consume")
          if f"no_{s}" in results} if "replica_all" in results else {}
summary = {"shapes": {"Q": Q, "N": N, "chunk": CHUNK, "fx": FX, "G": G,
                      "WB": WB, "WL": WL, "CB": CB, "C": C},
           "ms_per_iter": {k: round(v, 2) for k, v in results.items()
                           if v is not None},
           "stage_cost_ms": deltas}
print(json.dumps(summary))
