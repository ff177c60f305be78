"""Per-piece microbenchmark of the global LSH engine's inner loop.

Times each stage of ops/global_query.global_search_batch_impl's body at
the exact shapes one iteration uses (Q=256 queries, the swept
chunk/filter_expand/gather_block), so optimization effort lands on the
measured dominant term instead of an estimated one.

Run: python -m scripts.prof_global
"""
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
from clann_tpu.core.index import build_index, make_global_tables, unsort_hashes
from clann_tpu.data.synthetic import clustered_unit_vectors
from clann_tpu.ops.distances import brute_force_topk
from clann_tpu.ops.prefixmap import (
    block_stream,
    blocked_window,
    build_prefix_directory,
    candidate_stream,
    count_leq,
    depth_bounds,
)
from clann_tpu.ops.query import _compact_take, _merge_topk


def log(m):
    print(m, file=sys.stderr, flush=True)


N = int(os.environ.get("PROF_N", 200_000))
Q = 256
CHUNK = int(os.environ.get("PROF_CHUNK", 2048))
FX = int(os.environ.get("PROF_FX", 4))
G = 16

cache = os.path.expanduser("~/.cache/clann_tpu/tune_200k_flat.npz")
if not os.path.exists(cache):
    # same distribution at larger n — the bench dataset's prefix
    cache = os.path.expanduser(
        "~/.cache/clann_tpu/bench_1183514x100_q10000.npz"
    )
z = np.load(cache)
train, test = z["train"][:N], z["test"][:Q]

cfg = Config(num_tables=50, num_clusters_factor=0.4, k=10, delta=0.9,
             candidate_chunk=CHUNK, filter_expand=FX, gather_block=G,
             seed=0, pack_slot_records=False, dense_layout=False)
t0 = time.time()
index = build_index(train, cfg)
hashes_T = unsort_hashes(index.sorted_hash, index.sorted_idx)
gh, gr = make_global_tables(hashes_T, index.sketches, index.assignment,
                            pad_to=G)
gd = build_prefix_directory(
    gh, jnp.asarray(np.asarray([0, N], np.int32)), cfg.global_dir_bits,
    int(np.ceil(np.log2(max(2, N)))) + 1, cfg.max_hashbits)
gdi = int(np.ceil(np.log2(max(2, int(jnp.max(
    gd[:, :, 1:] - gd[:, :, :-1])))))) + 1
index = index.replace(g_sorted_hash=gh, g_records=gr, g_dir=gd,
                      g_dir_iters=gdi)
log(f"build {time.time()-t0:.0f}s")

source, filterer = index.rebuild_objects()
qn = jnp.asarray(test)
qh = source.hash(qn)
qs = filterer.sketch(qn)

L = gh.shape[0]
D = cfg.max_hashbits
d_entry = int(np.clip(np.ceil(np.log2(max(2, N))) + 2, 1, D))
g_log = int(np.log2(G))
WB = max(1, (CHUNK * FX) // G)
WL = WB * G
CB = CHUNK + G
Wd = index.sketches.shape[2]
R = gr.shape[2]
nb = gr.shape[1] // G
rec_view = gr.reshape(L, nb, G * R)
C = index.centers.shape[0]
S = index.sketches.shape[1]

zero = jnp.zeros((Q,), jnp.int32)
full_n = jnp.full((Q,), N, jnp.int32)
lo, hi = depth_bounds(gh, qh, zero, full_n, D, gdi, up_to_depth=d_entry,
                      prefix_dir=gd, cluster=zero,
                      dir_bits=cfg.global_dir_bits)
starts_s, sizes_s = candidate_stream(lo, hi, qh, D, 1, start_depth=d_entry)
bstarts, bcounts = block_stream(starts_s, sizes_s, g_log)
fc = jnp.cumsum(bcounts, axis=1)
off = jnp.zeros((Q,), jnp.int32)

from clann_tpu.ops.distances import exact_dot
center_dist = jnp.clip(1.0 - exact_dot(qn, index.centers.T), 0.0, 2.0)
feas_bound = center_dist - index.radii[None, :]

# realistic window state at off=0
j, blk, lane_slot, lane_valid = jax.jit(
    lambda fc, off: blocked_window(fc, off, WB, bstarts, starts_s,
                                   sizes_s, g_log)
)(fc, off)
t_sel = j % L
rec = rec_view[t_sel, jnp.clip(blk, 0, nb - 1)].reshape(Q, WB, G, R)
cand_ids = rec[..., 0].astype(jnp.int32).reshape(Q, WL)
cand_sk = rec[..., 1:1 + Wd].reshape(Q, WL, Wd)
cand_cluster = jnp.clip(rec[..., 1 + Wd].astype(jnp.int32).reshape(Q, WL),
                        0, C - 1)
kth_sim = jnp.full((Q,), 0.8, jnp.float32)
kth_dist = 2.0 * (1.0 - kth_sim)
take = (jnp.arange(WL)[None, :] % 3 == 0) & lane_valid.reshape(Q, WL)
compact_ids = _compact_take(take, cand_ids, cap=CB, n_sentinel=N)
safe_ids = jnp.clip(compact_ids, 0, N - 1)
sims0 = jnp.zeros((Q, CB), jnp.float32)
tk_s = jnp.zeros((Q, 10), jnp.float32)
tk_i = jnp.full((Q, 10), -1, jnp.int32)


def timed(name, fn, *args, reps=10):
    # reduce outputs to ONE scalar inside the jit: np.asarray on a full
    # output would drag it across the ~33MB/s relay, swamping the kernel
    # time; a sum keeps the op alive against DCE at ~1 pass cost
    def wrapped(*a):
        out = fn(*a)
        return sum(
            jnp.sum(o.astype(jnp.float32))
            for o in jax.tree_util.tree_leaves(out)
        )

    f = jax.jit(wrapped)
    float(f(*args))
    t0 = time.time()
    for _ in range(reps):
        v = float(f(*args))
    el = (time.time() - t0) / reps * 1000
    log(f"{name:28s} {el:7.2f} ms")
    return el


log(f"shapes: Q={Q} WB={WB} WL={WL} CB={CB} M={sizes_s.shape[1]} C={C}")

timed("window bookkeeping", lambda fc, off: blocked_window(
    fc, off, WB, bstarts, starts_s, sizes_s, g_log), fc, off)

timed("record gather", lambda ts, bk: rec_view[
    ts, jnp.clip(bk, 0, nb - 1)], t_sel, blk)

def sketch_filter(cand_sk, t_sel):
    q_sk = jnp.broadcast_to(
        jnp.take_along_axis(qs, (t_sel % S)[:, :, None], axis=1)[:, :, None, :],
        (Q, WB, G, Wd)).reshape(Q, WL, Wd)
    return jnp.sum(jax.lax.population_count(jnp.bitwise_xor(cand_sk, q_sk)),
                   axis=-1)
timed("sketch filter", sketch_filter, cand_sk, t_sel)

def feas_onehot(cand_cluster, kth_dist):
    ok = (feas_bound <= kth_dist[:, None]).astype(jnp.bfloat16)
    return jnp.einsum(
        "qwc,qc->qw",
        jax.nn.one_hot(cand_cluster, C, dtype=jnp.bfloat16), ok,
        preferred_element_type=jnp.float32) >= 0.5
timed("feasibility one-hot", feas_onehot, cand_cluster, kth_dist)

def consume(passes):
    pb = jnp.sum(passes.reshape(Q, WB, G), axis=2)
    cum_pb = jnp.cumsum(pb, axis=1)
    return jnp.maximum(jnp.sum(cum_pb <= CHUNK, axis=1), 1)
timed("consume bookkeeping", consume, take)

timed("compact (sort)", lambda t, c: _compact_take(
    t, c, cap=CB, n_sentinel=N), take, cand_ids)

def rescore(safe_ids):
    vecs = index.vectors[safe_ids]
    return jnp.einsum("qcd,qd->qc", vecs, qn,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
timed("rescore gather+matmul", rescore, safe_ids)

timed("merge topk", lambda a, b, c, d: _merge_topk(
    a, b, c, d, n_sentinel=N), tk_s, tk_i, compact_ids, sims0)

timed("count_leq + probs", lambda off: count_leq(fc, off[:, None]), off)

timed("null dispatch baseline", lambda off: off, off)
