"""Batched distance computation and the brute-force k-NN oracle.

TPU-native equivalent of the reference's distance layer:
- cosine distance with precomputed norms (reference: src/metricdata/angulardata.rs:12-35)
- L2 via the squared-norm identity (reference: src/metricdata/euclideandata.rs:24-45)
- brute-force search oracle (reference: src/utils/mod.rs:116-131 and
  libpuffinn collection.hpp:524-541)
- PUFFINN cosine *similarity* convention sim = (dot+1)/2 in [0, 1]
  (reference: libpuffinn/include/puffinn/similarity_measure/cosine.hpp:19-23)
  and the CLANN distance<->similarity map sim = 1 - dist/2
  (reference: src/puffinn_binds/puffinn_types.rs:77-79).

Everything is expressed as (n, d) @ (d, q) matmuls so the MXU does the work;
the reference's AVX2 i16 fixed-point dot (math.hpp:11-34) has no TPU analog
— we rescore in f32 (or bf16-in/f32-accum) which is strictly more precise
than Q15 `mulhrs` arithmetic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def exact_dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """f32 matmul at full precision.

    On TPU the MXU natively multiplies bf16; `HIGHEST` requests the 3-pass
    f32 emulation so exact distances (oracle + final rescoring) are not
    perturbed by bf16 rounding. The reference's Q15 fixed point
    (math.hpp:11-34) has ~3e-5 quantization error; f32-highest is strictly
    tighter.
    """
    return jnp.dot(
        a, b, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
    )


def l2_normalize(x: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    n = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x / jnp.where(n == 0, 1.0, n)


def cosine_distance_block(base_n: jnp.ndarray, queries_n: jnp.ndarray) -> jnp.ndarray:
    """(q, n) cosine distances between pre-normalized rows.

    dist = 1 - cos (reference: angulardata.rs:25-35).
    """
    dots = exact_dot(queries_n, base_n.T)
    return jnp.clip(1.0 - dots, 0.0, 2.0)


def l2_distance_block(base: jnp.ndarray, queries: jnp.ndarray) -> jnp.ndarray:
    """(q, n) euclidean distances (reference: euclideandata.rs:24-45)."""
    b_sq = jnp.sum(base * base, axis=1)
    q_sq = jnp.sum(queries * queries, axis=1)
    dots = exact_dot(queries, base.T)
    d2 = q_sq[:, None] + b_sq[None, :] - 2.0 * dots
    return jnp.sqrt(jnp.clip(d2, 0.0, None))


def cosine_to_similarity(dist: jnp.ndarray) -> jnp.ndarray:
    """CLANN distance -> PUFFINN similarity: sim = 1 - dist/2
    (reference: src/puffinn_binds/puffinn_types.rs:77-79)."""
    return 1.0 - dist / 2.0


def similarity_to_cosine(sim: jnp.ndarray) -> jnp.ndarray:
    """PUFFINN similarity -> CLANN cosine distance (inverse of above)."""
    return 2.0 * (1.0 - sim)


def cosine_similarity_block(base_n: jnp.ndarray, queries_n: jnp.ndarray) -> jnp.ndarray:
    """(q, n) PUFFINN similarities sim=(dot+1)/2 (reference: cosine.hpp:19-23)."""
    dots = exact_dot(queries_n, base_n.T)
    return jnp.clip((dots + 1.0) * 0.5, 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=("k", "metric", "block_q"))
def _brute_force_topk_jit(base, queries, *, k: int, metric: str, block_q: int):
    """Exact k-NN: distance matmul blocks + lax.top_k.

    Blocks over queries via lax.map so the (block_q, n) distance tile stays
    within memory for large n; the matmul itself is the MXU fast path.
    """
    if metric == "angular":
        base = l2_normalize(base)
        queries = l2_normalize(queries)

    nq = queries.shape[0]
    pad = (-nq) % block_q
    qp = jnp.pad(queries, ((0, pad), (0, 0)))
    qb = qp.reshape(-1, block_q, queries.shape[1])

    def one_block(qblk):
        if metric == "angular":
            d = cosine_distance_block(base, qblk)
        else:
            d = l2_distance_block(base, qblk)
        neg_d, idx = jax.lax.top_k(-d, k)
        return -neg_d, idx

    dists, ids = jax.lax.map(one_block, qb)
    dists = dists.reshape(-1, k)[:nq]
    ids = ids.reshape(-1, k)[:nq]
    return dists, ids


def brute_force_topk(base, queries, k: int = 10, metric: str = "angular", block_q: int = 256):
    """Exact k nearest neighbors (ascending distance), the test oracle.

    Reference: src/utils/mod.rs:116-131 (Rust brute_force_search) and
    collection.hpp:524-541 (C++ search_bf).

    Returns (distances (q, k), indices (q, k)) as device arrays.
    """
    base = jnp.asarray(base, dtype=jnp.float32)
    queries = jnp.asarray(queries, dtype=jnp.float32)
    block_q = min(block_q, max(1, queries.shape[0]))
    return _brute_force_topk_jit(base, queries, k=k, metric=metric, block_q=block_q)


def _dense_scan_impl(
    base_n, queries_n, *, k: int, block_points: int, recall_target: float,
    exact: bool, normalize_queries: bool = False,
):
    """Traceable dense-scan body (inlined under shard_map by
    parallel/sharded.py); use `_dense_scan_jit` directly."""
    if normalize_queries:
        # fused normalization: a separate eager l2_normalize costs a full
        # ~40ms relay dispatch per search call (see ops/ivf.scan_search)
        queries_n = queries_n / jnp.maximum(
            jnp.linalg.norm(queries_n, axis=-1, keepdims=True), 1e-30
        )
    n = base_n.shape[0]
    nb = -(-n // block_points)
    pad = nb * block_points - n
    bp = jnp.pad(base_n, ((0, pad), (0, 0)))
    # NOTE on dtype: bf16 operands and bf16 score tensors were both
    # measured at par with f32 here (the block cost splits ~evenly between
    # the K=100 matmul and approx_max_k's binned reduction, neither of
    # which bf16 accelerates at these shapes) while costing ~0.6% recall —
    # so the scan stays f32 end to end.
    qmat = queries_n
    blocks = bp.reshape(nb, block_points, -1)
    base_ids = jnp.arange(nb * block_points, dtype=jnp.int32).reshape(
        nb, block_points
    )

    def scan_block(carry, blk):
        top_s, top_i = carry
        vecs, ids = blk
        dots = jnp.dot(qmat, vecs.T, preferred_element_type=jnp.float32)
        sims = jnp.where(ids[None, :] < n, dots, -jnp.inf)
        if exact:
            s, j = jax.lax.top_k(sims, k)
        else:
            # hardware-accelerated approximate top-k (the idiomatic TPU
            # ANN primitive); membership is approximate with the given
            # recall target
            s, j = jax.lax.approx_max_k(sims, k, recall_target=recall_target)
        i = ids[j]
        merged_s = jnp.concatenate([top_s, s], axis=1)
        merged_i = jnp.concatenate([top_i, i], axis=1)
        ms, sel = jax.lax.top_k(merged_s, k)
        return (ms, jnp.take_along_axis(merged_i, sel, axis=1)), None

    q = queries_n.shape[0]
    init = (
        jnp.full((q, k), -jnp.inf, jnp.float32),
        jnp.full((q, k), -1, jnp.int32),
    )
    (top_s, top_i), _ = jax.lax.scan(scan_block, init, (blocks, base_ids))
    if not exact:
        # exact f32 rescore of the selected candidates (k gathers/query —
        # negligible next to the scan) so returned scores match the exact
        # path bit-for-bit at equal membership
        safe = jnp.clip(top_i, 0, n - 1)
        ex = jnp.einsum(
            "qkd,qd->qk", base_n[safe], queries_n,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        ex = jnp.where(top_i >= 0, ex, -jnp.inf)
        top_s, sel = jax.lax.top_k(ex, k)
        top_i = jnp.take_along_axis(top_i, sel, axis=1)
    return top_s, top_i


_dense_scan_jit = functools.partial(
    jax.jit,
    static_argnames=(
        "k", "block_points", "recall_target", "exact", "normalize_queries"
    ),
)(_dense_scan_impl)


def _certified_scan_impl(
    base_n, queries_n, *, k: int, block_points: int,
    recall_target: float, eps: float, normalize_queries: bool = False,
):
    """Exact top-k via the APPROX scan + a certifying count pass.

    The direct exact path runs `lax.top_k` over every (Q, block) score
    tile — measured 6-8x slower than the approx paths at the bench shape
    (EXACT_FLOOR.json: 16.4k vs 101k QPS), because TPU top_k lowers to a
    per-tile sort while `approx_max_k` rides the binned-max hardware
    path. This replaces the sort with a certificate:

      pass 1  approx winners, keeping their SCAN-precision scores;
              tau_q = scan-precision k-th score of the winner set S_q.
      pass 2  count_q = |{p : sim_scan(q,p) >= tau_q - eps}| — matmul +
              compare + reduce, NO selection network, the SAME dot op.

    Both sides of the certificate live in the scan's own score precision
    — the SAME domain the direct exact path selects in (its top_k sorts
    the scan dots), so "exact" means exactly what direct-exact means.
    (The first cut compared scan dots against the HIGHEST-precision
    rescored tau: the cross-precision gap (~1e-3 at d=100) both inflated
    counts — 53% fallback — and let a few wrong certificates through.
    Single-domain comparison fixed both; measured in EXACT_FLOOR.json.)

    Soundness: tau_q <= the true (scan-precision) k-th score, so every
    true top-k point counts; S_q's top-k counts too. count == k forces
    the two k-element sets to coincide — S_q's top-k IS the exact
    answer. count > k (an approx miss, ~2% of queries at m=k, or a
    score tie within eps) falls back to the direct sort in the caller.
    eps absorbs any compile-instance nondeterminism between the two
    passes' identical dots (0 suffices when XLA reuses the lowering;
    the 1e-6 default is insurance that costs ~nothing in fallbacks).

    Winners are exactly rescored (HIGHEST f32) for the RETURNED scores,
    like every other scan path. Returns (top_sims desc, top_ids,
    counts) — counts (Q,) int32.
    """
    if normalize_queries:
        queries_n = queries_n / jnp.maximum(
            jnp.linalg.norm(queries_n, axis=-1, keepdims=True), 1e-30
        )
    n = base_n.shape[0]
    nb = -(-n // block_points)
    pad = nb * block_points - n
    bp = jnp.pad(base_n, ((0, pad), (0, 0)))
    blocks = bp.reshape(nb, block_points, -1)
    base_ids = jnp.arange(nb * block_points, dtype=jnp.int32).reshape(
        nb, block_points
    )
    q = queries_n.shape[0]

    # pass 1: the approx scan WITHOUT the exact-rescore epilogue — the
    # winner scores stay in scan precision for the certificate
    def scan_block(carry, blk):
        top_s, top_i = carry
        vecs, ids = blk
        dots = jnp.dot(queries_n, vecs.T, preferred_element_type=jnp.float32)
        sims = jnp.where(ids[None, :] < n, dots, -jnp.inf)
        s, j = jax.lax.approx_max_k(sims, k, recall_target=recall_target)
        i = ids[j]
        merged_s = jnp.concatenate([top_s, s], axis=1)
        merged_i = jnp.concatenate([top_i, i], axis=1)
        ms, sel = jax.lax.top_k(merged_s, k)
        return (ms, jnp.take_along_axis(merged_i, sel, axis=1)), None

    init = (
        jnp.full((q, k), -jnp.inf, jnp.float32),
        jnp.full((q, k), -1, jnp.int32),
    )
    (top_s, top_i), _ = jax.lax.scan(scan_block, init, (blocks, base_ids))

    tau = top_s[:, k - 1]
    # underfull result rows (n < k, all -inf) certify trivially: count
    # against -inf would return n; route them to the fallback instead
    tau = jnp.where(jnp.isfinite(tau), tau, jnp.inf)
    thresh = (tau - eps)[:, None]

    def count_block(carry, blk):
        vecs, ids = blk
        dots = jnp.dot(queries_n, vecs.T, preferred_element_type=jnp.float32)
        ok = (dots >= thresh) & (ids[None, :] < n)
        return carry + jnp.sum(ok, axis=1, dtype=jnp.int32), None

    counts, _ = jax.lax.scan(
        count_block, jnp.zeros((q,), jnp.int32), (blocks, base_ids),
    )

    # returned scores: exact f32 rescore of the winners (membership is
    # certified above; values match the other scan paths' contract)
    safe = jnp.clip(top_i, 0, n - 1)
    ex = jnp.einsum(
        "qkd,qd->qk", base_n[safe], queries_n,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    ex = jnp.where(top_i >= 0, ex, -jnp.inf)
    ts, sel = jax.lax.top_k(ex, k)
    ti = jnp.take_along_axis(top_i, sel, axis=1)
    return ts, ti, counts


_certified_scan_jit = functools.partial(
    jax.jit,
    static_argnames=(
        "k", "block_points", "recall_target", "eps", "normalize_queries"
    ),
)(_certified_scan_impl)


def dense_scan_topk(
    base,
    queries,
    k: int = 10,
    block_points: int = 262144,
    recall_target: float = 0.95,
    exact: bool = False,
    batch_q: int = 2048,
):
    """Speed-of-light full dense scan: blocked bf16 MXU matmuls +
    `approx_max_k` per block + exact merge.

    The TPU-native "C=1 degenerate configuration": on datasets where
    cluster pruning cannot help (near-uniform high-d data), scanning
    everything at matmul rate beats any candidate-generation machinery.
    Returns (cosine dot-similarities desc (q, k), ids). The returned
    similarity VALUES are exact; with exact=False membership is
    approximate at `recall_target` per block.
    """
    base_n = l2_normalize(jnp.asarray(base, jnp.float32))
    qn = l2_normalize(jnp.asarray(queries, jnp.float32))
    outs_s, outs_i = [], []
    for s in range(0, qn.shape[0], batch_q):
        blk = qn[s : s + batch_q]
        ts, ti = _dense_scan_jit(
            base_n, blk, k=k, block_points=min(block_points, base_n.shape[0]),
            recall_target=recall_target, exact=exact,
        )
        outs_s.append(np.asarray(ts))
        outs_i.append(np.asarray(ti))
    return np.concatenate(outs_s), np.concatenate(outs_i)


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int, value=0):
    """Pad an axis up to a multiple (TPU lane/sublane alignment helper)."""
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return np.pad(x, widths, constant_values=value)
