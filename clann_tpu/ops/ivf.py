"""Dense IVF-style cluster probing — the TPU-native fast query path.

This mode has no direct counterpart in the reference: it is what the
reference's clustered design *becomes* when re-thought for the MXU. The
reference minimizes distance computations because its CPU pays per
candidate (SURVEY.md §6 metric); a TPU pays per random memory access and
gets dense FLOPs nearly free. Measured on v5e: per-candidate LSH gathers
run at effective ~0.3-30 GB/s while a batched segment matmul streams at
full MXU rate — so scanning a probed cluster *densely* beats gathering its
LSH candidates until clusters hold millions of points.

Pipeline (all one jitted program):
1. Center distances (Q, C) = one matmul; top `n_probe` clusters per query
   (the batched analog of the reference's sorted cluster scan,
   index.rs:592-616 — with a fixed probe budget instead of the sequential
   ball-bound walk).
2. Invert to cluster-major: per cluster, the (padded) list of queries
   probing it — one lexicographic sort of (cluster, query) pairs.
3. ONE batched einsum (C, cap, d) x (C, S_max, d) -> (C, cap, S_max)
   scores every probed (query, point) pair on the MXU.
4. Per-(cluster, slot) top-k, scattered back to (Q, n_probe, k), final
   merged top-k. Clusters are disjoint, so no dedup is needed.

The delta-recall guarantee of the LSH path does not apply here; instead
the ball-overlap certificate (index.rs:342-361) is evaluated post-hoc for
every unprobed cluster, and `stats.uncertified` counts queries whose
results are not provably exact-complete — callers can re-query those with
a higher n_probe or the LSH path.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from clann_tpu.ops.distances import exact_dot, l2_normalize


class DenseSearchStats(NamedTuple):
    distance_computations: jnp.ndarray  # (Q,) int32 — probed points
    candidates: jnp.ndarray  # (Q,) int32 — == distance_computations here
    clusters_visited: jnp.ndarray  # (Q,) int32 — n_probe minus drops
    dropped_probes: jnp.ndarray  # () int32 — probe-slot capacity overflow
    uncertified: jnp.ndarray  # (Q,) int32 — unprobed clusters whose ball
    #                            overlaps the query's kth-distance sphere
    # per-probe detail for CLUSTER-granularity metrics
    # (reference: search_metrics_cluster rows, sqlite.rs:238-287)
    probed_clusters: Optional[jnp.ndarray] = None  # (Q, P) owner cluster ids
    probed_counts: Optional[jnp.ndarray] = None  # (Q, P) points scanned


def auto_n_probe(n_rows: int) -> int:
    """Default probe budget (in segment rows): ~1.5*sqrt(R), in [8, R]."""
    return int(min(n_rows, max(8, round(np.sqrt(n_rows) * 1.5))))


# Padded bf16 copies of index vectors for the fused Pallas scan, cached per
# index so repeated searches pay no re-padding/transfer. The source array is
# kept in the value to pin its id.
_PALLAS_BASE_CACHE: dict = {}


def pallas_scan_viable(n: int, d: Optional[int] = None) -> bool:
    """Should the fused Pallas scan kernel run at this shape?

    The kernel wins by streaming many dataset blocks through a resident
    query tile; below a few hundred thousand rows the per-dispatch
    pipeline setup dominates and the plain fused scan
    (ops/distances.dense_scan_topk) is strictly faster — measured on v5e
    (scripts/exp_scan_crossover.py -> SCAN_CROSSOVER.json, round 4): the
    kernel runs 0.73-0.85x the plain scan across 50k-400k rows (and 0.1x
    at n=20k/d=25 in round 2's GLOVE25_SHAPE), crossing at 800k and
    winning ~1.2x from there up. `use_pallas` requests below it are re-routed
    to the plain scan unless the caller pins `pallas_auto_route=False`
    (raw-kernel measurement scripts do).
    """
    del d
    return n >= PALLAS_SCAN_MIN_N


# Measured crossover bound (see pallas_scan_viable): smallest swept n
# where the pinned kernel reached 95% of the plain scan (SCAN_CROSSOVER
# .json, Q=2048 protocol, medians of 5 on v5e). Below it the kernel's
# fixed grid-step costs lose to the one-matmul scan (73-85% of scan at
# 50k-400k); at and above it the kernel wins (~1.2x at 1.18M). The sweep
# grid brackets the true crossover in (400k, 800k]; routing takes the
# measured-safe end.
PALLAS_SCAN_MIN_N = 800_000


def pallas_scan_plan(
    n: int, k: int, d: Optional[int] = None
) -> Tuple[int, int, int, int]:
    """(block_n, num_bins, rescore_m, q_tile) for the fused Pallas scan.

    `d` (dataset dimensionality) sizes the kernel's RESIDENT VMEM set:
    the (block_n, q_tile) f32 score tile PLUS TWO buffers of the
    (block_n, dpad) bf16 base tile (Mosaic double-buffers the streamed
    input) must fit VMEM (~128MB/core; 120MB budget below). d=None keeps
    the narrow-vector plan (dpad=128 — glove-100 and below). At d=768
    (MS-MARCO shape, dpad=896) this drops q_tile to 256 AND block_n to
    16384 — with 32k blocks the Mosaic compile itself fails (remote
    compile-helper exit 1, measured on the 1.56M x 768 shard run and
    reproduced at 131k; the 16k plan compiles and runs).

    Bin sizing targets a TOTAL candidate budget across all blocks:
    expected top-k loss from two true neighbors sharing a bin is
    ~(k-1)/(2*total_bins) (measured 0.12% at k=10 with 2368 bins), so
    small datasets with few blocks need MORE bins per block — a fixed
    per-block count cost 4.8% recall at n=30k (one block). Block size 32k
    and 64 bins/block measured fastest at 1.18M x 100 on v5e; at 10M the
    step count dominates and 64k blocks run 2.1x faster (131k blocks are
    SLOWER again — the (block_n, q_tile) f32 score tile outgrows VMEM).
    q_tile is sized so block_n * q_tile * 4B stays ~<= 70MB of VMEM:
    512-query tiles measured ~12% faster than 256 at 32k blocks (fewer
    dataset streams), but 64k x 512 f32 scores would not fit.
    rescore_m swept at the bench scale (scripts/tune_rescore.py):
    {64..16} identical QPS within relay noise and identical recall; the
    exact-rescore row gathers overlap the kernel's HBM streaming, so m
    is NOT a speed knob — 32 keeps id_recall margin (m=10 degrades it).
    """
    if n >= 4_000_000:
        block_n = 65536
    elif n >= 32768:
        block_n = 32768
    else:
        block_n = max(256, 1 << (n - 1).bit_length())
    dpad = 128 if d is None else ((d + 1 + 127) // 128) * 128
    # VMEM model: the f32 score tile is resident once; the bf16 base
    # tile is STREAMED per grid step, so Mosaic double-buffers it —
    # count it twice. 120MB reproduces every measured-working plan
    # bit-for-bit (10M x 100: 64MB score + 2x16MB base = 96MB; nytimes
    # 290k x 256 at q_tile=512: 64 + 2x24 = 112MB — both ran) while
    # rejecting the d=768/32k-block plan (32 + 2x56 = 144MB) whose
    # Mosaic compile dies (compile-helper exit 1, MARCO_SHARD round 4);
    # the 16k-block d=768 plan this yields (16 + 2x28 = 72MB) compiles
    # and runs (measured on the 131k probe and the 1.56M shard).
    budget = 120 * 1024 * 1024
    q_tile = 512
    while q_tile > 256 and block_n * (q_tile * 4 + 2 * dpad * 2) > budget:
        q_tile //= 2
    # floor 1024, not 8192: at d >= ~3584 even 8192-row blocks exceed the
    # budget (8192 * (1024 + 2*4224*2) = 146MB at d=4096) and returning an
    # over-budget plan reproduces the exact compile-helper death the
    # budget exists to prevent
    while block_n > 1024 and block_n * (q_tile * 4 + 2 * dpad * 2) > budget:
        block_n //= 2
    n_blocks = (n + block_n - 1) // block_n
    target = max(2048, 32 * k)
    nb = 1 << (max(
        64, (target + n_blocks - 1) // n_blocks,
        1 << (k - 1).bit_length(),
    ) - 1).bit_length()
    # cap at block_n: per_bin=1 degrades gracefully to an exact scan of
    # tiny datasets/shards (every point is its own bin)
    num_bins = min(nb, block_n)
    rescore_m = min(num_bins, max(32, 1 << (k - 1).bit_length()))
    return block_n, num_bins, rescore_m, q_tile


def _pallas_base(index, block_n: int):
    """Padded bf16 copy with the kernel's bias column at index d.

    The bias column (1.0 per real row; 3.0 on the query side) folds the
    packed kernel's score shift into the matmul — one VPU pass over the
    score tile saved per grid step (ops/pallas/scan_topk._scan_kernel_packed).
    """
    key = (id(index.vectors), block_n)
    hit = _PALLAS_BASE_CACHE.get(key)
    if hit is not None and hit[0] is index.vectors:
        return hit[1]
    n, d = index.vectors.shape
    dpad = ((d + 1 + 127) // 128) * 128  # always >= one spare (bias) dim
    n_pad = ((n + block_n - 1) // block_n) * block_n

    # one fused jit: eager zeros + .at[].set + astype materialize an extra
    # full bf16 cast AND a full copy per .set (OOMs a 16GB chip at the
    # 1.56M x 768 MS-MARCO shard on top of the resident f32 vectors);
    # fused, XLA writes the padded bf16 output once, reading f32 directly
    @functools.partial(jax.jit, static_argnames=("np_", "dp"))
    def _make(v, np_, dp):
        body = jnp.concatenate(
            [
                v.astype(jnp.bfloat16),
                jnp.ones((v.shape[0], 1), jnp.bfloat16),
                jnp.zeros((v.shape[0], dp - v.shape[1] - 1), jnp.bfloat16),
            ],
            axis=1,
        )
        return jnp.pad(body, ((0, np_ - v.shape[0]), (0, 0)))

    base_p = _make(index.vectors, np_=n_pad, dp=dpad)
    if len(_PALLAS_BASE_CACHE) > 4:
        _PALLAS_BASE_CACHE.clear()
    _PALLAS_BASE_CACHE[key] = (index.vectors, base_p)
    return base_p


def _ids_pack_spec(n: int, k: int) -> Tuple[int, int]:
    """(bits, words) for bit-packing (Q, k) ids in [-1, n) into int32.

    The value `n` encodes the empty sentinel (-1). At the glove-100 bench
    shape (n=1,183,514, k=10) this is 21 bits x 10 = 7 words vs 10 —
    result bytes are the marginal cost of the whole dense path through
    the relay link (PULL_RATE.json / exp_kernel_floor.py), so 30% fewer
    id bytes is ~the same fraction off the pull tail.
    """
    bits = max(1, int(n).bit_length())  # represents values 0..n inclusive
    words = (k * bits + 31) // 32
    return bits, words


def _pack_ids_device(ids, *, n: int, bits: int, words: int):
    """Bit-pack (Q, k) int32 ids into (Q, words) uint32, -1 -> n.

    Static k/bits unroll to a handful of shift-OR VPU ops — negligible
    next to the scan, and fused into the same jit so it costs no extra
    relay dispatch (each eager op around a scan call costs ~40ms).
    """
    k = ids.shape[1]
    v = jnp.where(ids < 0, n, ids).astype(jnp.uint32)
    out = [jnp.zeros(ids.shape[:1], jnp.uint32) for _ in range(words)]
    for i in range(k):
        off = i * bits
        w, s = off // 32, off % 32
        out[w] = out[w] | (v[:, i] << s)
        if s + bits > 32:
            out[w + 1] = out[w + 1] | (v[:, i] >> (32 - s))
    return jnp.stack(out, axis=1)


def _unpack_ids_host(words_np: np.ndarray, *, n: int, bits: int, k: int):
    """Exact host-side inverse of _pack_ids_device (numpy, no device)."""
    w64 = words_np.astype(np.uint64)
    mask = np.uint64((1 << bits) - 1)
    ids = np.empty((words_np.shape[0], k), np.int64)
    for i in range(k):
        off = i * bits
        w, s = off // 32, off % 32
        val = w64[:, w] >> np.uint64(s)
        if s + bits > 32:
            val = val | (w64[:, w + 1] << np.uint64(32 - s))
        ids[:, i] = (val & mask).astype(np.int64)
    return np.where(ids == n, -1, ids).astype(np.int32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_real", "k", "rescore_m", "num_bins", "block_n", "q_tile",
        "interpret", "bits", "words",
    ),
)
def _pallas_scan_ids_packed(
    base_p, vectors, blk, *, n_real, k, rescore_m, num_bins, block_n,
    q_tile, interpret, bits, words,
):
    from clann_tpu.ops.pallas.scan_topk import fused_scan_topk_e2e

    _, ti = fused_scan_topk_e2e(
        base_p, vectors, blk, n_real=n_real, k=k, rescore_m=rescore_m,
        num_bins=num_bins, block_n=block_n, q_tile=q_tile,
        normalize=True, biased=True, interpret=interpret,
    )
    return _pack_ids_device(ti, n=n_real, bits=bits, words=words)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "block_points", "recall_target", "exact", "bits", "words"
    ),
)
def _plain_scan_ids_packed(
    vectors, blk, *, k, block_points, recall_target, exact, bits, words,
):
    from clann_tpu.ops.distances import _dense_scan_jit

    _, ti = _dense_scan_jit(
        vectors, blk, k=k, block_points=block_points,
        recall_target=recall_target, exact=exact, normalize_queries=True,
    )
    return _pack_ids_device(ti, n=vectors.shape[0], bits=bits, words=words)


def scan_search(
    index,
    queries,
    k: Optional[int] = None,
    recall_target: float = 0.95,
    exact: bool = False,
    batch_q: int = 2048,
    use_pallas: bool = False,
    pull: str = "packed",
    pallas_auto_route: bool = True,
    exact_certify: bool = True,
    exact_eps: float = 1e-6,
):
    """Full dense scan of the index vectors (the C=1 full-probe case).

    Blocked bf16 MXU matmuls + hardware `approx_max_k` (see
    ops/distances.dense_scan_topk), or the fused Pallas kernel when
    use_pallas (ops/pallas/scan_topk.py). Index vectors are already
    device-resident, so repeated calls pay no host transfer. Returns
    (distances ascending, ids, DenseSearchStats).

    pull: what crosses the device->host link per call.
      "packed" (default): distances and ids in one bitcast-packed int32
        transfer (both arrays, one round trip).
      "ids": ids only — HALF the result bytes; returned distances are
        None. The ann-benchmarks protocol unit of delivery (and this
        harness's measured decomposition: at 1.18M x 10k queries the
        compute path runs at its VMEM floor, ~69ms, while the packed
        result pull costs ~46ms through the host link — result BYTES are
        the marginal cost). Callers that need distances reconstruct them
        exactly from the corpus (sims are deterministic per id), or use
        id-based metrics.
      "ids-packed": ids bit-packed to ceil(log2(n+1)) bits on-device
        (inside the scan's own jit — zero extra dispatches), unpacked
        exactly on the host: 7 int32 words/query instead of 10 at the
        1.18M bench shape. Same return contract as "ids".
    pallas_auto_route: with use_pallas, fall back to the plain scan at
        shapes below the kernel's measured crossover (pallas_scan_viable)
        instead of running the kernel where it loses 10x to its own
        fallback. False pins the kernel (raw-kernel measurements).
    exact_certify: with exact=True (and the default pull), replace the
        direct per-block lax.top_k sort — the measured 8x exact-path
        floor — with the threshold-certificate algorithm
        (ops/distances._certified_scan_impl): approx winners + a
        selection-free counting pass; only queries whose certificate
        fails (count != k) re-run the direct sort. Results are exact
        either way; failures are counted in stats.uncertified.
        exact_eps is the certificate's precision margin (see the impl's
        soundness note). False pins the direct sort.
    """
    from clann_tpu.ops.distances import _dense_scan_jit

    k = (index.config.k if k is None else k)
    # preserve device residency: np.asarray on a device array would pull
    # the whole query set back through the (slow) host transfer path
    q = queries if isinstance(queries, jnp.ndarray) else jnp.asarray(
        np.asarray(queries, np.float32)
    )
    # normalization happens INSIDE each jitted scan body — as a separate
    # eager call it costs a full ~40ms relay dispatch per search
    qn = q.astype(jnp.float32)
    if qn.ndim == 1:
        qn = qn[None, :]
    n = index.vectors.shape[0]
    if qn.shape[0] == 0:
        # ids-only pull modes contract: distances are None (same as the
        # non-empty path), so callers branching on `d is None` behave
        # uniformly
        empty_d = (None if pull in ("ids", "ids-packed")
                   else np.zeros((0, k), np.float32))
        return (
            empty_d,
            np.zeros((0, k), np.int32),
            DenseSearchStats(
                distance_computations=np.zeros(0, np.int32),
                candidates=np.zeros(0, np.int32),
                clusters_visited=np.zeros(0, np.int32),
                dropped_probes=np.int32(0),
                uncertified=np.zeros(0, np.int32),
            ),
        )

    if use_pallas and pallas_auto_route and not pallas_scan_viable(
        n, d=int(index.vectors.shape[1])
    ):
        use_pallas = False  # below the measured crossover; plain scan wins

    bits = words = None
    if pull == "ids-packed":
        bits, words = _ids_pack_spec(n, k)
    if use_pallas:
        from clann_tpu.ops.pallas.scan_topk import fused_scan_topk_e2e

        # packed single-pass kernel sweep on v5e at 1.18M x 100 (see
        # PERFORMANCE.md): 32k-point blocks with 64 bins measured 62.8ms
        # per 10k queries (159k QPS candidate generation) vs 142ms for the
        # original 3-pass kernel at 16k/128; the WHOLE path (kernel +
        # selection + exact rescore) runs as one jit — separate dispatches
        # through the ~40ms relay diluted the kernel win to nothing
        block_n, num_bins, rescore_m, q_tile = pallas_scan_plan(
            n, k, d=int(index.vectors.shape[1])
        )
        base_p = _pallas_base(index, block_n)
        # Mosaic kernels need real TPU hardware; off-TPU (CI, tests) run
        # the same kernel interpreted, like every other Pallas entry point
        interp = jax.default_backend() != "tpu"
        outs_s, outs_i = [], []
        for s in range(0, qn.shape[0], batch_q):
            blk = qn[s : s + batch_q]
            if pull == "ids-packed":
                outs_i.append(_pallas_scan_ids_packed(
                    base_p, index.vectors, blk,
                    n_real=n, k=k, rescore_m=rescore_m,
                    num_bins=num_bins, block_n=block_n, q_tile=q_tile,
                    interpret=interp, bits=bits, words=words,
                ))
                continue
            ts, ti = fused_scan_topk_e2e(
                base_p, index.vectors, blk,
                n_real=n, k=k, rescore_m=rescore_m,
                num_bins=num_bins, block_n=block_n, q_tile=q_tile,
                normalize=True, biased=True, interpret=interp,
            )
            outs_s.append(ts)
            outs_i.append(ti)
    else:
        # bound the transient (batch, block) score matrix to ~4GB; measured
        # optimum at glove scale: one 10k-query call with ~100k-point blocks
        # (120k QPS vs 70k at 2k-query batches)
        block_points = min(
            262144, n,
            max(32768, int(4e9 / (4 * min(batch_q, qn.shape[0])))),
        )
        outs_s, outs_i, uncert_rows = [], [], []
        n_fallback = 0
        # certified exact (VERDICT r4 #7): the direct exact path's
        # per-block lax.top_k sort is the measured 8x floor; the
        # threshold-certificate design (distances._certified_scan_impl)
        # runs the APPROX scan + a selection-free counting pass and
        # re-runs only uncertified queries (typically a few percent)
        # through the direct sort. Bit-equal results (tested), counted in
        # stats.uncertified.
        certify = exact and exact_certify and pull == "packed"
        for s in range(0, qn.shape[0], batch_q):
            blk = qn[s : s + batch_q]
            if pull == "ids-packed":
                outs_i.append(_plain_scan_ids_packed(
                    index.vectors, blk, k=k, block_points=block_points,
                    recall_target=recall_target, exact=exact,
                    bits=bits, words=words,
                ))
                continue
            if certify:
                from clann_tpu.ops.distances import _certified_scan_jit

                ts, ti, cts = _certified_scan_jit(
                    index.vectors, blk, k=k, block_points=block_points,
                    recall_target=max(recall_target, 0.95), eps=exact_eps,
                    normalize_queries=True,
                )
                bad = np.asarray(cts) != k
                uncert_rows.append(bad.astype(np.int32))
                if bad.any():
                    n_fallback += int(bad.sum())
                    bidx = jnp.asarray(np.nonzero(bad)[0])
                    es, ei = _dense_scan_jit(
                        index.vectors, blk[bidx], k=k,
                        block_points=block_points,
                        recall_target=recall_target, exact=True,
                        normalize_queries=True,
                    )
                    ts = ts.at[bidx].set(es)
                    ti = ti.at[bidx].set(ei)
                outs_s.append(ts)
                outs_i.append(ti)
                continue
            ts, ti = _dense_scan_jit(
                index.vectors, blk, k=k, block_points=block_points,
                recall_target=recall_target, exact=exact,
                normalize_queries=True,
            )
            # keep device arrays; materialize once at the end so batches
            # pipeline asynchronously instead of syncing per batch
            outs_s.append(ts)
            outs_i.append(ti)
    if pull in ("ids", "ids-packed"):
        # one host pull, then (packed mode only) exact host-side unpack;
        # both modes share the stats/return contract: distances are None
        raw = np.asarray(jnp.concatenate(outs_i, axis=0))
        ids = (_unpack_ids_host(raw, n=n, bits=bits, k=k)
               if pull == "ids-packed" else raw)
        Q = ids.shape[0]
        dc = np.full(Q, n, np.int32)
        stats = DenseSearchStats(
            distance_computations=dc,
            candidates=dc,
            clusters_visited=np.full(Q, index.n_clusters, np.int32),
            dropped_probes=np.int32(0),
            uncertified=np.zeros(Q, np.int32),
        )
        return None, ids, stats
    # ONE host pull: bitcast the f32 sims into an INT32 result tensor so
    # sims and ids come back in a single transfer round trip (each
    # separate np.asarray pays the relay's fixed latency). The carrier
    # must be int32, not f32: the TPU flushes denormal f32 to zero and
    # canonicalizes NaN patterns in any copy/concat pass, so int32 ids
    # < 2^23 bitcast into an f32 tensor come back as 0.
    packed = jnp.concatenate(
        [
            jnp.concatenate(
                [jax.lax.bitcast_convert_type(ts, jnp.int32), ti], axis=1
            )
            for ts, ti in zip(outs_s, outs_i)
        ],
        axis=0,
    )
    flat = np.asarray(packed)
    dots = np.ascontiguousarray(flat[:, :k]).view(np.float32)
    ids = flat[:, k:]
    dists = np.where(ids >= 0, np.clip(1.0 - dots, 0.0, 2.0), np.inf)
    Q = ids.shape[0]
    dc = np.full(Q, n, np.int32)
    # certified-exact: 1 marks a query whose certificate failed (count !=
    # k — possible approx miss or an eps near-tie) and that was re-run
    # through the direct exact sort; its result is exact either way
    uncert = (
        np.concatenate(uncert_rows)
        if not use_pallas and uncert_rows
        else np.zeros(Q, np.int32)
    )
    stats = DenseSearchStats(
        distance_computations=dc,
        candidates=dc,
        clusters_visited=np.full(Q, index.n_clusters, np.int32),
        dropped_probes=np.int32(0),
        uncertified=uncert,
    )
    return dists, ids, stats


def _dedup_topk_np(cat_s: np.ndarray, cat_i: np.ndarray, k: int):
    """Host-side per-row top-k with id dedup (best sim per id kept).

    cat_s/cat_i: (Q, M) candidate sims/ids, -1 = empty. Used by the
    adaptive wave merge, where re-probed rows (last-wave padding) can
    surface the same id twice."""
    o = np.argsort(-cat_s, axis=1, kind="stable")
    s = np.take_along_axis(cat_s, o, axis=1)
    i = np.take_along_axis(cat_i, o, axis=1)
    # group equal ids (stable keeps sim-desc order within a group), mask
    # every occurrence after the first, then restore sim order
    o2 = np.argsort(i, axis=1, kind="stable")
    i2 = np.take_along_axis(i, o2, axis=1)
    dup2 = np.zeros_like(i2, bool)
    dup2[:, 1:] = (i2[:, 1:] == i2[:, :-1]) & (i2[:, 1:] >= 0)
    dup = np.zeros_like(dup2)
    np.put_along_axis(dup, o2, dup2, axis=1)
    s = np.where(dup, -1.0, s)
    i = np.where(dup, -1, i)
    o3 = np.argsort(-s, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(s, o3, axis=1), np.take_along_axis(i, o3, axis=1)


def auto_probe_cap(n_queries: int, n_probe: int, n_clusters: int) -> int:
    """Slot capacity per cluster: 4x the average load, padded to 8."""
    avg = n_queries * n_probe / max(1, n_clusters)
    cap = int(max(8, min(n_queries, 4 * avg)))
    return (cap + 7) // 8 * 8


def ivf_search_batch_impl(
    index,
    queries_n: jnp.ndarray,
    *,
    k: int,
    n_probe: int,
    probe_cap: int,
    probe_rows: "Optional[jnp.ndarray]" = None,
    approx_topk: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, DenseSearchStats]:
    """Dense probe search. Returns (sims desc (Q, k), global ids, stats).

    probe_rows: optional explicit (Q, P) segment-row ids to probe (used by
    the adaptive wave driver); when absent the top n_probe rows by center
    distance are probed. Traceable; see `ivf_search_batch` for the jitted
    entry.

    approx_topk: use the TPU's hardware-binned `approx_max_k` for the
    per-slot reduction (~3x faster than exact `top_k` at seg_cap=4096;
    each true neighbor survives the slot reduction w.p. >= 0.98).
    """
    Q, d = queries_n.shape
    C = index.seg_centers.shape[0]  # number of segment ROWS
    S_max = index.seg_vectors.shape[1]
    cap = probe_cap

    seg_sizes = index.seg_sizes  # (C,) real points per row

    # 1. rank segment rows per query (index.rs:592-616 analog; rows of one
    # cluster share a center so row ranking refines cluster ranking)
    center_dist = jnp.clip(
        1.0 - exact_dot(queries_n, index.seg_centers.T), 0.0, 2.0
    )
    if probe_rows is None:
        P = min(n_probe, C)
        neg_d, probe = jax.lax.top_k(-center_dist, P)  # (Q, P)
        probe = probe.astype(jnp.int32)
    else:
        probe = jnp.asarray(probe_rows, jnp.int32)
        P = probe.shape[1]

    # 2. invert to cluster-major padded query lists
    flat_c = probe.reshape(-1)
    flat_q = jnp.repeat(jnp.arange(Q, dtype=jnp.int32), P)
    flat_p = jnp.tile(jnp.arange(P, dtype=jnp.int32), (Q,))
    sc, sq, sp = jax.lax.sort((flat_c, flat_q, flat_p), num_keys=1)
    crange = jnp.arange(C, dtype=jnp.int32)
    cl_start = jnp.searchsorted(sc, crange, side="left").astype(jnp.int32)
    cl_end = jnp.searchsorted(sc, crange, side="right").astype(jnp.int32)
    counts = cl_end - cl_start  # (C,) probes per cluster
    jj = jnp.arange(cap, dtype=jnp.int32)
    take = jnp.clip(cl_start[:, None] + jj[None, :], 0, Q * P - 1)
    slot_valid = jj[None, :] < counts[:, None]  # (C, cap)
    qidx = jnp.where(slot_valid, sq[take], Q)  # Q == dump row
    pidx = jnp.where(slot_valid, sp[take], 0)
    dropped = jnp.sum(jnp.maximum(counts - cap, 0))

    # 3+4. batched segment scoring on the MXU, chunked over row groups so
    # the transient (rows, cap, S_max) score tensor stays within a fixed
    # memory budget at any probe depth; each group immediately reduces its
    # scores to a per-slot top-k.
    kk = min(k, S_max)
    qpad = jnp.concatenate(
        [queries_n, jnp.zeros((1, d), queries_n.dtype)], axis=0
    )
    qvecs = qpad[qidx]  # (C, cap, d); dump row scores zeros
    col_iota = jnp.arange(S_max, dtype=jnp.int32)

    score_budget = 1 << 30  # 1 GiB of f32 scores per group
    group = max(1, min(C, score_budget // max(1, cap * S_max * 4)))
    n_groups = -(-C // group)
    padC = n_groups * group

    def pad_rows(x, fill):
        return jnp.pad(
            x,
            [(0, padC - C)] + [(0, 0)] * (x.ndim - 1),
            constant_values=fill,
        )

    g_qvecs = pad_rows(qvecs, 0).reshape(n_groups, group, cap, d)
    g_segv = pad_rows(index.seg_vectors, 0).reshape(n_groups, group, S_max, d)
    g_sizes = pad_rows(seg_sizes, 0).reshape(n_groups, group)
    g_valid = pad_rows(slot_valid, False).reshape(n_groups, group, cap)
    g_ids = pad_rows(index.seg_ids, -1).reshape(n_groups, group, S_max)

    def score_group(args):
        qv, sv, sz, sl_valid, ids = args
        dots = jnp.einsum(
            "cqd,csd->cqs",
            qv,
            sv,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (group, cap, S_max)
        sims = jnp.clip((dots + 1.0) * 0.5, 0.0, 1.0)  # cosine.hpp:19-23
        cv = col_iota[None, :] < sz[:, None]
        sims = jnp.where(sl_valid[:, :, None] & cv[:, None, :], sims, -1.0)
        if approx_topk and S_max >= 128 and kk * 8 <= S_max:
            ts, tj = jax.lax.approx_max_k(sims, kk, recall_target=0.98)
        else:
            ts, tj = jax.lax.top_k(sims, kk)
        ti = jnp.take_along_axis(
            jnp.broadcast_to(ids[:, None, :], tj.shape[:2] + (S_max,)), tj, axis=2
        )
        return ts, ti

    top_s, top_ids = jax.lax.map(
        score_group, (g_qvecs, g_segv, g_sizes, g_valid, g_ids)
    )
    top_s = top_s.reshape(padC, cap, kk)[:C]
    top_ids = top_ids.reshape(padC, cap, kk)[:C]
    if kk < k:
        pad = k - kk
        top_s = jnp.pad(top_s, ((0, 0), (0, 0), (0, pad)), constant_values=-1.0)
        top_ids = jnp.pad(top_ids, ((0, 0), (0, 0), (0, pad)), constant_values=-1)
    out_s = jnp.full((Q + 1, P, k), -1.0, jnp.float32).at[qidx, pidx].set(top_s)
    out_i = jnp.full((Q + 1, P, k), -1, jnp.int32).at[qidx, pidx].set(top_ids)
    flat_s = out_s[:Q].reshape(Q, P * k)
    flat_i = out_i[:Q].reshape(Q, P * k)
    final_s, sel = jax.lax.top_k(flat_s, k)
    final_i = jnp.take_along_axis(flat_i, sel, axis=1)
    final_i = jnp.where((final_s < 0) | (final_i < 0), -1, final_i)
    final_s = jnp.maximum(final_s, 0.0)

    # stats + ball-overlap certificate (index.rs:342-361 post-hoc,
    # evaluated per segment row with the owner cluster's radius).
    # probed_ok: which (query, probe-slot) pairs were ACTUALLY scanned —
    # slots beyond a cluster's capacity were dropped, and counting them as
    # probed would certify results that never saw their best cluster.
    probed_ok = jnp.zeros((Q + 1, P), bool).at[qidx, pidx].set(True)[:Q]
    probed_sizes = seg_sizes[probe] * probed_ok  # (Q, P)
    dc = jnp.sum(probed_sizes, axis=1).astype(jnp.int32)
    kth_dist = jnp.where(
        final_i[:, k - 1] >= 0, 2.0 * (1.0 - final_s[:, k - 1]), jnp.inf
    )
    min_possible = center_dist - index.seg_radii[None, :]  # (Q, C)
    overlapping = min_possible <= kth_dist[:, None]  # (Q, C)
    is_probed = jnp.zeros((Q, C), bool).at[
        jnp.arange(Q)[:, None], probe
    ].max(probed_ok)
    uncertified = jnp.sum(
        overlapping & ~is_probed & (seg_sizes[None, :] > 0), axis=1
    ).astype(jnp.int32)

    stats = DenseSearchStats(
        distance_computations=dc,
        candidates=dc,
        clusters_visited=jnp.sum(probed_ok, axis=1).astype(jnp.int32),
        dropped_probes=dropped.astype(jnp.int32),
        uncertified=uncertified,
        probed_clusters=index.seg_cluster[probe],
        probed_counts=probed_sizes.astype(jnp.int32),
    )
    return final_s, final_i, stats


ivf_search_batch = functools.partial(
    jax.jit, static_argnames=("k", "n_probe", "probe_cap", "approx_topk")
)(ivf_search_batch_impl)


@functools.partial(jax.jit, static_argnames=("k", "probe_cap", "approx_topk"))
def _probe_wave(index, queries_n, probe_rows, *, k: int, probe_cap: int,
                approx_topk: bool = True):
    return ivf_search_batch_impl(
        index, queries_n, k=k, n_probe=probe_rows.shape[1],
        probe_cap=probe_cap, probe_rows=probe_rows, approx_topk=approx_topk,
    )


def adaptive_dense_search(
    index,
    queries,
    k: Optional[int] = None,
    wave: int = 16,
    max_waves: Optional[int] = None,
    probe_cap: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray, DenseSearchStats]:
    """Adaptive dense probing: waves of segment rows until the ball-overlap
    certificate retires each query.

    The dense-mode analog of the reference's sequential cluster scan with
    early termination (index.rs:331-439): rows are visited in center-
    distance order, `wave` rows per step, and a query stops as soon as the
    nearest unvisited row cannot contain a better neighbor
    (dist(q, center) - radius > kth_dist, index.rs:342-361 — including its
    documented non-metric caveat). Run to completion this is exact up to
    that caveat; on clusterable data it probes far fewer rows than a fixed
    n_probe tuned for worst-case recall.
    """
    cfg = index.config
    k = cfg.k if k is None else k
    R = int(index.seg_centers.shape[0])
    # a wave never needs to exceed the row count; this also keeps the
    # last-wave padding (drawn from wave 0) disjoint from the wave itself
    wave = min(wave, R)
    max_waves = max_waves or -(-R // wave)

    q = queries if isinstance(queries, jnp.ndarray) else jnp.asarray(
        np.asarray(queries, np.float32)
    )
    qn = l2_normalize(q.astype(jnp.float32))
    if qn.ndim == 1:
        qn = qn[None, :]
    Q = qn.shape[0]
    cap = probe_cap or cfg.probe_cap or auto_probe_cap(Q, wave, R)

    center_dist = np.asarray(
        jnp.clip(1.0 - exact_dot(qn, index.seg_centers.T), 0.0, 2.0)
    )
    order = np.argsort(center_dist, axis=1).astype(np.int32)  # (Q, R)
    radii = np.asarray(index.seg_radii)
    seg_sizes = np.asarray(index.seg_sizes)

    top_s = np.zeros((Q, k), np.float32)
    top_i = np.full((Q, k), -1, np.int32)
    done = np.zeros(Q, bool)
    dc = np.zeros(Q, np.int64)
    visited = np.zeros(Q, np.int32)
    waves_run = 0
    for w in range(max_waves):
        lo = w * wave
        hi = min(lo + wave, R)
        probe_w = order[:, lo:hi]
        n_real_w = probe_w.shape[1]
        if n_real_w < wave:
            # pad the last partial wave with DISTINCT already-probed rows
            # (wave 0 is always full): edge-repeating a row would put the
            # same (query, row) probe in several slots — inflating that
            # cluster's load beyond Q (the capacity-retry ceiling) and
            # returning duplicate ids; re-probing old rows is idempotent
            # under the id-dedup merge
            probe_w = np.concatenate(
                [probe_w, order[:, : wave - n_real_w]], axis=1
            )
        # a wave with capacity overflow silently drops (query, row) probes
        # that are never revisited — rerun the whole wave with doubled
        # capacity until nothing drops (cap == Q can never drop), so the
        # 'run to completion this is exact' contract actually holds
        cap_w = cap
        while True:
            sims, ids, wst = _probe_wave(
                index, qn, jnp.asarray(probe_w), k=k, probe_cap=cap_w
            )
            if cap_w >= Q or int(wst.dropped_probes) == 0:
                break
            cap_w = min(Q, 2 * cap_w)
        sims, ids = np.asarray(sims), np.asarray(ids)
        waves_run += 1
        active = ~done
        # merge wave results for active queries. Waves probe disjoint
        # rows, but the last wave's edge padding duplicates a row within
        # the wave — merge through an id-dedup to keep the top-k distinct.
        cat_s = np.concatenate([top_s, np.where(active[:, None], sims, -1)], 1)
        cat_i = np.concatenate([top_i, np.where(active[:, None], ids, -1)], 1)
        top_s, top_i = _dedup_topk_np(cat_s, cat_i, k)
        dc += np.where(
            active, seg_sizes[probe_w[:, :n_real_w]].sum(axis=1), 0
        )
        visited += np.where(active, hi - lo, 0)
        # certificate: can the next unvisited row improve the k-th?
        if hi >= R:
            done[:] = True
        else:
            nxt = order[:, hi]
            kth_dist = np.where(
                top_i[:, k - 1] >= 0, 2.0 * (1.0 - top_s[:, k - 1]), np.inf
            )
            min_possible = (
                center_dist[np.arange(Q), nxt] - radii[nxt]
            )
            done |= min_possible > kth_dist
        if done.all():
            break

    dists = np.where(top_i >= 0, 2.0 * (1.0 - top_s), np.inf)
    stats = DenseSearchStats(
        distance_computations=dc.astype(np.int32),
        candidates=dc.astype(np.int32),
        clusters_visited=visited,
        dropped_probes=np.int32(0),
        uncertified=(~done).astype(np.int32),
    )
    return dists, top_i, stats


def dense_search(
    index,
    queries,
    k: Optional[int] = None,
    n_probe: Optional[int] = None,
    probe_cap: Optional[int] = None,
    batch_size: int = 2048,
    approx_topk: bool = True,
) -> Tuple[np.ndarray, np.ndarray, DenseSearchStats]:
    """Full dense search over numpy queries; returns distances ascending."""
    if index.seg_vectors is None:
        raise ValueError(
            "index was built without the dense layout "
            "(config.dense_layout=False); use the lsh search path"
        )
    cfg = index.config
    k = cfg.k if k is None else k
    C = index.seg_centers.shape[0]  # segment rows
    if n_probe is None:
        n_probe = cfg.n_probe or auto_n_probe(C)

    q = queries if isinstance(queries, jnp.ndarray) else jnp.asarray(
        np.asarray(queries, np.float32)
    )
    if q.ndim == 1:
        q = q[None, :]
    qn = l2_normalize(q.astype(jnp.float32))

    out_s, out_i, out_st = [], [], []
    for start in range(0, qn.shape[0], batch_size):
        block = qn[start : start + batch_size]
        pad = 0
        if block.shape[0] < batch_size and qn.shape[0] > batch_size:
            pad = batch_size - block.shape[0]
            # repeat the last real query: zero pad rows are equidistant
            # to every center and pile max-contention probes onto the
            # first rows, inflating dropped_probes and burning MXU work
            block = jnp.pad(block, ((0, pad), (0, 0)), mode="edge")
        cap = probe_cap or cfg.probe_cap or auto_probe_cap(
            block.shape[0], min(n_probe, C), C
        )
        sims, ids, stats = ivf_search_batch(
            index, block, k=k, n_probe=n_probe, probe_cap=cap,
            approx_topk=approx_topk,
        )
        if pad:
            sims, ids = sims[:-pad], ids[:-pad]
            stats = DenseSearchStats(
                *(s if (s is None or np.ndim(s) == 0) else s[:-pad]
                  for s in stats)
            )
        out_s.append(np.asarray(sims))
        out_i.append(np.asarray(ids))
        out_st.append(stats)

    sims = np.concatenate(out_s, axis=0)
    ids = np.concatenate(out_i, axis=0)
    stats = DenseSearchStats(
        np.concatenate([np.asarray(s.distance_computations) for s in out_st]),
        np.concatenate([np.asarray(s.candidates) for s in out_st]),
        np.concatenate([np.asarray(s.clusters_visited) for s in out_st]),
        np.sum([int(s.dropped_probes) for s in out_st]),
        np.concatenate([np.asarray(s.uncertified) for s in out_st]),
        np.concatenate([np.asarray(s.probed_clusters) for s in out_st])
        if out_st[0].probed_clusters is not None else None,
        np.concatenate([np.asarray(s.probed_counts) for s in out_st])
        if out_st[0].probed_counts is not None else None,
    )
    dists = 2.0 * (1.0 - sims)
    dists = np.where(ids < 0, np.inf, dists)
    return dists, ids, stats
