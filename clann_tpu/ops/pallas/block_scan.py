"""Block-probed fused scan: IVF economics at streaming (gather-free) cost.

The measured inversion that shapes every dense path here (PERFORMANCE.md):
cutting distance computations 38x via IVF probing LOSES to the full fused
scan because probed-segment row gathers pay ~40-50ns per lane while the
scan streams at HBM bandwidth. This module removes the gathers from the
probing idea entirely by probing at the SCAN KERNEL'S OWN granularity —
whole contiguous point blocks:

  1. the dataset is laid out cluster-major (GMM assignment order), so each
     block_n-row block is geometrically coherent; a per-block centroid c
     and radius r = max ||x - c|| give the Cauchy-Schwarz bound
     q . x <= q . c + r for every member (||q|| = 1),
  2. queries are ranked against all block centroids with ONE tiny matmul
     and sorted by their best block, so each q_tile is coherent,
  3. each tile probes only its top-B blocks: a Pallas kernel with a
     scalar-prefetched (n_tiles, B) block-id table DMAs exactly those
     blocks (pltpu.PrefetchScalarGridSpec data-dependent index_map) and
     runs the packed single-pass score/top-bin reduction of
     scan_topk._scan_kernel_packed on each,
  4. winners are exactly re-scored in PERMUTED space (positions, not ids),
     so only the final k results pay an id-translation gather.

Score-tile traffic drops by n_blocks / B versus the full fused scan while
keeping its zero-gather streaming profile. The block bound also yields the
certificate stat: an unprobed block with q . c + r above the returned k-th
similarity could hide a better neighbor (stats.uncertified).

This is the TPU-shaped synthesis of the reference's two big ideas —
clustered search pruning (index.rs:311-439's ball-ordered cluster walk)
and dense SIMD scanning (math.hpp) — under this chip's cost model.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from clann_tpu.ops.pallas.scan_topk import _scan_kernel_packed


class BlockLayout(NamedTuple):
    """Cluster-major blocked copy of an index's vectors (device arrays)."""

    base_bf16: jnp.ndarray  # (n_pad, dpad) bf16, bias col 1.0 at [:, d]
    base_f32: jnp.ndarray  # (n_pad, d) f32 permuted, pad rows zero
    gids: jnp.ndarray  # (n_pad,) int32 global ids, -1 on pad rows
    centroids: jnp.ndarray  # (n_blocks, d) f32 block centroids (means)
    radii: jnp.ndarray  # (n_blocks,) f32 max member distance to centroid
    reps: jnp.ndarray  # (n_blocks, R, d) f32 ranking representatives
    block_rows: jnp.ndarray  # (n_blocks,) int32 real rows per block
    block_n: int
    d: int

    @property
    def n_blocks(self) -> int:
        return self.centroids.shape[0]


def build_block_layout(
    vectors, assignment, block_n: int, num_reps: int = 64, seed: int = 0
) -> BlockLayout:
    """Cluster-major permutation + per-block geometry.

    `vectors` must already be L2-normalized (they are in ClusteredIndex).
    Blocks cut the cluster-major order at fixed block_n strides, so a block
    holds one or a few whole/partial clusters.

    Two geometric summaries per block serve two different jobs:
    - `centroids`/`radii` give the SOUND Cauchy-Schwarz bound
      q . x <= q . c + r (certificate / uncertified stat) — but a block
      spanning several clusters is multi-modal, so the bound ranks poorly
      (measured: covers only ~0.48 of true neighbors at top-4 on 16-mode
      data where the oracle covers 0.94).
    - `reps` — `num_reps` uniformly-sampled member rows — rank blocks by
      max_r q . rep_r, a sharp multi-modal proxy of the block's true best
      (measured 0.87/0.99 coverage at top-4/top-8 vs the oracle's
      0.94/1.00; one (Q, n_blocks * R) matmul, negligible at any scale).
    """
    x = jnp.asarray(vectors, jnp.float32)
    n, d = x.shape
    order = jnp.argsort(jnp.asarray(assignment, jnp.int32), stable=True)
    n_pad = ((n + block_n - 1) // block_n) * block_n
    n_blocks = n_pad // block_n

    xp = jnp.zeros((n_pad, d), jnp.float32).at[:n].set(x[order])
    gids = jnp.full((n_pad,), -1, jnp.int32).at[:n].set(
        order.astype(jnp.int32)
    )
    real = (gids >= 0).reshape(n_blocks, block_n)
    rows = real.sum(axis=1).astype(jnp.int32)
    xb = xp.reshape(n_blocks, block_n, d)
    cent = xb.sum(axis=1) / jnp.maximum(rows, 1)[:, None].astype(jnp.float32)
    dist = jnp.linalg.norm(xb - cent[:, None, :], axis=-1)
    radii = jnp.max(jnp.where(real, dist, 0.0), axis=1)

    # ranking representatives: uniform sample of REAL rows per block
    # (pad rows are zero vectors — sampling them would only lower a
    # block's score, so clamp the draw to the real prefix)
    R = max(1, min(num_reps, block_n))
    key = jax.random.PRNGKey(seed)
    draw = jax.random.randint(key, (n_blocks, R), 0, 1 << 30)
    draw = draw % jnp.maximum(rows, 1)[:, None]
    reps = jnp.take_along_axis(xb, draw[:, :, None], axis=1)

    # WITHIN-BLOCK shuffle of the stored rows: cluster-major order packs a
    # query's true neighbors into adjacent rows, and the scan kernel's
    # bins are consecutive per_bin runs that report one winner each —
    # measured recall collapsed to 0.89 (vs 0.997 for the plain scan's
    # unordered rows) at full probing. A fixed per-block permutation
    # restores uniform bin occupancy (neighbor pair shares a bin w.p.
    # ~1/num_bins) while keeping block membership — and therefore the
    # centroid/radius/rep geometry above — intact. Applied AFTER reps
    # sampling, which relies on real rows forming a prefix.
    local = jnp.argsort(
        jax.random.uniform(jax.random.PRNGKey(seed + 1), (n_blocks, block_n)),
        axis=1,
    )
    shuf = (
        jnp.arange(n_blocks, dtype=jnp.int32)[:, None] * block_n
        + local.astype(jnp.int32)
    ).reshape(-1)
    xp = xp[shuf]
    gids = gids[shuf]

    dpad = ((d + 1 + 127) // 128) * 128
    bb = jnp.zeros((n_pad, dpad), jnp.bfloat16)
    bb = bb.at[:, :d].set(xp.astype(jnp.bfloat16))
    bb = bb.at[:, d].set(jnp.where(gids >= 0, 1.0, 0.0).astype(jnp.bfloat16))
    return BlockLayout(bb, xp, gids, cent, radii, reps, rows, block_n, d)


def auto_block_probe(n_blocks: int) -> int:
    """Default probe budget: ~quarter of the blocks, at least 2.

    At 1.18M x 100 (37 blocks) this is ~4x less score traffic than the
    full scan; at 10M (153 x 64k) ~4x as well. Raise for hard (flat,
    collision-heavy) data, lower for strongly clustered corpora.
    """
    return min(n_blocks, max(2, round(n_blocks * 0.25)))


def _valid_floor() -> jnp.ndarray:
    # real packed scores are bitcast(dot + 3.0) with dot >= ~-1 => >= ~2.0
    # => int >= 0x40000000; pad rows carry bias 0 => packed < 2^14. The
    # floor at bitcast(1.0) keeps every real score, drops every pad.
    return jnp.int32(0x3F800000)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "rescore_m", "num_bins", "block_n", "q_tile", "n_probe",
        "interpret",
    ),
)
def block_scan_topk_e2e(
    layout: BlockLayout,
    queries_f32: jnp.ndarray,  # (Q, d), normalized inside
    *,
    k: int,
    n_probe: int,
    rescore_m: int = 32,
    num_bins: int = 64,
    block_n: int = 32768,
    q_tile: int = 256,
    interpret: bool = False,
):
    """Whole block-probed query path in ONE jit.

    Query-major ("pair-tile") batching: every query gets EXACTLY its own
    top-B blocks. The (query, block) want-pairs are sorted by block into
    per-block runs, each run padded to q_tile and chopped into tiles; the
    kernel's grid walks the tiles with the tile's block id scalar-
    prefetched, so consecutive tiles of the same block reuse the already-
    resident VMEM copy (Pallas skips the DMA when the index map output is
    unchanged). An earlier per-TILE voting design (q_tile queries share
    one block list) lost 15-20 recall points to starved minority queries
    at equal traffic — measured on 16-mode data: per-query bound 0.98 at
    B=8, voted tiles 0.81.

    Returns (sims desc (Q, k) f32 exact, ids (Q, k) int32 global,
    dc (Q,) int32 rows probed, uncertified (Q,) int32 unprobed blocks
    whose sound bound exceeds the k-th similarity).
    """
    n_pad, dpad = layout.base_bf16.shape
    n_blocks = n_pad // block_n
    B = min(n_probe, n_blocks)
    Q, d = queries_f32.shape
    per_bin = block_n // num_bins
    PB = Q * B
    # static tile bound: sum_b ceil(W_b / q_tile) <= PB/q_tile + n_blocks
    T = PB // q_tile + n_blocks

    qn = queries_f32 / jnp.maximum(
        jnp.linalg.norm(queries_f32, axis=-1, keepdims=True), 1e-30
    )
    # ranking score (Q, n_blocks): max over sampled reps (see
    # build_block_layout — sharp multi-modal proxy of the block's best)
    score = jnp.max(
        jnp.einsum(
            "qd,brd->qbr", qn, layout.reps,
            preferred_element_type=jnp.float32,
        ),
        axis=-1,
    )
    # SOUND upper bound q . c + r — certificate only, not ranking
    ub = (
        jnp.einsum(
            "qd,bd->qb", qn, layout.centroids,
            preferred_element_type=jnp.float32,
        )
        + layout.radii[None, :]
    )
    _, wants = jax.lax.top_k(score, B)  # (Q, B) distinct block ids
    wants = wants.astype(jnp.int32)

    # ---- pair bookkeeping (all device-side; n_blocks and PB are tiny) --
    bb = wants.reshape(-1)  # (PB,) block of each pair
    qq = jnp.repeat(jnp.arange(Q, dtype=jnp.int32), B)
    order = jnp.argsort(bb, stable=True)
    sb, sq = bb[order], qq[order]
    counts = jnp.zeros((n_blocks,), jnp.int32).at[bb].add(1)
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)]
    )
    padded = ((counts + q_tile - 1) // q_tile) * q_tile
    pstarts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded)]
    )  # (n_blocks + 1,), pstarts[-1] <= T * q_tile
    i_sorted = jnp.arange(PB, dtype=jnp.int32)
    ppos = pstarts[sb] + (i_sorted - starts[sb])  # padded slot of pair
    slot_q = jnp.full((T * q_tile,), -1, jnp.int32).at[ppos].set(sq)
    # tile -> block id (tiles past the last padded slot stream block 0,
    # which stays VMEM-resident — ~one wasted fetch total)
    tile_starts = jnp.arange(T, dtype=jnp.int32) * q_tile
    tile_block = jnp.clip(
        jnp.searchsorted(pstarts, tile_starts, side="right").astype(
            jnp.int32
        )
        - 1,
        0,
        n_blocks - 1,
    )

    # pre-gathered query rows per slot, bias column 3.0 on real slots
    qg = jnp.zeros((T * q_tile, dpad), jnp.bfloat16)
    qrows = qn[jnp.clip(slot_q, 0, Q - 1)].astype(jnp.bfloat16)
    live = slot_q >= 0
    qg = qg.at[:, :d].set(jnp.where(live[:, None], qrows, 0))
    qg = qg.at[:, d].set(jnp.where(live, 3.0, 0.0).astype(jnp.bfloat16))

    kernel = functools.partial(
        _scan_kernel_packed, nb=num_bins, block_n=block_n, biased=True
    )

    def wrapped(tb_ref, q_ref, b_ref, out_ref):
        del tb_ref  # consumed by the index maps only
        kernel(q_ref, b_ref, out_ref)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((q_tile, dpad), lambda i, tb: (i, 0)),
            pl.BlockSpec((block_n, dpad), lambda i, tb: (tb[i], 0)),
        ],
        out_specs=pl.BlockSpec((num_bins, q_tile), lambda i, tb: (i, 0)),
    )
    packed = pl.pallas_call(
        wrapped,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T * num_bins, q_tile), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(tile_block, qg, layout.base_bf16)

    # ---- decode per-pair winners back to q-major (Q, B * nb) ----------
    flat = packed.reshape(T, num_bins, q_tile).transpose(0, 2, 1)
    flat = flat.reshape(T * q_tile, num_bins)  # row per padded pair slot
    ipos = jnp.zeros((PB,), jnp.int32).at[order].set(ppos)
    pk = flat[ipos.reshape(Q, B)].reshape(Q, B * num_bins)
    sub = pk & (per_bin - 1)
    bin_iota = jnp.tile(jnp.arange(num_bins, dtype=jnp.int32), (B,))
    pos = (
        jnp.repeat(wants, num_bins, axis=1) * block_n
        + bin_iota[None, :] * per_bin
        + sub
    )
    valid = pk >= _valid_floor()

    # exact rescore of the best rescore_m (by packed value) in permuted space
    m = min(rescore_m, B * num_bins)
    neg = jnp.int32(-(1 << 30))
    pk_m = jnp.where(valid, pk, neg)
    if B * num_bins > m:
        top_p, sel = jax.lax.top_k(pk_m, m)
        pos_m = jnp.take_along_axis(pos, sel, axis=1)
    else:
        top_p, pos_m = pk_m, pos
    safe = jnp.clip(pos_m, 0, layout.base_f32.shape[0] - 1)
    ex = jnp.einsum(
        "qmd,qd->qm", layout.base_f32[safe], qn,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    ex = jnp.where(top_p > neg, ex, -jnp.inf)
    sims, sel2 = jax.lax.top_k(ex, k)
    pos_k = jnp.take_along_axis(pos_m, sel2, axis=1)
    ids = jnp.where(
        jnp.isfinite(sims),
        layout.gids[jnp.clip(pos_k, 0, layout.gids.shape[0] - 1)],
        -1,
    )

    # stats: probed rows + uncovered-bound certificate (both per query)
    dc = jnp.sum(layout.block_rows[wants], axis=1).astype(jnp.int32)
    probed_hot = jnp.max(
        jax.nn.one_hot(wants, n_blocks, dtype=jnp.float32), axis=1
    )  # (Q, n_blocks) 0/1
    kth = sims[:, k - 1]
    unc = jnp.sum(
        (ub > kth[:, None]) & (probed_hot < 0.5), axis=1
    ).astype(jnp.int32)
    return sims, ids, dc, unc


# layout cache keyed like ivf._PALLAS_BASE_CACHE (id-pinned source array)
_LAYOUT_CACHE: dict = {}


def get_block_layout(index, block_n: int) -> BlockLayout:
    key = (id(index.vectors), block_n)
    hit = _LAYOUT_CACHE.get(key)
    if hit is not None and hit[0] is index.vectors:
        return hit[1]
    layout = build_block_layout(index.vectors, index.assignment, block_n)
    if len(_LAYOUT_CACHE) > 2:
        _LAYOUT_CACHE.clear()
    _LAYOUT_CACHE[key] = (index.vectors, layout)
    return layout


def block_scan_search_adaptive(
    index,
    queries,
    k: Optional[int] = None,
    n_probe0: Optional[int] = None,
    batch_q: int = 4096,
    interpret: Optional[bool] = None,
    block_n: Optional[int] = None,
):
    """Certificate-driven block probing: no probe-budget tuning knob.

    Rounds of block_scan_search with a doubling budget, re-running only
    the queries whose block certificate failed (an unprobed block's sound
    bound q . c + r exceeded their k-th similarity). Terminates when every
    query is block-certified or the budget reaches all blocks (== the full
    fused scan). Because each round's top-B block set contains the
    previous round's, total streamed rows are at most ~2x the final
    round's — easy queries stop at n_probe0, only the hard tail escalates.

    This is the TPU-blocked analog of the reference's adaptive cluster
    walk stop rule (index.rs:342-361: stop when no remaining ball can beat
    the k-th best) — applied at kernel-block granularity with a geometric
    schedule instead of a serial walk.

    Returns (dists, ids, DenseSearchStats) like block_scan_search;
    distance_computations accumulates every streamed row across rounds.
    """
    from clann_tpu.ops.ivf import DenseSearchStats, pallas_scan_plan

    k = index.config.k if k is None else k
    q = np.asarray(queries, np.float32)
    if q.ndim == 1:
        q = q[None, :]
    Q = q.shape[0]
    n = index.vectors.shape[0]
    block_n = block_n or pallas_scan_plan(
        n, k, d=int(index.vectors.shape[1])
    )[0]
    n_blocks = get_block_layout(index, block_n).n_blocks
    B = min(n_blocks, n_probe0 or max(2, round(n_blocks / 16)))

    dists = np.full((Q, k), np.inf, np.float32)
    ids = np.full((Q, k), -1, np.int32)
    dc = np.zeros(Q, np.int64)
    visited = np.zeros(Q, np.int32)
    unc = np.zeros(Q, np.int32)
    remaining = np.arange(Q)
    while len(remaining):
        d_r, i_r, st = block_scan_search(
            index, q[remaining], k=k, n_probe=B, batch_q=batch_q,
            interpret=interpret,
        )
        dists[remaining] = d_r
        ids[remaining] = i_r
        dc[remaining] += np.asarray(st.distance_computations, np.int64)
        visited[remaining] = B
        unc[remaining] = np.asarray(st.uncertified)
        bad = np.asarray(st.uncertified) > 0
        if not bad.any() or B >= n_blocks:
            break
        remaining = remaining[bad]
        B = min(n_blocks, 2 * B)
    return dists, ids, DenseSearchStats(
        distance_computations=dc,
        candidates=dc,
        clusters_visited=visited,
        dropped_probes=np.int32(0),
        uncertified=unc,
    )


def block_scan_search(
    index,
    queries,
    k: Optional[int] = None,
    n_probe: Optional[int] = None,
    batch_q: int = 4096,
    interpret: Optional[bool] = None,
    block_n: Optional[int] = None,
):
    """Block-probed fused scan over a ClusteredIndex.

    Returns (dists ascending (Q, k), ids (Q, k), DenseSearchStats) like
    ivf.scan_search; dc counts the rows actually streamed per query and
    `uncertified` counts unprobed blocks whose centroid bound exceeded the
    returned k-th similarity. 0 is a BLOCK-level certificate: no skipped
    block can hide a better neighbor. Within probed blocks the result
    keeps the fused scan's bin-winner approximation (one winner per
    per_bin rows before the exact rescore), so recall at full certification
    equals the full fused scan's, not 1.0.
    """
    from clann_tpu.ops.ivf import DenseSearchStats, pallas_scan_plan

    k = index.config.k if k is None else k
    q = queries if isinstance(queries, jnp.ndarray) else jnp.asarray(
        np.asarray(queries, np.float32)
    )
    qn = q.astype(jnp.float32)
    if qn.ndim == 1:
        qn = qn[None, :]
    n = index.vectors.shape[0]
    plan_bn, num_bins, rescore_m, q_tile = pallas_scan_plan(
        n, k, d=int(index.vectors.shape[1])
    )
    block_n = block_n or plan_bn
    num_bins = min(num_bins, block_n)  # overridden block_n may be smaller
    layout = get_block_layout(index, block_n)
    n_blocks = layout.n_blocks
    B = min(n_blocks, n_probe or auto_block_probe(n_blocks))
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    outs = []
    for s in range(0, qn.shape[0], batch_q):
        blk = qn[s : s + batch_q]
        sims, ids, dc, unc = block_scan_topk_e2e(
            layout, blk, k=k, n_probe=B, rescore_m=rescore_m,
            num_bins=num_bins, block_n=block_n, q_tile=q_tile,
            interpret=interpret,
        )
        outs.append(
            jnp.concatenate(
                [
                    # int32 carrier: bitcasting ids INTO f32 would flush
                    # the denormal patterns of small ids to 0 on TPU
                    jax.lax.bitcast_convert_type(sims, jnp.int32),
                    ids,
                    dc[:, None],
                    unc[:, None],
                ],
                axis=1,
            )
        )
    flat = np.asarray(jnp.concatenate(outs, axis=0))  # ONE host pull
    sims = np.ascontiguousarray(flat[:, :k]).view(np.float32)
    ids = flat[:, k : 2 * k]
    dc = flat[:, 2 * k].ravel()
    unc = flat[:, 2 * k + 1].ravel()
    dists = np.where(ids >= 0, np.clip(1.0 - sims, 0.0, 2.0), np.inf)
    Q = ids.shape[0]
    stats = DenseSearchStats(
        distance_computations=dc,
        candidates=dc,
        clusters_visited=np.full(Q, B, np.int32),
        dropped_probes=np.int32(0),
        uncertified=unc,
    )
    return dists, ids, stats
