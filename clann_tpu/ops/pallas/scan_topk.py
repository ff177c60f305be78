"""Fused dense-scan top-k Pallas kernel.

The speed-of-light version of the dense scan (ops/distances.dense_scan_topk):
instead of materializing the (Q, n) score matrix in HBM and reducing it
with approx_max_k (XLA's pipeline writes + re-reads gigabytes of scores),
this kernel fuses the scoring matmul with a binned top-k reduction entirely
in VMEM:

  for each query tile (grid dim 0), for each point block (grid dim 1):
    scores = q_tile @ block.T                (MXU, bf16 in / f32 out)
    bin_max/argmax over NB bins of the block (VPU)
    merge the NB bin winners into a running per-query candidate scratch

HBM traffic is exactly one read of the dataset per query tile — the
streaming floor. Candidate membership is approximate the same way
jax.lax.approx_max_k is (one winner per bin per block); returned ids are
re-scored exactly afterwards, so returned VALUES are exact and ordering is
exact within the candidate set. Choose num_bins >= ~2k for recall
comparable to approx_max_k(recall_target~0.95).

This is the TPU counterpart of the reference's innermost hot loop — the
AVX2 i16 dot + MaxBuffer scan (math.hpp:11-34, maxbuffer.hpp) — rebuilt as
a systolic-array streaming kernel.

Performance notes (measured on v5e, 1.18M x 100, 2048-query batches):
- the scan is ELEMENTWISE-bound, not matmul-bound: every per-score pass
  over the 2.4G scores costs ~2.4ms at VPU rate, and the matmul itself is
  ~3ms; XLA's hardware approx_max_k pipeline (36ms) already sits near
  this bound, so the fused kernel matches rather than beats it.
- in-kernel RUNNING top-k merges (scratch carried across grid steps)
  lower to scalar code in Mosaic and cost ~1000x the matmul — hence the
  stateless emit-winners design with the reduction in XLA.
- bin reductions must run along SUBLANES (transposed dot output,
  leading-dim reshape); lane-dim slicing per bin scalarizes.
- tiny unaligned output blocks (lane dim < 128) trigger relayout slow
  paths; the (q_tile, 128)-aligned winner layout is ~10x faster.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _scan_kernel(q_ref, b_ref, vals_ref, ids_ref, *, nb, block_n):
    """One grid step: score one point block against one query tile and
    emit the per-bin winners (value + id) for that block.

    Stateless across grid steps — every (query tile, block) pair writes its
    own output slice, and the cross-block top-k reduction happens outside
    the kernel in XLA. The dot is computed TRANSPOSED, (block_n, q_tile),
    so bins lie along the sublane axis where grouped reductions vectorize
    (splitting the lane axis per bin scalarizes in Mosaic).
    """
    blk_j = pl.program_id(1)
    per_bin = block_n // nb

    q = q_ref[:]  # (Qt, dpad) bf16
    b = b_ref[:]  # (block_n, dpad) bf16
    sT = jax.lax.dot_general(
        b,
        q,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (block_n, Qt)
    s3 = sT.reshape(nb, per_bin, sT.shape[1])  # leading-dim split: legal
    m = jnp.max(s3, axis=1)  # (nb, Qt)
    sub = jax.lax.broadcasted_iota(jnp.int32, s3.shape, 1)
    arg = jnp.min(
        jnp.where(s3 >= m[:, None, :], sub, jnp.int32(1 << 30)), axis=1
    )  # (nb, Qt)
    bin_base = jax.lax.broadcasted_iota(jnp.int32, arg.shape, 0) * per_bin
    ids = blk_j * block_n + bin_base + arg
    vals_ref[:, :] = m.T  # (Qt, nb) — lane-aligned output block
    ids_ref[:, :] = ids.T


def _scan_kernel_packed(
    q_ref, b_ref, out_ref, *, nb, block_n, biased, group_r=1, acc_bf16=False
):
    """One grid step, packed single-pass variant.

    The original kernel pays ~4 VPU passes over the (block_n, q_tile)
    score tile (max-reduce, >=-compare, where, min-reduce) plus two
    transposed output writes. Here the score and the in-bin sub-index are
    packed into ONE int32 so a single max-reduce picks the bin winner AND
    records which row won. Every elementwise op over the score tile is a
    VMEM round trip (~13us per op per 32k x 256 step on v5e — measured,
    see PERFORMANCE.md), so the packing is built from the cheapest
    possible chain: shift the scores to [2, 4) (monotone, positive, fixed
    exponent), BITCAST the f32 pattern to int32 (order-preserving for
    positive floats, and free — no arithmetic), then mask the low
    log2(per_bin) mantissa bits and OR in the row index. Those low bits
    sit ~2^-14 below the bf16 input noise floor, and winners are exactly
    re-scored afterwards anyway.

    `biased`: the +3.0 shift rides the MATMUL for free when the operands
    carry a bias column (base column == 1.0, query column == 3.0 — both
    exact in bf16); otherwise one extra VPU add pays for it. Output stays
    in the kernel's natural (nb, q_tile) layout; decode and transpose are
    cheap XLA passes over the tiny winner tensor, not the score tile.

    `group_r`: pre-reduce GROUPS of group_r consecutive rows with one
    plain max before the packing chain runs — the pack/mask/or ops then
    touch only 1/group_r of the score tile. The winner's identity is kept
    at GROUP granularity; the e2e rescore evaluates all group_r rows of
    each winning group exactly, so result quality is unchanged (the
    group's true best row wins the exact rescore). This trades VPU passes
    over the full tile (the measured kernel bound, PERFORMANCE.md) for a
    group_r-times-wider exact rescore, which is gather-overlapped and
    measured flat up to m*group_r ~ 64.

    `acc_bf16`: emit the matmul in bf16 — halves score-tile VMEM traffic;
    winner selection then quantizes at bf16's 8 mantissa bits (the exact
    rescore downstream makes returned values exact either way).
    """
    per_bin = block_n // nb
    pg = per_bin // group_r  # groups per bin

    q = q_ref[:]  # (Qt, dpad) bf16
    b = b_ref[:]  # (block_n, dpad) bf16
    sT = jax.lax.dot_general(
        b,
        q,
        dimension_numbers=(((1,), (1,)), ((), ())),
        # the MXU accumulator is architecturally 32-bit (Mosaic rejects a
        # bf16 acc); acc_bf16 casts the EMITTED tile instead, so the
        # pack/max chain reads half the bytes
        preferred_element_type=jnp.float32,
    )  # (block_n, Qt) = score + 3.0 when biased
    if not biased:
        sT = sT + 3.0
    if acc_bf16:
        sT = sT.astype(jnp.bfloat16)
    if group_r > 1:
        # INTERPRET-MODE ONLY (correctness-tested); on hardware this is a
        # measured dead end: the 4-D reshape+reduce below HANGS the
        # Mosaic compiler at (32768, 512) tiles, and the 2-D alternative
        # (R static strided row slices + elementwise max) lowers to an
        # unsupported gather ("Shape mismatch in input, indices and
        # output"). Both measured 2026-08-19; scripts/exp_kernel_floor.py.
        # The lever is moot anyway: the R=1 kernel already runs at its
        # write-once-read-once VMEM floor (61ms vs ~60ms computed floor
        # per 10k queries at 1.18M x 100), so a group pre-max can only
        # save pack ALU that the measured floor shows is already hidden
        # under the tile traffic.
        s4 = sT.reshape(nb, pg, group_r, sT.shape[1])
        s3 = jnp.max(s4, axis=2)
    else:
        s3 = sT.reshape(nb, pg, sT.shape[1])
    p = jax.lax.bitcast_convert_type(s3.astype(jnp.float32), jnp.int32)
    sub = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
    packed = (p & jnp.int32(~(pg - 1))) | sub
    out_ref[:, :] = jnp.max(packed, axis=1)  # (nb, Qt)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_real", "num_bins", "block_n", "q_tile", "biased", "group_r",
        "acc_bf16", "interpret",
    ),
)
def fused_scan_candidates_packed(
    base_bf16: jnp.ndarray,  # (n_pad, dpad) bf16, rows beyond n_real zero
    queries_bf16: jnp.ndarray,  # (Q_pad, dpad) bf16
    *,
    n_real: int,
    num_bins: int = 128,
    block_n: int = 16384,
    q_tile: int = 256,
    biased: bool = False,
    group_r: int = 1,
    acc_bf16: bool = False,
    interpret: bool = False,
):
    """(Q_pad, num_bins) approximate top candidates (vals f32, ids i32).

    Same contract as fused_scan_candidates; packed single-pass kernel.
    `biased`: operands carry a bias column making the dot == score + 3.0
    (see _scan_kernel_packed) — saves one full VPU pass over the scores.
    `group_r` > 1: returned ids are GROUP-start row ids (winner is one of
    the group_r consecutive rows from each id) — the caller must rescore
    all group_r rows per id (fused_scan_topk_e2e does).
    """
    n_pad, dpad = base_bf16.shape
    q_pad = queries_bf16.shape[0]
    assert n_pad % block_n == 0 and q_pad % q_tile == 0
    assert block_n % num_bins == 0
    per_bin = block_n // num_bins
    assert per_bin % group_r == 0 and group_r & (group_r - 1) == 0
    pg = per_bin // group_r
    # the sub-index replaces the low log2(pg) mantissa bits of the
    # f32 score pattern: pg must be a power of two, small enough that
    # >= 9 mantissa bits of score survive (bf16 inputs carry ~8 bits)
    assert pg & (pg - 1) == 0 and pg <= (1 << 14) and pg >= 1
    grid = (q_pad // q_tile, n_pad // block_n)
    n_blocks = n_pad // block_n

    kernel = functools.partial(
        _scan_kernel_packed, nb=num_bins, block_n=block_n, biased=biased,
        group_r=group_r, acc_bf16=acc_bf16,
    )
    packed = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (q_tile, dpad), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (block_n, dpad), lambda i, j: (j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (num_bins, q_tile), lambda i, j: (j, i),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_blocks * num_bins, q_pad), jnp.int32
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(queries_bf16, base_bf16)
    packed = packed.T  # (q_pad, n_blocks * nb) — one pass over winners
    # decode: high bits = bitcast(score + 3.0) with the low log2(pg)
    # mantissa bits replaced by sub. Clearing them and bitcasting back
    # floors the score to its quantization step. With group_r > 1 the id
    # is the group's FIRST row.
    sub = packed & (pg - 1)
    ids = (
        jnp.arange(n_blocks * num_bins, dtype=jnp.int32)[None, :] * per_bin
        + sub * group_r
    )
    masked = jnp.where(ids < n_real, packed, jnp.int32(-(1 << 30)))
    if masked.shape[1] > num_bins:
        top_p, sel = jax.lax.top_k(masked, num_bins)
        top_i = jnp.take_along_axis(ids, sel, axis=1)
    else:
        top_p, top_i = masked, ids
    # approximate values (exact rescore happens downstream). The sentinel
    # decodes to bitcast(0xC0000000) - 3 = -5.0 < any real score - 3.
    top_v = (
        jax.lax.bitcast_convert_type(
            top_p & jnp.int32(~(pg - 1)), jnp.float32
        )
        - 3.0
    )
    valid = top_p > jnp.int32(-(1 << 30))
    top_v = jnp.where(valid, top_v, -jnp.inf)
    top_i = jnp.where(valid, top_i, -1)
    return top_v, top_i


@functools.partial(
    jax.jit,
    static_argnames=("n_real", "num_bins", "block_n", "q_tile", "interpret"),
)
def fused_scan_candidates(
    base_bf16: jnp.ndarray,  # (n_pad, dpad) bf16, rows beyond n_real zero
    queries_bf16: jnp.ndarray,  # (Q_pad, dpad) bf16
    *,
    n_real: int,
    num_bins: int = 128,
    block_n: int = 16384,
    q_tile: int = 256,
    interpret: bool = False,
):
    """(Q_pad, num_bins) approximate top candidates (vals f32, ids i32)."""
    n_pad, dpad = base_bf16.shape
    q_pad = queries_bf16.shape[0]
    assert n_pad % block_n == 0 and q_pad % q_tile == 0
    assert block_n % num_bins == 0
    grid = (q_pad // q_tile, n_pad // block_n)

    n_blocks = n_pad // block_n
    kernel = functools.partial(
        _scan_kernel, nb=num_bins, block_n=block_n
    )
    vals, ids = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (q_tile, dpad), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (block_n, dpad), lambda i, j: (j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (q_tile, num_bins), lambda i, j: (i, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (q_tile, num_bins), lambda i, j: (i, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q_pad, n_blocks * num_bins), jnp.float32),
            jax.ShapeDtypeStruct((q_pad, n_blocks * num_bins), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(queries_bf16, base_bf16)
    # cross-block reduction in XLA: flatten (n_blocks, NB) candidates per
    # query and take the strongest num_bins
    flat_v = vals
    flat_i = ids
    # padded dataset rows are masked here instead of in-kernel (a
    # full-width iota mask per grid step costs 8MB of VMEM)
    flat_v = jnp.where(flat_i < n_real, flat_v, -jnp.inf)
    if flat_v.shape[1] > num_bins:
        top_v, sel = jax.lax.top_k(flat_v, num_bins)
        top_i = jnp.take_along_axis(flat_i, sel, axis=1)
    else:
        top_v, top_i = flat_v, flat_i
    top_i = jnp.where(jnp.isfinite(top_v), top_i, -1)
    return top_v, top_i


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_real", "k", "rescore_m", "num_bins", "block_n", "q_tile",
        "normalize", "biased", "group_r", "acc_bf16", "interpret",
    ),
)
def fused_scan_topk_e2e(
    base_bf16: jnp.ndarray,  # (n_pad, dpad) bf16, rows beyond n_real zero
    base_f32: jnp.ndarray,  # (n_real, d) f32 normalized (exact rescore)
    queries_f32: jnp.ndarray,  # (Q, d) f32; normalized here if `normalize`
    *,
    n_real: int,
    k: int,
    rescore_m: int = 32,
    num_bins: int = 64,
    block_n: int = 32768,
    q_tile: int = 256,
    normalize: bool = False,
    biased: bool = False,
    group_r: int = 1,
    acc_bf16: bool = False,
    interpret: bool = False,
):
    """Whole fused-scan query path in ONE jit: pad + kernel + candidate
    selection + exact f32 rescore of the best `rescore_m` + final top-k.

    Measured on v5e at 1.18M x 100, 10k queries: the packed kernel alone
    is 63ms, but running selection/rescore as separate dispatches through
    the relay (~40ms each) diluted it to parity with the approx_max_k
    scan. Fused end-to-end: 129k QPS at recall 0.9988 (vs 76k for the
    approx path) with rescore_m=32. Returns (exact sims desc (Q, k),
    ids (Q, k)).

    `biased`: base_bf16 carries the bias column (base_bf16[:n_real, d]
    == 1.0, as written by ops/ivf._pallas_base); the query side is set
    here. Requires dpad > d.
    """
    n_pad, dpad = base_bf16.shape
    Q, d = queries_f32.shape
    if normalize:
        # fused into the one dispatch: a separate eager l2_normalize call
        # costs a full ~40ms relay round trip per search call
        queries_f32 = queries_f32 / jnp.maximum(
            jnp.linalg.norm(queries_f32, axis=-1, keepdims=True), 1e-30
        )
    q_pad = ((Q + q_tile - 1) // q_tile) * q_tile
    qp = jnp.zeros((q_pad, dpad), jnp.bfloat16)
    qp = qp.at[:Q, :d].set(queries_f32.astype(jnp.bfloat16))
    if biased:
        assert dpad > d, "bias column needs one spare padded dim"
        qp = qp.at[:Q, d].set(jnp.bfloat16(3.0))
    v, i = fused_scan_candidates_packed(
        base_bf16, qp, n_real=n_real,
        num_bins=num_bins, block_n=block_n, q_tile=q_tile,
        biased=biased, group_r=group_r, acc_bf16=acc_bf16,
        interpret=interpret,
    )
    v, i = v[:Q], i[:Q]
    m = min(rescore_m, v.shape[1])
    if v.shape[1] > m:
        _, sel = jax.lax.top_k(v, m)
        i = jnp.take_along_axis(i, sel, axis=1)
    if group_r > 1:
        # group-granular winners: expand each group-start id to its
        # group_r consecutive rows; the exact rescore picks the row the
        # in-kernel packing no longer resolves
        gvalid = (i >= 0)[:, :, None]
        i = (i[:, :, None] + jnp.arange(group_r, dtype=jnp.int32)) * gvalid
        i = jnp.where(gvalid, i, -1).reshape(Q, m * group_r)
        i = jnp.where(i < n_real, i, -1)
    safe = jnp.clip(i, 0, n_real - 1)
    ex = jnp.einsum(
        "qbd,qd->qb", base_f32[safe], queries_f32,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    ex = jnp.where(i >= 0, ex, -jnp.inf)
    s, sel2 = jax.lax.top_k(ex, k)
    return s, jnp.where(
        jnp.isfinite(s), jnp.take_along_axis(i, sel2, axis=1), -1
    )


def pallas_scan_topk(
    base,
    queries,
    k: int = 10,
    num_bins: int = 128,
    block_n: int = 16384,
    q_tile: int = 256,
    batch_q: int = 4096,
    interpret: bool = False,
):
    """Fused-kernel dense scan: returns (exact cosine sims desc, ids).

    Candidates come from the fused kernel; the final k winners per query
    are re-scored exactly (f32, HIGHEST) and sorted, so values are exact.
    """
    from clann_tpu.ops.distances import exact_dot, l2_normalize

    if k > num_bins:
        raise ValueError(f"k={k} must be <= num_bins={num_bins}")
    base_n = l2_normalize(jnp.asarray(base, jnp.float32))
    qn_all = l2_normalize(jnp.asarray(queries, jnp.float32))
    n, d = base_n.shape
    dpad = ((d + 127) // 128) * 128
    n_pad = ((n + block_n - 1) // block_n) * block_n
    base_p = jnp.zeros((n_pad, dpad), jnp.bfloat16)
    base_p = base_p.at[:n, :d].set(base_n.astype(jnp.bfloat16))

    out_s, out_i = [], []
    for s in range(0, qn_all.shape[0], batch_q):
        qn = qn_all[s : s + batch_q]
        q_real = qn.shape[0]
        q_pad = ((q_real + q_tile - 1) // q_tile) * q_tile
        qp = jnp.zeros((q_pad, dpad), jnp.bfloat16)
        qp = qp.at[:q_real, :d].set(qn.astype(jnp.bfloat16))
        vals, ids = fused_scan_candidates(
            base_p, qp, n_real=n,
            num_bins=num_bins, block_n=block_n, q_tile=q_tile,
            interpret=interpret,
        )
        vals, ids = vals[:q_real], ids[:q_real]
        # exact rescore of the candidate set
        safe = jnp.clip(ids, 0, n - 1)
        cand_vecs = base_n[safe]  # (q, NB, d)
        exact = jnp.einsum(
            "qbd,qd->qb", cand_vecs, qn,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        exact = jnp.where(ids >= 0, exact, -jnp.inf)
        top_s, sel = jax.lax.top_k(exact, k)
        top_i = jnp.take_along_axis(ids, sel, axis=1)
        out_s.append(np.asarray(top_s))
        out_i.append(np.asarray(top_i))
    return np.concatenate(out_s), np.concatenate(out_i)
