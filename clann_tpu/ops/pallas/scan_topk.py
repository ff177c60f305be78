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
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _merge_top(vals, ids, new_vals, new_ids, nb):
    """Merge two (Qt, NB) candidate sets, keeping the NB largest per row.

    In-kernel top-NB via iterative max extraction (no sort/top_k lowering
    needed in Mosaic): NB rounds of row-max + one-hot invalidation.
    """
    cat_v = jnp.concatenate([vals, new_vals], axis=1)  # (Qt, 2NB)
    cat_i = jnp.concatenate([ids, new_ids], axis=1)
    width = cat_v.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, cat_v.shape, 1)
    out_v = []
    out_i = []
    for _ in range(nb):
        m = jnp.max(cat_v, axis=1, keepdims=True)  # (Qt, 1)
        amax = jnp.argmax(cat_v, axis=1)[:, None]  # (Qt, 1)
        sel = col == amax
        picked_i = jnp.sum(jnp.where(sel, cat_i, 0), axis=1, keepdims=True)
        out_v.append(m)
        out_i.append(picked_i)
        cat_v = jnp.where(sel, -jnp.inf, cat_v)
    return jnp.concatenate(out_v, axis=1), jnp.concatenate(out_i, axis=1)


def _scan_kernel(q_ref, b_ref, vals_ref, ids_ref, vs, is_, *, nb, block_n, n_real):
    qt_i = pl.program_id(0)
    blk_j = pl.program_id(1)
    n_blocks = pl.num_programs(1)

    @pl.when(blk_j == 0)
    def _():
        vs[:] = jnp.full_like(vs, -jnp.inf)
        is_[:] = jnp.full_like(is_, -1)

    q = q_ref[:]  # (Qt, dpad) bf16
    b = b_ref[:]  # (block_n, dpad) bf16
    scores = jnp.dot(q, b.T, preferred_element_type=jnp.float32)  # (Qt, B)

    # mask padding columns (points beyond n_real)
    base_col = blk_j * block_n
    col_ids = base_col + jax.lax.broadcasted_iota(
        jnp.int32, scores.shape, 1
    )
    scores = jnp.where(col_ids < n_real, scores, -jnp.inf)

    # binned winners: reshape (Qt, NB, B/NB)
    qt = scores.shape[0]
    per_bin = block_n // nb
    s3 = scores.reshape(qt, nb, per_bin)
    bin_max = jnp.max(s3, axis=2)  # (Qt, NB)
    bin_arg = jnp.argmax(s3, axis=2).astype(jnp.int32)  # (Qt, NB)
    bin_base = jax.lax.broadcasted_iota(jnp.int32, (qt, nb), 1) * per_bin
    bin_ids = base_col + bin_base + bin_arg

    mv, mi = _merge_top(vs[:], is_[:], bin_max, bin_ids, nb)
    vs[:] = mv
    is_[:] = mi

    @pl.when(blk_j == n_blocks - 1)
    def _():
        vals_ref[:] = vs[:]
        ids_ref[:] = is_[:]


@functools.partial(
    jax.jit,
    static_argnames=("n_real", "num_bins", "block_n", "q_tile", "interpret"),
)
def fused_scan_candidates(
    base_bf16: jnp.ndarray,  # (n_pad, dpad) bf16, rows beyond n_real zero
    queries_bf16: jnp.ndarray,  # (Q_pad, dpad) bf16
    *,
    n_real: int,
    num_bins: int = 16,
    block_n: int = 1024,
    q_tile: int = 256,
    interpret: bool = False,
):
    """(Q_pad, num_bins) approximate top candidates (vals f32, ids i32)."""
    n_pad, dpad = base_bf16.shape
    q_pad = queries_bf16.shape[0]
    assert n_pad % block_n == 0 and q_pad % q_tile == 0
    assert block_n % num_bins == 0
    grid = (q_pad // q_tile, n_pad // block_n)

    kernel = functools.partial(
        _scan_kernel, nb=num_bins, block_n=block_n, n_real=n_real
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
                (q_tile, num_bins), lambda i, j: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (q_tile, num_bins), lambda i, j: (i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q_pad, num_bins), jnp.float32),
            jax.ShapeDtypeStruct((q_pad, num_bins), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((q_tile, num_bins), jnp.float32),
            pltpu.VMEM((q_tile, num_bins), jnp.int32),
        ],
        interpret=interpret,
    )(queries_bf16, base_bf16)
    return vals, ids


def pallas_scan_topk(
    base,
    queries,
    k: int = 10,
    num_bins: int = 16,
    block_n: int = 1024,
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
