"""Fused probe-filter Pallas kernel for the adaptive LSH engines.

One iteration of the global engine's probe loop (ops/global_query.py)
filters a window of WL gathered candidate records down to the ones worth
rescoring: lane validity & sketch hamming filter & per-candidate ball
feasibility. In XLA these are separate passes — the sketch filter
materializes (Q, WL) intermediates per op, and the ball filter contracts a
(Q, WL, C) one-hot with the per-cluster feasibility bits through HBM
(measured ~3ms + ~4ms per iteration at Q=256, WL=8192, C=178 on v5e; see
PERFORMANCE.md "Global-engine per-iteration budget"). This kernel fuses
them into ONE pass over the window lanes (the TPU analog of the
reference's ring-buffer filter stage, collection.hpp:793-904):

  ham    = popcount(sk ^ qsk)               per lane (VPU)
  sketch = ham <= maxdiff[q]                threshold from current k-th sim
  feas   = bit `cluster mod 32` of ok_packed[q, cluster / 32]
  passes = valid & sketch & feas

The ball-feasibility lookup is the novel part: instead of a per-lane
gather (40-50ns/lane on v5e) or a one-hot MXU contraction (HBM
materialization), the per-cluster feasibility booleans are BIT-PACKED into
ceil(C/32) uint32 words per query (built in XLA — (Q, C) compare + pack,
trivial), and the kernel selects each lane's bit with a short loop over
words: `acc |= (cluster>>5 == w) & ((ok_w[q] >> (cluster & 31)) & 1)`.
Each step is a handful of full-width VPU ops with a per-query broadcast
scalar — no gather, no one-hot, ~W32/8 total passes over the window.

Semantics are bit-identical to the XLA path (tested in interpret mode and
cross-checked on hardware by tests/test_probe_kernel.py): the kernel only
REORDERS where the same boolean algebra happens.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _probe_filter_kernel(
    sk0_ref, sk1_ref, qsk0_ref, qsk1_ref, cluster_ref, valid_ref,
    okp_ref, maxdiff_ref, passes_ref, *, n_words,
):
    """One q-tile: fuse sketch filter + ball feasibility + validity."""
    ham = (
        jax.lax.population_count(
            jnp.bitwise_xor(sk0_ref[:], qsk0_ref[:])
        )
        + jax.lax.population_count(
            jnp.bitwise_xor(sk1_ref[:], qsk1_ref[:])
        )
    ).astype(jnp.int32)
    sketch_ok = ham <= maxdiff_ref[:, 0:1]  # (QT, WL) vs (QT, 1) broadcast

    cluster = cluster_ref[:]  # (QT, WL) int32, pre-clipped to [0, C)
    c_hi = jax.lax.shift_right_logical(cluster, 5)
    c_lo = jnp.bitwise_and(cluster, 31).astype(jnp.uint32)
    feas = jnp.zeros(cluster.shape, jnp.bool_)
    for w in range(n_words):
        okw = okp_ref[:, w : w + 1]  # (QT, 1) uint32, lane-broadcast
        bit = jnp.bitwise_and(
            jax.lax.shift_right_logical(okw, c_lo), jnp.uint32(1)
        )
        feas = feas | ((c_hi == w) & (bit == 1))

    passes = (valid_ref[:] != 0) & sketch_ok & feas
    passes_ref[:] = passes.astype(jnp.uint8)


@functools.partial(
    jax.jit, static_argnames=("q_tile", "interpret")
)
def probe_filter(
    sk0: jnp.ndarray,      # (Q, WL) uint32 candidate sketch word 0
    sk1: jnp.ndarray,      # (Q, WL) uint32 candidate sketch word 1
    qsk0: jnp.ndarray,     # (Q, WL) uint32 query sketch word 0 (per lane)
    qsk1: jnp.ndarray,     # (Q, WL) uint32 query sketch word 1 (per lane)
    cluster: jnp.ndarray,  # (Q, WL) int32 candidate cluster, in [0, C)
    valid: jnp.ndarray,    # (Q, WL) uint8 lane validity
    ok_packed: jnp.ndarray,  # (Q, W32) uint32 bit-packed cluster feasibility
    maxdiff: jnp.ndarray,  # (Q, 1) int32 sketch hamming threshold
    *,
    q_tile: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """(Q, WL) uint8 pass mask — see module docstring.

    Q must be a multiple of q_tile and WL a multiple of 128 (both hold for
    the engine's production shapes: Q a power of two >= 64, WL =
    chunk * filter_expand).
    """
    Q, WL = sk0.shape
    n_words = ok_packed.shape[1]
    assert Q % q_tile == 0 and WL % 128 == 0
    grid = (Q // q_tile,)

    lane = lambda i: (i, 0)  # noqa: E731
    lane_spec = functools.partial(
        pl.BlockSpec, (q_tile, WL), lane, memory_space=pltpu.VMEM
    )
    kernel = functools.partial(_probe_filter_kernel, n_words=n_words)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            lane_spec(), lane_spec(), lane_spec(), lane_spec(), lane_spec(),
            lane_spec(),
            pl.BlockSpec(
                (q_tile, n_words), lane, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((q_tile, 1), lane, memory_space=pltpu.VMEM),
        ],
        out_specs=lane_spec(),
        out_shape=jax.ShapeDtypeStruct((Q, WL), jnp.uint8),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(sk0, sk1, qsk0, qsk1, cluster, valid, ok_packed, maxdiff)


def pack_feasibility(feas_ok: jnp.ndarray) -> jnp.ndarray:
    """Bit-pack (Q, C) feasibility booleans into (Q, ceil(C/32)) uint32.

    Word w, bit b holds cluster 32*w + b (matching the kernel's
    `(ok_w >> (c & 31)) & 1` select).
    """
    Q, C = feas_ok.shape
    W32 = -(-C // 32)
    pad = jnp.zeros((Q, W32 * 32 - C), feas_ok.dtype)
    bits = jnp.concatenate([feas_ok, pad], axis=1).astype(jnp.uint32)
    bits = bits.reshape(Q, W32, 32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None]
    return jnp.sum(bits * weights, axis=2, dtype=jnp.uint32)
