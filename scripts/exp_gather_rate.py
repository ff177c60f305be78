"""Measure the candidate-record gather rate: XLA gather vs Pallas DMA.

VERDICT round-2 item #1 allows either a fused probe kernel reaching >=100
QPS at the recall-0.9 gate, or "a committed kernel experiment demonstrating
Mosaic cannot issue gathers at the memory system's rate (measure it, don't
assert it)". This is that measurement:

  a. XLA row gather rec_view[t, b] at several block sizes G (the engine's
     production gather, ops/global_query.py body) — ns/row and GB/s.
  b. The same gather through a flat row index (one fewer index operand).
  c. A Pallas kernel issuing one async DMA per row (double-buffered, BATCH
     DMAs in flight), grid over row groups, scalar-prefetched indices.

All variants run ITERS times inside one jit with iteration-dependent
indices (so nothing hoists), amortizing the ~25-40ms relay dispatch floor.

Run: python -m scripts.exp_gather_rate
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(m):
    print(m, file=sys.stderr, flush=True)


N_SLOTS = int(os.environ.get("GR_SLOTS", 1_200_000))  # table slots total
L = 50
R = 4  # record words: id, sketch x2, cluster
N_ROWS = int(os.environ.get("GR_ROWS", 131_072))  # gathered rows per iter
ITERS = int(os.environ.get("GR_ITERS", 20))
REPS = int(os.environ.get("GR_REPS", 6))

key = jax.random.PRNGKey(0)


def timed(name, fn, *args):
    f = jax.jit(fn)
    float(jnp.sum(f(*args).astype(jnp.float32)))  # compile+run once
    g = jax.jit(lambda *a: jnp.sum(f(*a).astype(jnp.float32)))
    float(g(*args))
    best = np.inf
    for _ in range(REPS):
        t0 = time.time()
        float(g(*args))
        best = min(best, time.time() - t0)
    return best


results = {}
for G in (8, 16, 32, 64, 128):
    nb = N_SLOTS // G
    rec = jax.random.bits(key, (L, nb, G * R), dtype=jnp.uint32)
    rows = N_ROWS  # keep total rows constant; bytes scale with G
    kt = jax.random.split(key, 2)
    t_idx = jax.random.randint(kt[0], (rows,), 0, L, dtype=jnp.int32)
    b_idx = jax.random.randint(kt[1], (rows,), 0, nb, dtype=jnp.int32)

    def xla_gather(rec, t_idx, b_idx):
        def step(i, acc):
            # iteration-dependent rotation defeats CSE/hoisting
            b = (b_idx + i) % nb
            out = rec[t_idx, b]  # (rows, G*R)
            return acc + jnp.sum(out, dtype=jnp.uint32)

        return jax.lax.fori_loop(0, ITERS, step, jnp.uint32(0))[None]

    el = timed(f"xla[G={G}]", xla_gather, rec, t_idx, b_idx)
    per_iter = el / ITERS
    ns_row = per_iter * 1e9 / rows
    gbps = rows * G * R * 4 / per_iter / 1e9
    log(f"XLA gather  G={G:4d} ({G*R*4:5d}B/row): {per_iter*1000:7.2f} "
        f"ms/iter  {ns_row:6.1f} ns/row  {gbps:6.1f} GB/s")
    results[f"xla_G{G}"] = {"ms_per_iter": round(per_iter * 1000, 3),
                            "ns_per_row": round(ns_row, 1),
                            "gbps": round(gbps, 2)}

    flat = rec.reshape(L * nb, G * R)

    def xla_gather_flat(flat, t_idx, b_idx):
        def step(i, acc):
            fidx = t_idx * nb + (b_idx + i) % nb
            out = flat[fidx]
            return acc + jnp.sum(out, dtype=jnp.uint32)

        return jax.lax.fori_loop(0, ITERS, step, jnp.uint32(0))[None]

    el = timed(f"xla_flat[G={G}]", xla_gather_flat, flat, t_idx, b_idx)
    per_iter = el / ITERS
    results[f"xla_flat_G{G}"] = {
        "ms_per_iter": round(per_iter * 1000, 3),
        "ns_per_row": round(per_iter * 1e9 / rows, 1),
        "gbps": round(rows * G * R * 4 / per_iter / 1e9, 2)}
    log(f"  flat-index variant:            {per_iter*1000:7.2f} ms/iter  "
        f"{per_iter*1e9/rows:6.1f} ns/row")


# ---- Pallas DMA gather ----------------------------------------------------
def dma_gather(flat, fidx, *, rows_per_step, width, inflight=8):
    """Gather flat[fidx] (rows, width) via per-row async DMAs.

    Grid over row groups; each step scalar-prefetches its indices, keeps
    `inflight` DMAs in the air into a VMEM scratch ring, then writes the
    group's block out. This is the Mosaic-native alternative to the XLA
    gather — the measurement VERDICT r2 asked for.
    """
    rows = fidx.shape[0]
    assert rows % rows_per_step == 0
    grid = (rows // rows_per_step,)

    def kernel(idx_ref, flat_hbm, out_ref, scratch, sems):
        # idx_ref: (rows_per_step,) SMEM block of this step's row indices
        def get_dma(slot, r):
            return pltpu.make_async_copy(
                flat_hbm.at[pl.ds(idx_ref[r], 1), :],
                scratch.at[pl.ds(slot, 1), :],
                sems.at[slot],
            )

        # warm up the ring
        for w in range(inflight):
            get_dma(w, w).start()

        def body(r, _):
            slot = r % inflight
            get_dma(slot, r).wait()
            out_ref[pl.ds(r, 1), :] = scratch[pl.ds(slot, 1), :]

            # slot consumed; refill it with the row `inflight` ahead
            @pl.when(r + inflight < rows_per_step)
            def _():
                get_dma(slot, r + inflight).start()

            return 0

        jax.lax.fori_loop(0, rows_per_step, body, 0)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (rows_per_step,), lambda s: (s,),
                memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (rows_per_step, width), lambda s: (s, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((inflight, width), jnp.uint32),
            pltpu.SemaphoreType.DMA((inflight,)),
        ],
        out_shape=jax.ShapeDtypeStruct((rows, width), jnp.uint32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(fidx, flat)


for G in (16, 64):
    nb = N_SLOTS // G
    rec = jax.random.bits(key, (L, nb, G * R), dtype=jnp.uint32)
    flat = rec.reshape(L * nb, G * R)
    rows = N_ROWS
    kt = jax.random.split(key, 2)
    fidx = jax.random.randint(kt[0], (rows,), 0, L * nb, dtype=jnp.int32)

    def pallas_step(flat, fidx):
        def step(i, acc):
            fi = (fidx + i) % (L * nb)
            out = dma_gather(flat, fi, rows_per_step=256, width=G * R)
            return acc + jnp.sum(out, dtype=jnp.uint32)

        return jax.lax.fori_loop(0, ITERS, step, jnp.uint32(0))[None]

    try:
        el = timed(f"pallas_dma[G={G}]", pallas_step, flat, fidx)
        per_iter = el / ITERS
        ns_row = per_iter * 1e9 / rows
        gbps = rows * G * R * 4 / per_iter / 1e9
        log(f"Pallas DMA  G={G:4d} ({G*R*4:5d}B/row): {per_iter*1000:7.2f} "
            f"ms/iter  {ns_row:6.1f} ns/row  {gbps:6.1f} GB/s")
        results[f"pallas_dma_G{G}"] = {
            "ms_per_iter": round(per_iter * 1000, 3),
            "ns_per_row": round(ns_row, 1), "gbps": round(gbps, 2)}
    except Exception as e:  # noqa: BLE001 — record the failure mode
        log(f"Pallas DMA G={G} failed: {type(e).__name__}: {e}")
        results[f"pallas_dma_G{G}"] = {"error": f"{type(e).__name__}: {e}"[:300]}

print(json.dumps({"config": {"slots": N_SLOTS, "rows_per_iter": N_ROWS,
                             "iters": ITERS},
                  "results": results}))
