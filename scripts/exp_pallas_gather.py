"""Can Mosaic issue random gathers at the memory system's rate? (r3 #1)

VERDICT round 2 asked for the fused Pallas probe kernel (gather -> sketch
filter -> compact) to be built, OR a committed kernel experiment measuring
whether Mosaic can issue gathers at the ~40-50ns/lane rate XLA's gather
achieves (the global LSH engine's two gathers sit at that floor and are
>50% of its per-iteration budget; the rest is XLA glue worth ~1.5-1.9x).

Round-4 rewrite, round 2 of kernel-shape fixes. Mosaic/Pallas constraints
hit so far (each recorded because the next kernel author will hit them):
  - i32 HBM memrefs are (8, 128)-tiled; async-copy slices must be
    tile-aligned: a (1, W) row slice of a (T, 256) table is rejected on
    dim 0 (not 8-aligned), W=64 rejected on dim 1 (not 128-divisible).
  - SMEM BlockSpecs are shape-checked like any other: a (1, CHUNK) block
    of a 2-D index array is rejected; index blocks must be 1-D.
  - Single-dispatch timing on the relay hides everything under the
    ~20-25ms dispatch floor; every variant here runs ITERS times inside
    one jit (lax.fori_loop, iteration-rotated indices).

Tile-legal DMA designs measured (vs the XLA take baseline, re-measured
in the same amortized harness):
  B. "page4k": records padded to one full (8, 128) i32 tile per row
     (4 KB); per-row DMA table.at[idx] is tile-aligned. Pure DMA issue
     rate at 8x memory inflation.
  C. "group8": the PRODUCTION (T, 128) u32 table (G=32 blocks); each DMA
     fetches the aligned 8-row group containing the target row — no
     memory inflation, 8x byte overfetch.
  D. "flat1d": 1-D (T*128,) u32 view, 128-aligned 128-word slices — the
     exact production row, IF Mosaic accepts lane-aligned 1-D slices.

Reference analog: the ring-buffered prefetch loop of collection.hpp:793-904.

Run: python -m scripts.exp_pallas_gather
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

REPS = int(os.environ.get("REPS", 6))
ITERS = int(os.environ.get("ITERS", 10))


def log(m):
    print(f"[exp_pallas_gather] {m}", file=sys.stderr, flush=True)


def make_page_dma(CHUNK, NSEM, interpret):
    """B: out[i] = pages[idx[i]] where each row is one full (8,128) tile."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(idx_ref, pages_ref, out_ref, sems):
        def copy(i):
            return pltpu.make_async_copy(
                pages_ref.at[idx_ref[i]],
                out_ref.at[i],
                sems.at[jax.lax.rem(i, NSEM)],
            )

        for i in range(NSEM):
            copy(jnp.int32(i)).start()

        def body(i, _):
            copy(i).wait()

            @pl.when(i + NSEM < CHUNK)
            def _():
                copy(i + NSEM).start()

            return 0

        jax.lax.fori_loop(0, CHUNK, body, 0)

    def run(idx_flat, pages):
        n_chunks = idx_flat.shape[0] // CHUNK
        return pl.pallas_call(
            kernel,
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec(
                    (CHUNK,), lambda i: (i,), memory_space=pltpu.SMEM
                ),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(
                (CHUNK, 8, 128), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (n_chunks * CHUNK, 8, 128), jnp.uint32
            ),
            scratch_shapes=[pltpu.SemaphoreType.DMA((NSEM,))],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(idx_flat, pages)

    return run


def make_group8_dma(W, CHUNK, NSEM, interpret):
    """C: per-DMA fetch of the aligned 8-row group holding row idx[i].

    Source is the PRODUCTION (T, W) u32 table; the group slice (8, W) is
    tile-aligned for any W % 128 == 0. idx values are PRE-DIVIDED group
    indices (idx//8 done outside)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(gidx_ref, table_ref, out_ref, sems):
        def copy(i):
            return pltpu.make_async_copy(
                table_ref.at[pl.ds(gidx_ref[i] * 8, 8), :],
                out_ref.at[pl.ds(i * 8, 8), :],
                sems.at[jax.lax.rem(i, NSEM)],
            )

        for i in range(NSEM):
            copy(jnp.int32(i)).start()

        def body(i, _):
            copy(i).wait()

            @pl.when(i + NSEM < CHUNK)
            def _():
                copy(i + NSEM).start()

            return 0

        jax.lax.fori_loop(0, CHUNK, body, 0)

    def run(gidx_flat, table):
        n_chunks = gidx_flat.shape[0] // CHUNK
        return pl.pallas_call(
            kernel,
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec(
                    (CHUNK,), lambda i: (i,), memory_space=pltpu.SMEM
                ),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(
                (CHUNK * 8, W), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct(
                (n_chunks * CHUNK * 8, W), jnp.uint32
            ),
            scratch_shapes=[pltpu.SemaphoreType.DMA((NSEM,))],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(gidx_flat, table)

    return run


def make_flat1d_dma(W, CHUNK, NSEM, interpret):
    """D: 1-D flat table, 128-aligned W-word slices (the exact row)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(idx_ref, flat_ref, out_ref, sems):
        def copy(i):
            return pltpu.make_async_copy(
                flat_ref.at[pl.ds(idx_ref[i] * W, W)],
                out_ref.at[pl.ds(i * W, W)],
                sems.at[jax.lax.rem(i, NSEM)],
            )

        for i in range(NSEM):
            copy(jnp.int32(i)).start()

        def body(i, _):
            copy(i).wait()

            @pl.when(i + NSEM < CHUNK)
            def _():
                copy(i + NSEM).start()

            return 0

        jax.lax.fori_loop(0, CHUNK, body, 0)

    def run(idx_flat, flat):
        n_chunks = idx_flat.shape[0] // CHUNK
        return pl.pallas_call(
            kernel,
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec(
                    (CHUNK,), lambda i: (i,), memory_space=pltpu.SMEM
                ),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(
                (CHUNK * W,), lambda i: (i,), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct(
                (n_chunks * CHUNK * W,), jnp.uint32
            ),
            scratch_shapes=[pltpu.SemaphoreType.DMA((NSEM,))],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(idx_flat, flat)

    return run


def main():
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from bench import wait_for_tpu

    wait_for_tpu()
    import jax
    import jax.numpy as jnp

    interp = jax.default_backend() != "tpu"
    if interp:
        log("NOT on TPU -- interpret mode, timings meaningless")

    # production record-table shape at G=32: n=1.18M slots x L=50 tables,
    # R=4 words -> (L*nb, 128) u32 block rows (one block = 32 records)
    n_slots, L, R, G = 1_183_520, 50, 4, 32
    nb = n_slots // G
    T, W = L * nb, G * R  # W = 128
    NROWS = (128 * 1024) if not interp else 2048  # DMA rows per invocation
    CHUNK = 1024
    rng = np.random.default_rng(0)
    results = {}

    def amortized(fn_one, *args):
        """Best per-iteration seconds of ITERS invocations in one jit."""

        def run(*a):
            def step(i, acc):
                return acc + fn_one(i, *a)

            return jax.lax.fori_loop(
                0, ITERS, step, jnp.uint32(0)
            )[None]

        g = jax.jit(run)
        float(np.asarray(g(*args))[0])  # compile + warm
        best = np.inf
        for _ in range(REPS):
            t0 = time.time()
            float(np.asarray(g(*args))[0])
            best = min(best, time.time() - t0)
        return best / ITERS

    def record(tag, per_iter, rows, bytes_per_row, useful_bytes, extra=()):
        ns = per_iter * 1e9 / rows
        results[tag] = dict(
            rows=int(rows), row_bytes=int(bytes_per_row),
            ms_per_iter=per_iter * 1e3, ns_per_row=ns,
            gbps=rows * bytes_per_row / per_iter / 1e9,
            useful_gbps=rows * useful_bytes / per_iter / 1e9,
            **dict(extra),
        )
        log(f"{tag}: {per_iter*1e3:7.2f}ms/iter for {rows} rows = "
            f"{ns:6.1f}ns/row "
            f"({rows * bytes_per_row / per_iter / 1e9:6.1f} GB/s moved, "
            f"{rows * useful_bytes / per_iter / 1e9:6.1f} GB/s useful)")

    # ---- A: XLA take on the production (T, 128) table (amortized) ----
    table = jnp.asarray(
        rng.integers(0, 2**32, size=(T, W), dtype=np.uint32)
    )
    idx = jnp.asarray(rng.integers(0, T, size=(NROWS,), dtype=np.int32))

    def xla_one(i, table, idx):
        out = table[(idx + i) % T]
        return jnp.sum(out, dtype=jnp.uint32)

    record("xla_take_G32", amortized(xla_one, table, idx), NROWS, W * 4,
           W * 4)

    # ---- B: page4k ----
    n_pages = T // 8  # bound HBM: page table replaces 8 rows per page
    pages = jnp.asarray(
        rng.integers(0, 2**32, size=(n_pages, 8, 128), dtype=np.uint32)
    )
    pidx = jnp.asarray(
        rng.integers(0, n_pages, size=(NROWS,), dtype=np.int32)
    )
    for NSEM in (8, 16, 32):
        try:
            run = make_page_dma(CHUNK, NSEM, interp)
            out = jax.jit(run)(pidx, pages)
            ok = bool(jnp.array_equal(out[:CHUNK], pages[pidx[:CHUNK]]))

            def one(i, pidx, pages):
                return jnp.sum(
                    run((pidx + i) % n_pages, pages), dtype=jnp.uint32
                )

            record(f"page4k_s{NSEM}", amortized(one, pidx, pages), NROWS,
                   4096, 4096, extra=[("correct", ok)])
            if not ok:
                log(f"page4k_s{NSEM}: WRONG RESULTS")
        except Exception as e:  # noqa: BLE001 — record the failure mode
            log(f"page4k_s{NSEM} FAILED: {type(e).__name__}: {e}")
            results[f"page4k_s{NSEM}"] = dict(error=str(e)[:400])
    del pages

    # ---- C: group8 on the production table ----
    n_groups = T // 8
    gidx = jnp.asarray(
        rng.integers(0, n_groups, size=(NROWS,), dtype=np.int32)
    )
    for NSEM in (8, 16, 32):
        try:
            run = make_group8_dma(W, CHUNK, NSEM, interp)
            out = jax.jit(run)(gidx, table)
            want = table[
                (gidx[:CHUNK, None] * 8 + jnp.arange(8)[None, :]).reshape(-1)
            ]
            ok = bool(jnp.array_equal(out[: 8 * CHUNK], want))

            def one(i, gidx, table):
                return jnp.sum(
                    run((gidx + i) % n_groups, table), dtype=jnp.uint32
                )

            record(f"group8_s{NSEM}", amortized(one, gidx, table), NROWS,
                   8 * W * 4, W * 4, extra=[("correct", ok)])
            if not ok:
                log(f"group8_s{NSEM}: WRONG RESULTS")
        except Exception as e:  # noqa: BLE001
            log(f"group8_s{NSEM} FAILED: {type(e).__name__}: {e}")
            results[f"group8_s{NSEM}"] = dict(error=str(e)[:400])

    # ---- D: flat1d exact rows ----
    flat = table.reshape(-1)
    for NSEM in (8, 16, 32):
        try:
            run = make_flat1d_dma(W, CHUNK, NSEM, interp)
            out = jax.jit(run)(idx, flat)
            ok = bool(jnp.array_equal(
                out[: CHUNK * W].reshape(CHUNK, W), table[idx[:CHUNK]]
            ))

            def one(i, idx, flat):
                return jnp.sum(run((idx + i) % T, flat), dtype=jnp.uint32)

            record(f"flat1d_s{NSEM}", amortized(one, idx, flat), NROWS,
                   W * 4, W * 4, extra=[("correct", ok)])
            if not ok:
                log(f"flat1d_s{NSEM}: WRONG RESULTS")
        except Exception as e:  # noqa: BLE001
            log(f"flat1d_s{NSEM} FAILED: {type(e).__name__}: {e}")
            results[f"flat1d_s{NSEM}"] = dict(error=str(e)[:400])

    import json

    with open("PALLAS_GATHER.json", "w") as f:
        json.dump(
            dict(
                shapes=dict(n_slots=n_slots, L=L, R=R, G=G, T=T, W=W,
                            rows=NROWS, chunk=CHUNK, iters=ITERS),
                reps=REPS,
                backend=jax.default_backend(),
                results=results,
                note=(
                    "tile-legal DMA designs; amortized (fori_loop) "
                    "timings. XLA-take baseline curve in GATHER_RATE.json"
                ),
            ),
            f,
            indent=1,
        )
    log("wrote PALLAS_GATHER.json")


if __name__ == "__main__":
    main()
