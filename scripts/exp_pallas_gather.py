"""Can Mosaic issue random gathers at the memory system's rate? (r3 #1)

VERDICT round 2 asked for the fused Pallas probe kernel (gather -> sketch
filter -> compact) to be built, OR a committed kernel experiment measuring
whether Mosaic can issue gathers at the ~40-50ns/lane rate XLA's gather
achieves (the global LSH engine's two gathers sit at that floor and are
>50% of its per-iteration budget; the rest is XLA glue worth ~1.5-1.9x).

Round-4 rewrite: the first attempt's per-row DMAs did not COMPILE —
Mosaic tiles i32 HBM memrefs as (8, 128) and rejects slices that are not
tile-aligned ("Slice shape along dimension 0 must be aligned to tiling
(8), but is 1"; dim 1 must be a multiple of 128). So the DMA designs here
are the tile-legal ones a production kernel could actually use:

  A. XLA one-axis take at block widths G in {16, 32, 64} — the baseline
     (full curve in GATHER_RATE.json: 22.1 / 17.9 / 23.6 ns/row; the
     floor is ISSUE RATE, not bandwidth — 28 GB/s << HBM).
  B. "page4k": records padded to one full (8, 128) i32 tile per row
     (4 KB); per-row DMA table.at[idx] is tile-aligned. Measures the
     pure DMA issue rate at 8x memory inflation.
  C. "group8": the PRODUCTION (T, 128) u32 table (G=32 blocks); each DMA
     fetches the aligned 8-row group containing the target row
     (table.at[ds(8*(idx//8), 8), :]) — tile-aligned, no memory
     inflation, 8x byte overfetch. If DMA count is the bottleneck this
     is the engine-usable shape.
  D. "flat1d": 1-D (T*128,) u32 view, 128-aligned 128-word slices — the
     exact production row, IF Mosaic accepts lane-aligned 1-D slices.

Each variant sweeps NSEM copies in flight. Reference analog: the
ring-buffered prefetch loop of collection.hpp:793-904.

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

REPS = int(os.environ.get("REPS", 8))


def log(m):
    print(f"[exp_pallas_gather] {m}", file=sys.stderr, flush=True)


def median_time(fn, reps=REPS):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return float(np.median(ts))


def make_page_dma(CHUNK, NSEM, interpret, *, page=(8, 128)):
    """B: out[i] = table[idx[i]] where each row is one full (8,128) tile."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P0, P1 = page

    def kernel(idx_ref, table_ref, out_ref, sems):
        def copy(i):
            return pltpu.make_async_copy(
                table_ref.at[idx_ref[0, i]],
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

    def run(idx2d, table):
        n_chunks = idx2d.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec(
                    (1, CHUNK), lambda i: (i, 0), memory_space=pltpu.SMEM
                ),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(
                (CHUNK, P0, P1), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (n_chunks * CHUNK, P0, P1), jnp.uint32
            ),
            scratch_shapes=[pltpu.SemaphoreType.DMA((NSEM,))],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(idx2d, table)

    return run


def make_group8_dma(W, CHUNK, NSEM, interpret):
    """C: per-DMA fetch of the aligned 8-row group holding row idx[i].

    Source is the PRODUCTION (T, W) u32 table; the group slice
    (8, W) is tile-aligned for any W % 128 == 0. idx values here are
    PRE-DIVIDED group indices (idx//8 done outside)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(gidx_ref, table_ref, out_ref, sems):
        def copy(i):
            return pltpu.make_async_copy(
                table_ref.at[pl.ds(gidx_ref[0, i] * 8, 8), :],
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

    def run(gidx2d, table):
        n_chunks = gidx2d.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec(
                    (1, CHUNK), lambda i: (i, 0), memory_space=pltpu.SMEM
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
        )(gidx2d, table)

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
                flat_ref.at[pl.ds(idx_ref[0, i] * W, W)],
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

    def run(idx2d, flat):
        n_chunks = idx2d.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec(
                    (1, CHUNK), lambda i: (i, 0), memory_space=pltpu.SMEM
                ),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(
                (CHUNK * W,), lambda i: (i,), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n_chunks * CHUNK * W,), jnp.uint32),
            scratch_shapes=[pltpu.SemaphoreType.DMA((NSEM,))],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(idx2d, flat)

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
    NROWS = (512 * 1024 // 2) if not interp else 2048  # DMA rows per run
    CHUNK = 512
    rng = np.random.default_rng(0)
    results = {}

    def bench_variant(tag, runj, args, rows, bytes_per_row, useful_bytes):
        out = runj(*args)
        el = median_time(
            lambda: np.asarray(jax.tree_util.tree_leaves(runj(*args))[0])[:1]
        )
        ns = el * 1e9 / rows
        results[tag] = dict(
            rows=int(rows), row_bytes=int(bytes_per_row), ms=el * 1e3,
            ns_per_row=ns,
            gbps=rows * bytes_per_row / el / 1e9,
            useful_gbps=rows * useful_bytes / el / 1e9,
        )
        log(f"{tag}: {el*1e3:7.1f}ms for {rows} rows = {ns:6.1f}ns/row "
            f"({rows * bytes_per_row / el / 1e9:6.1f} GB/s moved, "
            f"{rows * useful_bytes / el / 1e9:6.1f} GB/s useful)")
        return out

    # ---- A: XLA take on the production (T, 128) table ----
    table = jnp.asarray(
        rng.integers(0, 2**32, size=(T, W), dtype=np.uint32)
    )
    idx = jnp.asarray(rng.integers(0, T, size=(NROWS,), dtype=np.int32))
    take = jax.jit(lambda t, i: t[i])
    el = median_time(lambda: np.asarray(take(table, idx)[:1, :1]))
    ns = el * 1e9 / NROWS
    results["xla_take_G32"] = dict(
        rows=NROWS, row_bytes=W * 4, ms=el * 1e3, ns_per_row=ns,
        gbps=NROWS * W * 4 / el / 1e9,
    )
    log(f"A: XLA take G=32 (512B rows): {el*1e3:7.1f}ms = {ns:6.1f}ns/row")

    # ---- B: page4k ----
    idx2d = idx[: (NROWS // CHUNK) * CHUNK].reshape(-1, CHUNK)
    n_pages = T // 8  # bound HBM: pages table replaces 8 rows per page
    pidx2d = jnp.asarray(
        rng.integers(0, n_pages, size=idx2d.shape, dtype=np.int32)
    )
    pages = jnp.asarray(
        rng.integers(0, 2**32, size=(n_pages, 8, 128), dtype=np.uint32)
    )
    for NSEM in (8, 16, 32):
        try:
            runj = jax.jit(make_page_dma(CHUNK, NSEM, interp))
            out = bench_variant(
                f"page4k_s{NSEM}", runj, (pidx2d, pages), pidx2d.size,
                4096, 4096,
            )
            ok = bool(jnp.array_equal(out[:CHUNK], pages[pidx2d[0]]))
            results[f"page4k_s{NSEM}"]["correct"] = ok
            if not ok:
                log(f"page4k_s{NSEM}: WRONG RESULTS")
        except Exception as e:  # noqa: BLE001 — record the failure mode
            log(f"page4k_s{NSEM} FAILED: {type(e).__name__}: {e}")
            results[f"page4k_s{NSEM}"] = dict(error=str(e)[:400])
    del pages

    # ---- C: group8 on the production table ----
    gidx2d = jnp.asarray(
        rng.integers(0, T // 8, size=idx2d.shape, dtype=np.int32)
    )
    for NSEM in (8, 16, 32):
        try:
            runj = jax.jit(make_group8_dma(W, CHUNK, NSEM, interp))
            out = bench_variant(
                f"group8_s{NSEM}", runj, (gidx2d, table), gidx2d.size,
                8 * W * 4, W * 4,  # 4KB moved, 512B useful
            )
            ok = bool(jnp.array_equal(
                out[: 8 * CHUNK].reshape(CHUNK, 8, W),
                table[(gidx2d[0][:, None] * 8
                       + jnp.arange(8)[None, :]).reshape(-1)].reshape(
                    CHUNK, 8, W),
            ))
            results[f"group8_s{NSEM}"]["correct"] = ok
            if not ok:
                log(f"group8_s{NSEM}: WRONG RESULTS")
        except Exception as e:  # noqa: BLE001
            log(f"group8_s{NSEM} FAILED: {type(e).__name__}: {e}")
            results[f"group8_s{NSEM}"] = dict(error=str(e)[:400])

    # ---- D: flat1d exact rows ----
    flat = table.reshape(-1)
    for NSEM in (8, 16, 32):
        try:
            runj = jax.jit(make_flat1d_dma(W, CHUNK, NSEM, interp))
            out = bench_variant(
                f"flat1d_s{NSEM}", runj, (idx2d, flat), idx2d.size,
                W * 4, W * 4,
            )
            ok = bool(jnp.array_equal(
                out[: CHUNK * W].reshape(CHUNK, W), table[idx2d[0]]
            ))
            results[f"flat1d_s{NSEM}"]["correct"] = ok
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
                            rows=NROWS, chunk=CHUNK),
                reps=REPS,
                backend=jax.default_backend(),
                results=results,
                note=(
                    "tile-legal DMA designs after Mosaic rejected per-row "
                    "slices of (T,256)-i32 (8,128)-tiled memrefs; "
                    "XLA-take baseline curve in GATHER_RATE.json"
                ),
            ),
            f,
            indent=1,
        )
    log("wrote PALLAS_GATHER.json")


if __name__ == "__main__":
    main()
