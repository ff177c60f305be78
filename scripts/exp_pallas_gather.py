"""Can Mosaic issue random gathers at the memory system's rate? (r3 #1)

VERDICT round 2 asked for the fused Pallas probe kernel (gather -> sketch
filter -> compact) to be built, OR a committed kernel experiment measuring
whether Mosaic can issue gathers at the ~40-50ns/lane rate XLA's gather
achieves (the global LSH engine's two gathers sit at that floor and are
>50% of its per-iteration budget; the rest is XLA glue worth ~1.5-1.9x).

This experiment measures the candidate mechanisms a Pallas probe kernel
would have to be built on, at the engine's production shapes
(records table = (L=50, nb=74k, G*R=64) uint32, i.e. 16 packed records of
4 words per block row; window = Q*WB = 512*1024 = 524k block gathers per
loop iteration):

  A. XLA one-axis take (the engine's current gather) at block widths
     G in {16, 32, 64} — the baseline AND the cheap existing knob
     (config.gather_block was never swept above 16).
  B. Pallas kernel issuing one async DMA per block row
     (table_hbm.at[idx] -> out row), NSEM in {8, 16, 32} copies in
     flight — the ring-buffer prefetch loop of the reference
     (collection.hpp:793-904) transliterated to TPU DMA.
  C. Same kernel at 1KB rows (G=64): fewer, fatter DMAs — if DMA *count*
     is the bottleneck, fat rows win and the engine should raise G.

Run: python -m scripts.exp_pallas_gather
"""

import functools
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


def make_dma_gather(W, CHUNK, NSEM, interpret):
    """pallas_call: out[i] = table[idx[i]] via per-row async DMA."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(idx_ref, table_ref, out_ref, sems):
        def start(i):
            slot = jax.lax.rem(i, NSEM)
            pltpu.make_async_copy(
                table_ref.at[idx_ref[0, i]], out_ref.at[i], sems.at[slot]
            ).start()

        def wait(i):
            slot = jax.lax.rem(i, NSEM)
            pltpu.make_async_copy(
                table_ref.at[idx_ref[0, i]], out_ref.at[i], sems.at[slot]
            ).wait()

        for i in range(NSEM):
            start(jnp.int32(i))

        def body(i, _):
            wait(i)

            @pl.when(i + NSEM < CHUNK)
            def _():
                start(i + NSEM)

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
                (CHUNK, W), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct(
                (n_chunks * CHUNK, W), jnp.uint32
            ),
            scratch_shapes=[pltpu.SemaphoreType.DMA((NSEM,))],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
            ),
            interpret=interpret,
        )(idx2d, table)

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

    # production record-table shape: n=1.18M slots x L=50 tables x R=4
    # words, G=16 -> (L*nb, 64) u32 block rows
    n_slots, L, R = 1_183_520, 50, 4
    QB = 512 * 1024 if not interp else 2048  # window block gathers/iter
    rng = np.random.default_rng(0)

    results = {}
    for G in (16, 32, 64):
        nb = n_slots // G
        T, W = L * nb, G * R
        table = jnp.arange(T * W, dtype=jnp.uint32).reshape(T, W)
        table = jax.device_put(table)
        nrows = QB // (G // 16)  # same candidate volume at every G
        idx = jnp.asarray(
            rng.integers(0, T, size=(nrows,), dtype=np.int32)
        )
        idx = jax.device_put(idx)
        _ = np.asarray(idx[:1])

        take = jax.jit(lambda t, i: t[i])
        el = median_time(
            lambda: np.asarray(take(table, idx)[:1, :1])
        )
        ns = el * 1e9 / nrows
        results[f"xla_take_G{G}"] = dict(
            rows=nrows, row_bytes=W * 4, ms=el * 1e3, ns_per_row=ns,
            ns_per_16blk=ns / (G // 16),
        )
        log(
            f"A: XLA take G={G:3d} ({W*4:5d}B rows): {el*1e3:7.1f}ms "
            f"for {nrows} rows = {ns:6.1f}ns/row "
            f"({ns/(G//16):6.1f}ns per 16-record block)"
        )

        # B/C: Pallas DMA gather at this width
        CHUNK = 1024
        idx2d = idx[: (nrows // CHUNK) * CHUNK].reshape(-1, CHUNK)
        for NSEM in (8, 16, 32):
            try:
                run = make_dma_gather(W, CHUNK, NSEM, interp)
                runj = jax.jit(run)
                out = runj(idx2d, table)
                ok = bool(
                    jnp.array_equal(
                        out[:CHUNK], table[idx2d[0]]
                    )
                )
                el = median_time(lambda: np.asarray(runj(idx2d, table)[:1, :1]))
                nr = idx2d.size
                ns = el * 1e9 / nr
                results[f"pallas_dma_G{G}_s{NSEM}"] = dict(
                    rows=nr, row_bytes=W * 4, ms=el * 1e3, ns_per_row=ns,
                    ns_per_16blk=ns / (G // 16), correct=ok,
                )
                log(
                    f"B: Pallas DMA G={G:3d} NSEM={NSEM:2d}: {el*1e3:7.1f}ms "
                    f"for {nr} rows = {ns:6.1f}ns/row "
                    f"({ns/(G//16):6.1f}ns per 16-record block) "
                    f"correct={ok}"
                )
            except Exception as e:
                log(f"B: Pallas DMA G={G} NSEM={NSEM} FAILED: {type(e).__name__}: {e}")
                results[f"pallas_dma_G{G}_s{NSEM}"] = dict(error=str(e)[:500])
        del table

    import json

    with open("PALLAS_GATHER.json", "w") as f:
        json.dump(
            dict(
                shapes=dict(n_slots=n_slots, L=L, R=R, window_blocks=QB),
                reps=REPS,
                backend=jax.default_backend(),
                results=results,
            ),
            f,
            indent=1,
        )
    log("wrote PALLAS_GATHER.json")


if __name__ == "__main__":
    main()
