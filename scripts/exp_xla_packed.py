"""Can pure XLA run the packed-bin-argmax candidate generation?

Round-4 probe: a fused `jnp.max(A @ B, axis=0)` runs the full 1.18M x
10k x 100 scoring + reduction in ~43ms on this chip — faster than the
Pallas kernel's ~63ms candidate-generation pass — because XLA fuses the
elementwise epilogue and the row reduction into the matmul without
materializing the (n, q) score tile in HBM. The kernel's whole job is
exactly (matmul -> order-preserving int32 pack -> per-bin max), all of
which ARE matmul-epilogue-fusable ops. This measures the XLA formulation:

    S    = [A | 1] @ [B | 3]^T            # scores in [2, 4): positive
    P    = (bitcast_i32(S) & ~LOW) | iota # order-preserving pack + id
    W    = max over per-bin rows          # (num_bins, q) winners

at the bench shape, against the same-shape jnp.max floor and the
measured kernel numbers. If W-time is ~floor, the TPU answer to "fused
scan kernel" is XLA itself, and the Pallas kernel becomes the fallback.

Run: python -m scripts.exp_xla_packed       -> XLA_PACKED.json
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

N = int(os.environ.get("XP_N", 1_183_514))
D = int(os.environ.get("XP_D", 100))
Q = int(os.environ.get("XP_Q", 10_000))
REPS = int(os.environ.get("XP_REPS", 5))
PER_BIN = int(os.environ.get("XP_PER_BIN", 512))  # iota bits: 9
LOW_BITS = int(os.environ.get("XP_LOW_BITS", 10))


def log(m):
    print(f"[xla_packed] {m}", file=sys.stderr, flush=True)


def main():
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from bench import wait_for_tpu

    wait_for_tpu()
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    A_h = rng.standard_normal((N, D), dtype=np.float32)
    A_h /= np.linalg.norm(A_h, axis=1, keepdims=True)
    B_h = rng.standard_normal((Q, D), dtype=np.float32)
    B_h /= np.linalg.norm(B_h, axis=1, keepdims=True)

    n_bins = -(-N // PER_BIN)
    n_pad = n_bins * PER_BIN
    # bias column: base gets 1.0, query gets 3.0 -> scores = dot + 3 in
    # (2, 4) for unit vectors: positive, so f32 bitcast order-preserving
    A_p = np.zeros((n_pad, D + 1), np.float32)
    A_p[:N, :D] = A_h
    A_p[:N, D] = 1.0
    # padding rows: score stays 0 (bias col 0) -> never wins a bin
    B_p = np.concatenate([B_h, np.full((Q, 1), 3.0, np.float32)], axis=1)

    A_d = jnp.asarray(A_p).astype(jnp.bfloat16)
    B_d = jnp.asarray(B_p).astype(jnp.bfloat16)

    results = {}

    def timed(name, fn, *args):
        out = fn(*args)
        _ = np.asarray(out)  # warm + sync (block_until_ready lies here)
        per = []
        for _ in range(REPS):
            t0 = time.time()
            out = fn(*args)
            _ = np.asarray(out)
            per.append(time.time() - t0)
        el = float(np.median(per))
        results[name] = {
            "ms": round(el * 1e3, 1),
            "per_rep_ms": [round(t * 1e3, 1) for t in per],
        }
        log(f"{name}: {el*1e3:.1f} ms (reps {[round(t*1e3) for t in per]})")
        return out

    # floor: fused matmul + plain max over rows
    @jax.jit
    def floor_max(a, b):
        s = jax.lax.dot(a, b.T, preferred_element_type=jnp.float32)
        return jnp.max(s, axis=0)

    timed("floor_matmul_max", floor_max, A_d, B_d)

    # the packed candidate generation, pure XLA. The one-shot
    # formulation does NOT fuse: the windowed (per-bin) reduce defeats
    # the matmul's reduce epilogue and XLA materializes the full
    # s32[n, q] tile (47GB -> HBM OOM at compile, measured this round;
    # only FULL-axis reductions fuse). So the practical XLA shape is
    # blocked: bounded (rows_step, q_chunk) materialization per step,
    # paying the score tile's HBM write+read — the exact traffic the
    # Mosaic kernel exists to avoid.
    low_mask = jnp.int32(~((1 << LOW_BITS) - 1))
    iota_step = None  # set below per step size
    assert n_bins % 8 == 0
    bins_step = n_bins // 8
    rows_step = bins_step * PER_BIN
    iota_step = jnp.arange(rows_step, dtype=jnp.int32) % PER_BIN
    Q_CHUNK = 2048

    @jax.jit
    def packed_bins_blocked(a, b):
        outs_q = []
        for q0 in range(0, Q, Q_CHUNK):
            blk_q = jax.lax.dynamic_slice_in_dim(b, q0, Q_CHUNK, axis=0)
            outs_n = []
            for s0 in range(0, n_pad, rows_step):
                blk_a = jax.lax.dynamic_slice_in_dim(a, s0, rows_step, 0)
                s = jax.lax.dot(blk_a, blk_q.T,
                                preferred_element_type=jnp.float32)
                p = jax.lax.bitcast_convert_type(s, jnp.int32)
                p = (p & low_mask) | iota_step[:, None]
                outs_n.append(
                    jnp.max(p.reshape(bins_step, PER_BIN, -1), axis=1)
                )
            outs_q.append(jnp.concatenate(outs_n, axis=0))
        return jnp.concatenate(outs_q, axis=1)  # (n_bins, Q)

    W = timed("packed_bin_argmax_blocked", packed_bins_blocked, A_d, B_d)

    # correctness: decode the global argmax per query from the packed
    # winners and compare to the true argmax of the f32 scores
    W_h = np.asarray(W)
    best_bin = W_h.argmax(axis=0)
    best_in_bin = W_h.max(axis=0) & ((1 << LOW_BITS) - 1)
    ids = best_bin * PER_BIN + best_in_bin
    S_true = (A_p[:N, :D].astype(np.float64) @ B_h[:256].T.astype(np.float64))
    true_ids = S_true.argmax(axis=0)
    # bf16 scoring quantizes; accept the packed winner if its true score
    # is within bf16-epsilon of the true max
    got = S_true[ids[:256], np.arange(256)]
    top = S_true[true_ids, np.arange(256)]
    close = np.mean(got >= top - 2 * 0.0079)  # 2 ulp of bf16 at ~1.0
    results["argmax_agreement_256q"] = round(float(close), 4)
    log(f"packed winner within 2 bf16-ulp of true max: {close:.4f}")

    out = {
        "n": N, "d": D, "q": Q, "per_bin": PER_BIN, "n_bins": n_bins,
        "low_bits": LOW_BITS, "reps": REPS,
        "kernel_reference_ms": {
            "pallas_candidate_gen": 63,
            "pallas_e2e_per_10k": 80,
            "note": "PERFORMANCE.md round-3/4 measured kernel numbers",
        },
        "results": results,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "XLA_PACKED.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    log(f"wrote {path}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
