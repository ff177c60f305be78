"""A/B experiments for the fused Pallas scan kernel on the real chip.

Variants: q_tile sweep (HBM streams per query scale as 1/q_tile),
rescore_m sweep (row-gather count), packing cost.
Usage: python scripts/exp_scan.py [variant ...]
"""

import functools
import os
import sys
import time

import numpy as np

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "jax_comp_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax
import jax.numpy as jnp

from clann_tpu.ops.pallas.scan_topk import (
    fused_scan_candidates_packed,
    fused_scan_topk_e2e,
)
from clann_tpu.metrics.recall import recall_values


def log(m):
    print(m, file=sys.stderr, flush=True)


def timed(fn, reps=8):
    fn()
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    return (time.time() - t0) / reps, out


def main():
    log(f"devices: {jax.devices()}")
    z = np.load(os.path.expanduser(
        "~/.cache/clann_tpu/bench_1183514x100_q10000.npz"))
    train, test, gt_d = z["train"], z["test"], z["gt_d"]
    n, d = train.shape
    Q = test.shape[0]
    k = 10

    # normalized base, padded bf16
    tn = train / np.maximum(
        np.linalg.norm(train, axis=1, keepdims=True), 1e-30)
    block_n = 32768
    dpad = 128
    n_pad = ((n + block_n - 1) // block_n) * block_n
    base_p = jnp.zeros((n_pad, dpad), jnp.bfloat16)
    base_p = base_p.at[:n, :d].set(jnp.asarray(tn, jnp.bfloat16))
    base_b = base_p.at[:n, d].set(jnp.bfloat16(1.0))  # bias column variant
    base_f32 = jnp.asarray(tn, jnp.float32)
    q_dev = jax.device_put(jnp.asarray(test, jnp.float32))
    _ = np.asarray(q_dev[:1])
    log(f"base resident: {n}x{d} (pad {n_pad}x{dpad})")

    variants = sys.argv[1:] or ["e2e256", "e2e512", "e2e1024",
                                "kern256", "kern512",
                                "resc16", "resc8"]

    def run_e2e(q_tile, rescore_m=32, num_bins=64, bn=block_n, biased=False):
        def call():
            s, i = fused_scan_topk_e2e(
                base_b if biased else base_p, base_f32, q_dev, n_real=n,
                k=k, rescore_m=rescore_m, num_bins=num_bins, block_n=bn,
                q_tile=q_tile, normalize=True, biased=biased)
            packed = jnp.concatenate(
                [jax.lax.bitcast_convert_type(s, jnp.int32), i], axis=1)
            flat = np.asarray(packed)
            return np.ascontiguousarray(
                flat[:, :k]).view(np.float32), flat[:, k:]
        el, (dots, ids) = timed(call)
        dists = np.where(ids >= 0, np.clip(1.0 - dots, 0, 2), np.inf)
        r, _, _ = recall_values(gt_d, dists, count=k)
        log(f"e2e qt={q_tile} m={rescore_m} nb={num_bins} bn={bn}: "
            f"{el*1000:.1f}ms QPS={Q/el:.0f} recall={r:.4f}")

    def run_kern(q_tile, num_bins=64, bn=block_n):
        q_pad = ((Q + q_tile - 1) // q_tile) * q_tile
        qn = q_dev / jnp.linalg.norm(q_dev, axis=1, keepdims=True)
        qp = jnp.zeros((q_pad, dpad), jnp.bfloat16)
        qp = qp.at[:Q, :d].set(qn.astype(jnp.bfloat16))
        qp = jax.device_put(qp)
        _ = np.asarray(qp[:1, :1])

        f = jax.jit(functools.partial(
            fused_scan_candidates_packed, n_real=n, num_bins=num_bins,
            block_n=bn, q_tile=q_tile))

        def call():
            v, i = f(base_p, qp)
            v.block_until_ready()
            return np.asarray(v[:1, :1])
        el, _ = timed(call)
        log(f"kern qt={q_tile} nb={num_bins} bn={bn}: {el*1000:.1f}ms "
            f"({Q/el:.0f} QPS kernel-only)")

    for v in variants:
        if v == "e2e256":
            run_e2e(256)
        elif v == "e2e512":
            run_e2e(512)
        elif v == "e2e1024":
            run_e2e(1024)
        elif v == "kern256":
            run_kern(256)
        elif v == "kern512":
            run_kern(512)
        elif v == "kern1024":
            run_kern(1024)
        elif v == "resc16":
            run_e2e(512, rescore_m=16)
        elif v == "resc8":
            run_e2e(512, rescore_m=8)
        elif v == "bias256":
            run_e2e(256, biased=True)
        elif v == "bias512":
            run_e2e(512, biased=True)
        elif v == "bias512n128":
            run_e2e(512, num_bins=128, biased=True)
        elif v == "bias512b64k":
            run_e2e(512, bn=65536, biased=True)
        else:
            log(f"unknown variant {v}")


if __name__ == "__main__":
    main()
