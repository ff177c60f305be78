"""Decompose the fused-scan path against its VMEM-traffic floor (#4).

Measured conclusions (2026-08-19, v5e via relay, 1.18M x 100, 10k
queries, block_n=32768, nb=64, qt=512):

- KERNEL-ONLY is AT ITS FLOOR: 61ms per 10k queries vs the ~60ms
  write-once-read-once bound on the 47GB score volume (round 1's "92ms
  kernel-only" bundled selection work). bf16 tile emission measured
  neutral (61.0ms both) — the kernel is VMEM-traffic bound, not ALU
  bound.
- group_r pre-reduction is a DEAD END on hardware: the 4-D
  reshape+reduce hangs the Mosaic compiler outright at these tile
  shapes, and the 2-D strided-slice alternative lowers to an
  unsupported gather. Both kept interpret-only (tests cover semantics);
  the floor measurement shows they could not have paid anyway.
- The remaining e2e gap (111ms one-call e2e vs 61ms kernel) is the
  POST-KERNEL TAIL: top-k selection over the packed winners, the exact
  rescore row gathers, and the final host pull. This script decomposes
  it and sweeps pipelined query chunking (scan_search batch_q), which
  overlaps one chunk's tail with the next chunk's kernel.

Run: python -m scripts.exp_kernel_floor
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

K = 10
REPS = int(os.environ.get("REPS", 8))


def log(m):
    print(f"[exp_kernel_floor] {m}", file=sys.stderr, flush=True)


def median_time(fn, reps=REPS):
    fn()  # warm / compile
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return float(np.median(ts))


def main():
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from bench import get_dataset, wait_for_tpu

    wait_for_tpu()
    import jax
    import jax.numpy as jnp

    from clann_tpu.config import Config
    from clann_tpu.core.index import build_index
    from clann_tpu.metrics.recall import recall_values
    from clann_tpu.ops.ivf import _pallas_base, pallas_scan_plan, scan_search
    from clann_tpu.ops.pallas.scan_topk import (
        fused_scan_candidates_packed,
        fused_scan_topk_e2e,
    )

    train, test, gt_d, gt_i = get_dataset()
    cfg = Config(num_tables=2, num_clusters_factor=0.05, k=K, seed=0,
                 pack_slot_records=False)
    index = build_index(train, cfg)
    n = index.vectors.shape[0]
    block_n, num_bins, m_def, q_tile = pallas_scan_plan(n, K)
    base_p = _pallas_base(index, block_n)
    test_d = jax.device_put(jnp.asarray(test))
    _ = np.asarray(test_d[:1])
    interp = jax.default_backend() != "tpu"
    log(f"plan: block_n={block_n} nb={num_bins} qt={q_tile} n={n}")

    # pre-padded bf16 queries for kernel-only timing
    d = test.shape[1]
    dpad = base_p.shape[1]
    qn = test / np.maximum(
        np.linalg.norm(test, axis=-1, keepdims=True), 1e-30
    )
    Q = qn.shape[0]
    q_padn = ((Q + q_tile - 1) // q_tile) * q_tile
    qp = np.zeros((q_padn, dpad), np.float32)
    qp[:Q, :d] = qn
    qp[:Q, d] = 3.0
    qp_d = jax.device_put(jnp.asarray(qp, jnp.bfloat16))
    _ = np.asarray(qp_d[:1])

    # --- stage A: kernel + winner selection, no rescore, no bulk pull ---
    def kern(acc_bf16=False):
        v, i = fused_scan_candidates_packed(
            base_p, qp_d, n_real=n, num_bins=num_bins,
            block_n=block_n, q_tile=q_tile, biased=True,
            acc_bf16=acc_bf16, interpret=interp,
        )
        # force completion without paying the (Q, nb) pull
        return np.asarray(v[:1, :1])

    k_ms = median_time(kern) * 1000
    log(f"kernel+select (f32 tile): {k_ms:6.1f}ms per {Q} queries")
    k_ms_b = median_time(lambda: kern(acc_bf16=True)) * 1000
    log(f"kernel+select (bf16 tile): {k_ms_b:6.1f}ms")

    # --- stage B: one-call e2e, forced but not pulled ---
    def e2e_noPull():
        s, i = fused_scan_topk_e2e(
            base_p, index.vectors, test_d, n_real=n, k=K,
            rescore_m=m_def, num_bins=num_bins, block_n=block_n,
            q_tile=q_tile, normalize=True, biased=True, interpret=interp,
        )
        return np.asarray(s[:1, :1])

    b_ms = median_time(e2e_noPull) * 1000
    log(f"e2e minus bulk pull: {b_ms:6.1f}ms  "
        f"(tail minus pull = {b_ms - k_ms:.1f}ms)")

    # --- stage C: one-call e2e with the full (Q, k) pull ---
    def e2e_pull():
        s, i = fused_scan_topk_e2e(
            base_p, index.vectors, test_d, n_real=n, k=K,
            rescore_m=m_def, num_bins=num_bins, block_n=block_n,
            q_tile=q_tile, normalize=True, biased=True, interpret=interp,
        )
        return np.asarray(s), np.asarray(i)

    c_ms = median_time(e2e_pull) * 1000
    log(f"e2e with pull:       {c_ms:6.1f}ms  (pull = {c_ms - b_ms:.1f}ms)")

    # --- stage D: pipelined chunking through the production scan_search ---
    for bq in (Q, Q // 2, Q // 4, Q // 8):
        def run():
            dd, ii, st = scan_search(index, test_d, k=K, use_pallas=True,
                                     batch_q=bq)
            return dd, ii

        el = median_time(run)
        dd, ii = run()
        r, _, _ = recall_values(gt_d, dd, count=K)
        log(f"scan_search batch_q={bq:5d}: QPS={Q/el:7.0f} "
            f"({el*1000:5.0f}ms) recall={r:.4f}")


if __name__ == "__main__":
    main()
