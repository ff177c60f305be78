"""Push the fused-scan kernel toward its VMEM-traffic floor (VERDICT #4).

Round-1 measurement: the packed kernel spends ~92ms per 10k queries at
1.18M x 100 — ~2.7 read/write round trips of the 47GB score volume vs a
write-once-read-once floor of ~60ms. The named lever is FEWER passes over
the score tile. Two implemented variants (ops/pallas/scan_topk.py):

- group_r: pre-reduce groups of R consecutive rows with ONE plain max (a
  single cheap pass), so the pack/mask/or/max chain touches only 1/R of
  the tile. Winners become group-granular; the e2e rescore evaluates all
  R rows of each winning group exactly (rescore width m*R, measured flat
  to ~64 rows).
- acc_bf16: bf16 matmul output — halves score-tile bytes end to end.

This sweeps both, reporting kernel-only ms / e2e QPS / recall on the
bench dataset. Run: python -m scripts.exp_kernel_floor
"""

import itertools
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
    from clann_tpu.ops.ivf import _pallas_base, pallas_scan_plan
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

    for group_r, acc_bf16 in itertools.product((1, 2, 4, 8), (False, True)):
        try:
            def kern():
                v, i = fused_scan_candidates_packed(
                    base_p, qp_d, n_real=n, num_bins=num_bins,
                    block_n=block_n, q_tile=q_tile, biased=True,
                    group_r=group_r, acc_bf16=acc_bf16, interpret=interp,
                )
                # block_until_ready does NOT block through the relay
                # (ROUND_NOTES); materialize one element to force the
                # kernel without paying the full (Q, nb) pull
                return np.asarray(v[:1, :1])

            kern()
            ts = []
            for _ in range(REPS):
                t0 = time.time()
                kern()
                ts.append(time.time() - t0)
            k_ms = float(np.median(ts)) * 1000

            def e2e():
                s, i = fused_scan_topk_e2e(
                    base_p, index.vectors, test_d, n_real=n, k=K,
                    rescore_m=m_def, num_bins=num_bins, block_n=block_n,
                    q_tile=q_tile, normalize=True, biased=True,
                    group_r=group_r, acc_bf16=acc_bf16, interpret=interp,
                )
                return np.asarray(s), np.asarray(i)

            e2e()
            ts = []
            for _ in range(REPS):
                t0 = time.time()
                s, i = e2e()
                ts.append(time.time() - t0)
            el = float(np.median(ts))
            dist = np.where(i >= 0, 1.0 - s, np.inf)
            r, _, _ = recall_values(gt_d, dist, count=K)
            idr = float(np.mean([
                len(set(a.tolist()) & set(b.tolist())) / K
                for a, b in zip(i, gt_i[:, :K])
            ]))
            log(f"R={group_r} bf16={int(acc_bf16)}: kernel={k_ms:6.1f}ms "
                f"e2e QPS={Q/el:7.0f} ({el*1000:5.0f}ms) recall={r:.4f} "
                f"id_recall={idr:.4f}")
        except Exception as e:
            log(f"R={group_r} bf16={int(acc_bf16)}: FAILED {e}")


if __name__ == "__main__":
    main()
