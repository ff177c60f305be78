"""Sweep the fused-scan rescore budget (rescore_m) on the real chip.

The packed kernel emits quantized bin winners; the e2e path exactly
re-scores the best `rescore_m` of them per query (one row gather each,
~45ns/lane on v5e — PERFORMANCE.md). At the bench shape that gather is
~14ms of the ~92ms end-to-end call at m=32, so halving m is worth ~8%
QPS IF the quantized ranking rarely demotes a true top-k candidate past
position m. This measures that recall/QPS trade at the headline scale.

Run: python -m scripts.tune_rescore  (uses the bench.py dataset cache).
"""

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

K = 10
REPS = int(os.environ.get("REPS", 10))


def log(m):
    print(f"[tune_rescore] {m}", file=sys.stderr, flush=True)


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import get_dataset, wait_for_tpu

    wait_for_tpu()
    import jax
    import jax.numpy as jnp

    from clann_tpu.config import Config
    from clann_tpu.core.index import build_index
    from clann_tpu.metrics.recall import recall_values
    from clann_tpu.ops.ivf import _pallas_base, pallas_scan_plan
    from clann_tpu.ops.pallas.scan_topk import fused_scan_topk_e2e

    train, test, gt_d, gt_i = get_dataset()
    cfg = Config(num_tables=2, num_clusters_factor=0.05, k=K, seed=0,
                 pack_slot_records=False)
    index = build_index(train, cfg)
    n = index.vectors.shape[0]
    block_n, num_bins, m_def, q_tile = pallas_scan_plan(n, K)
    base_p = _pallas_base(index, block_n)
    test_d = jax.device_put(jnp.asarray(test))
    _ = np.asarray(test_d[:1])
    log(f"plan: block_n={block_n} nb={num_bins} m_default={m_def} qt={q_tile}")

    for m in (64, 32, 24, 16, 10):
        def run():
            s, i = fused_scan_topk_e2e(
                base_p, index.vectors, test_d, n_real=n, k=K,
                rescore_m=m, num_bins=num_bins, block_n=block_n,
                q_tile=q_tile, normalize=True, biased=True,
                interpret=(jax.default_backend() != "tpu"),
            )
            return np.asarray(s), np.asarray(i)
        run()  # compile/warm
        t0 = time.time()
        for _ in range(REPS):
            s, i = run()
        el = (time.time() - t0) / REPS
        # invalid candidates (ids < 0, -inf sims) map to inf distance, as
        # the production path does (ops/ivf.py:236)
        d = np.where(i >= 0, 1.0 - s, np.inf)
        r, _, _ = recall_values(gt_d, d, count=K)
        idr = float(np.mean([
            len(set(a.tolist()) & set(b.tolist())) / K
            for a, b in zip(i, gt_i[:, :K])
        ]))
        log(f"m={m:3d}: QPS={len(test)/el:7.0f} ({el*1000:.0f}ms) "
            f"recall={r:.4f} id_recall={idr:.4f}")


if __name__ == "__main__":
    main()
