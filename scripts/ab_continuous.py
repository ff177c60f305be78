"""A/B the continuous-batching LSH driver against the plain batched one.

VERDICT #3: the global engine's batch while_loop runs to its slowest
query (~60 iterations when the mean needs ~6), and done queries' lanes
still issue their window gathers. global_search_continuous keeps lanes
filled from a pending-query queue between bounded loop steps. This
measures both drivers on the bench dataset at the delta points the bench
reports (0.9 parity, 0.95 = the recall>=0.9 gate), same recall/dc by
construction (per-query walks are schedule-independent — tested exact in
tests/test_global_query.py::TestContinuousBatching).

Run: python -m scripts.ab_continuous          (1.18M bench dataset)
     BENCH_N=200000 python -m scripts.ab_continuous
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
SUB = int(os.environ.get("AB_Q", 512))


def log(m):
    print(f"[ab_continuous] {m}", file=sys.stderr, flush=True)


def main():
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from bench import get_dataset, wait_for_tpu

    wait_for_tpu()

    from clann_tpu.config import Config
    from clann_tpu.core.index import build_index
    from clann_tpu.metrics.recall import recall_values
    from clann_tpu.ops.global_query import (
        global_search,
        global_search_continuous,
    )

    train, test, gt_d, gt_i = get_dataset()
    test = test[:SUB]
    gt_d = gt_d[:SUB]
    cfg = Config(
        num_tables=50, num_clusters_factor=0.4, k=K, seed=0,
        lsh_engine="global", dataset_name=f"ab-{train.shape[0]}",
    )
    t0 = time.time()
    index = build_index(train, cfg)
    log(f"built in {time.time() - t0:.0f}s n={train.shape[0]}")

    for delta in (0.9, 0.95):
        # plain batched driver (the round-1 bench path)
        global_search(index, test[:256], k=K, delta=delta, batch_size=256)
        t0 = time.time()
        d0, _, st0 = global_search(
            index, test, k=K, delta=delta, batch_size=256
        )
        el0 = time.time() - t0
        r0, _, _ = recall_values(gt_d, d0, count=K)
        log(
            f"delta={delta} batched:    QPS={SUB/el0:6.1f} recall={r0:.4f}"
            f" dc/q={st0.distance_computations.mean():.0f}"
        )

        for lanes, si in ((256, 4), (256, 8), (256, 16), (128, 8)):
            global_search_continuous(
                index, test[: lanes + 1], k=K, delta=delta, lanes=lanes,
                step_iters=si,
            )  # warm both jit shapes
            t0 = time.time()
            d1, _, st1 = global_search_continuous(
                index, test, k=K, delta=delta, lanes=lanes, step_iters=si
            )
            el1 = time.time() - t0
            r1, _, _ = recall_values(gt_d, d1, count=K)
            log(
                f"delta={delta} cont l={lanes} s={si:2d}: QPS={SUB/el1:6.1f}"
                f" recall={r1:.4f} dc/q={st1.distance_computations.mean():.0f}"
                f" ({el1:.1f}s, {el0/el1:.2f}x base)"
            )


if __name__ == "__main__":
    main()
