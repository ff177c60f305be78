"""Sweep the global engine's query-time execution knobs at bench scale.

VERDICT #3 follow-up. The A/B of the continuous-batching scheduler
(scripts/ab_continuous.py) measured NEGATIVE on the bench dataset —
iteration counts are uniform on homogeneous synthetic data (batch
efficiency already ~74%), so scheduling reclaims nothing. The remaining
lever is the per-iteration shape: candidate_chunk and filter_expand are
QUERY-TIME knobs (the index layout does not depend on them), and the
round-1 numbers ran chunk=512 (~67 iterations per query at delta=0.95)
while the engine's stage budget was tuned at chunk=2048.

Builds the 1.18M global index ONCE, then measures (chunk, fx) x delta
on 512 queries. Writes GLOBAL_KNOBS.json; bench.py's lsh sweep picks up
the winner via LSH_AT_09.json when scripts/sweep_lsh09.py re-runs.

Run: python -m scripts.sweep_global_knobs
"""

import itertools
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

K = 10
SUB = int(os.environ.get("SWEEP_Q", 512))
CHUNKS = tuple(
    int(c) for c in os.environ.get("SWEEP_CHUNKS", "512,1024,2048,4096").split(",")
)
FXS = tuple(int(f) for f in os.environ.get("SWEEP_FXS", "4,8").split(","))
REPS = int(os.environ.get("BENCH_LSH_REPS", 7))
DELTAS = tuple(
    float(d) for d in os.environ.get("SWEEP_DELTAS", "0.9,0.95").split(",")
)


def log(m):
    print(f"[sweep_global_knobs] {m}", file=sys.stderr, flush=True)


def main():
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from bench import get_dataset, wait_for_tpu

    wait_for_tpu()
    import jax.numpy as jnp

    from clann_tpu.config import Config
    from clann_tpu.core.index import build_index
    from clann_tpu.metrics.recall import recall_values
    from clann_tpu.ops.global_query import global_search

    train, test, gt_d, gt_i = get_dataset()
    test, gt_d = test[:SUB], gt_d[:SUB]
    cfg = Config(
        num_tables=50, num_clusters_factor=0.4, k=K, seed=0,
        lsh_engine="global", dataset_name=f"knobs-{train.shape[0]}",
    )
    t0 = time.time()
    index = build_index(train, cfg)
    log(f"built in {time.time()-t0:.0f}s")

    rows = []
    for chunk, fx in itertools.product(CHUNKS, FXS):
        idx = index.replace(
            config=cfg.replace(candidate_chunk=chunk, filter_expand=fx)
        )
        for delta in DELTAS:
            try:
                global_search(idx, test[:256], k=K, delta=delta,
                              batch_size=256)  # warm/compile
                per_rep = []
                for _ in range(REPS):  # bench.py protocol: median of reps
                    t0 = time.time()
                    d, _, st = global_search(idx, test, k=K, delta=delta,
                                             batch_size=256)
                    per_rep.append(SUB / (time.time() - t0))
            except Exception as e:
                log(f"chunk={chunk} fx={fx} delta={delta}: FAILED {e}")
                continue
            r, _, _ = recall_values(gt_d, d, count=K)
            row = {
                "chunk": chunk, "fx": fx, "delta": delta,
                "qps": round(float(np.median(per_rep)), 1),
                "recall": round(float(r), 4),
                "dc_per_query": round(
                    float(st.distance_computations.mean()), 1),
                "per_rep_qps": [round(q, 1) for q in per_rep],
            }
            rows.append(row)
            log(f"chunk={chunk} fx={fx} delta={delta}: "
                f"QPS={row['qps']:7.1f} recall={row['recall']:.4f} "
                f"dc/q={row['dc_per_query']:.0f}")

    out = {"n": int(train.shape[0]), "num_tables": 50, "queries": SUB,
           "rows": rows}
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        os.environ.get("SWEEP_OUT", "GLOBAL_KNOBS.json"),
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    log(f"wrote {path}")


if __name__ == "__main__":
    main()
