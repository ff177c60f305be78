"""L sweep at the nytimes-256 target shape (VERDICT r2 #6).

NYTIMES_SHAPE round 2 measured the delta-guaranteed engine at L=50 pinned:
delta=0.99 at k=100 rescored 82% of the corpus (dc/q=239k, 4.9 QPS). The
reference's own answer to a hard config is MORE TABLES (its demo runs
L=84, src/main.rs:22-29): failure probability falls as
(1-p^depth)^t * (1-p^{depth+1})^{L-t} (independent.hpp:108-119), so a
higher L lets the walk terminate at a higher depth where buckets are
small — trading hash-table memory for candidate volume. This sweeps
L in {50, 84, 128, 200} (plus a pooled-source row at the largest L — the
reference's cheap-hashing option for high L, pool.hpp:24-55) and records
recall / dc/q / QPS under the standard LSH protocol.

Run: python -m scripts.exp_nyt_lsweep   -> NYT_LSWEEP.json
"""

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

N, D, NQ, K, DELTA = 290_000, 256, 10_000, 100, 0.99
LS = tuple(int(x) for x in os.environ.get("NYT_LS", "50,84,128,200").split(","))
LSH_Q = int(os.environ.get("NYT_LSH_Q", 512))
REPS = int(os.environ.get("BENCH_LSH_REPS", 5))


def log(m):
    print(f"[nyt_lsweep] {m}", file=sys.stderr, flush=True)


def main():
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from bench import wait_for_tpu
    from scripts.run_nytimes_shape import get_dataset

    wait_for_tpu()

    from clann_tpu.config import Config
    from clann_tpu.core.index import build_index
    from clann_tpu.metrics.recall import recall_values
    from clann_tpu.ops.global_query import global_search

    train, test, gt_d, gt_i = get_dataset()
    sub = test[:LSH_Q]
    rows = []

    def run_one(L, source):
        cfg = Config(
            num_tables=L, num_clusters_factor=0.4, k=K, delta=DELTA,
            seed=0, dataset_name=f"nyt-lsweep-{L}-{source}",
            hash_source=source, lsh_engine="global", dense_layout=False,
            candidate_chunk=2048, filter_expand=8,
        )
        t0 = time.time()
        index = build_index(train, cfg)
        build_s = time.time() - t0
        log(f"L={L} source={source}: built in {build_s:.0f}s")
        global_search(index, sub[:256], k=K, delta=DELTA,
                      batch_size=256)  # warm/compile
        per_rep = []
        for _ in range(REPS):
            t0 = time.time()
            d, _, st = global_search(index, sub, k=K, delta=DELTA,
                                     batch_size=256)
            per_rep.append(LSH_Q / (time.time() - t0))
        qps = float(np.median(per_rep))
        r, _, _ = recall_values(gt_d[:LSH_Q], d, count=K)
        dc = float(st.distance_computations.mean())
        mem = int(index.memory_usage())
        row = {
            "L": L, "source": source, "qps": round(qps, 1),
            "recall": round(float(r), 4), "dc_per_query": round(dc, 1),
            "build_seconds": round(build_s, 1),
            "index_gb": round(mem / 1e9, 3),
            "per_rep_qps": [round(q, 1) for q in per_rep],
            "contract_pass": bool(r >= 0.8 * DELTA),
            "gate_pass": bool(r >= 0.9 * DELTA),
        }
        rows.append(row)
        log(f"L={L} {source}: QPS={qps:.1f} recall={r:.4f} dc/q={dc:.0f}")
        del index

    for L in LS:
        try:
            run_one(L, "independent")
        except Exception as e:
            log(f"L={L} failed: {type(e).__name__}: {e}")
            rows.append({"L": L, "source": "independent",
                         "error": str(e)[:300]})
    try:
        run_one(max(LS), "pool")
    except Exception as e:
        log(f"pool failed: {type(e).__name__}: {e}")
        rows.append({"L": max(LS), "source": "pool", "error": str(e)[:300]})

    out = {"n": N, "d": D, "k": K, "delta": DELTA, "queries": LSH_Q,
           "protocol": f"batch256 chunk2048 fx8 median of {REPS}",
           "baseline_round2": {"L": 50, "qps": 4.9, "dc_per_query": 239_000},
           "rows": rows}
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "NYT_LSWEEP.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    log(f"wrote {path}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
