"""Measure the fused-Pallas-scan vs plain-scan crossover (VERDICT r2 #4).

GLOVE25_SHAPE round 2 showed the flagship kernel losing 10x to its own
fallback at n=20k with nothing routing around it. This sweep measures both
modes across dataset sizes (prefixes of the bench dataset, Q=2048 queries,
median of reps) and prints the observed crossover; pallas_scan_viable's
PALLAS_SCAN_MIN_N is set from this evidence and scan_search auto-routes
below it.

Run: python -m scripts.exp_scan_crossover   -> SCAN_CROSSOVER.json
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

NS = tuple(int(x) for x in os.environ.get(
    "XOVER_NS", "20000,50000,100000,200000,400000,800000,1183514"
).split(","))
Q = int(os.environ.get("XOVER_Q", 2048))
REPS = int(os.environ.get("XOVER_REPS", 5))
K = 10


def log(m):
    print(f"[scan_crossover] {m}", file=sys.stderr, flush=True)


def main():
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from bench import get_dataset, wait_for_tpu

    wait_for_tpu()
    from clann_tpu.config import Config
    from clann_tpu.core.index import build_index
    from clann_tpu.ops.ivf import scan_search

    train_full, test_full, _, _ = get_dataset()
    test = test_full[:Q]

    rows = []
    for n in NS:
        train = train_full[:n]
        cfg = Config(
            num_tables=2, num_clusters_factor=0.001, k=K, delta=0.9,
            dataset_name=f"xover_{n}", dense_layout=False, seed=0,
        )
        t0 = time.time()
        index = build_index(train, cfg)
        log(f"n={n}: built in {time.time()-t0:.0f}s")

        for mode, kwargs in (
            ("scan", dict(use_pallas=False)),
            ("pallas", dict(use_pallas=True, pallas_auto_route=False)),
        ):
            try:
                scan_search(index, test[:256], k=K, **kwargs)  # warm
                per_rep = []
                for _ in range(REPS):
                    t0 = time.time()
                    scan_search(index, test, k=K, **kwargs)
                    per_rep.append(Q / (time.time() - t0))
                qps = float(np.median(per_rep))
            except Exception as e:
                log(f"n={n} {mode}: FAILED {e}")
                qps, per_rep = 0.0, []
            rows.append({"n": n, "mode": mode, "qps": round(qps, 1),
                         "per_rep_qps": [round(q, 1) for q in per_rep]})
            log(f"n={n} {mode}: {qps:.0f} QPS (reps {per_rep})")

    # observed crossover: smallest n where the kernel matches the scan
    xover = None
    by_n = {}
    for r in rows:
        by_n.setdefault(r["n"], {})[r["mode"]] = r["qps"]
    for n in sorted(by_n):
        d = by_n[n]
        if d.get("pallas", 0) >= 0.95 * d.get("scan", 1e30):
            xover = n
            break
    out = {"Q": Q, "reps": REPS, "rows": rows,
           "observed_crossover_n": xover,
           "note": ("smallest n where the pinned kernel reaches 95% of "
                    "the plain scan; pallas_scan_viable routes below it")}
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCAN_CROSSOVER.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    log(f"wrote {path} (crossover={xover})")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
