"""Per-query latency vs batch size — the axis the reference defines.

The reference's metrics are per-query milliseconds (src/main.rs:62-69;
sqlite.rs:199 stores per-query search_time) and its measured engine does
~23 ms/query single-threaded (BASELINE_MEASURED.json: 43.5 QPS). Every
number this repo published before round 5 is batched throughput; by the
platform cost model (~40 ms dispatch + 26.7 ms fixed result pull,
PULL_RATE.json) a batch-of-1 TPU search MUST lose at batch 1 — this
experiment publishes the honest number and finds the batch size where the
TPU path's per-query latency crosses below the reference's.

Protocol: for each batch size B in {1, 8, 64, 512, 10000} and each engine
(scan-pallas-idp, scan-approx-idp, ivf at its chosen n_probe, and the
delta-guaranteed global LSH engine at the gate knobs), time REPS calls on
DISTINCT query slices (rotating through the 10k query set so no
device-side caching of a repeated batch flatters the number), after one
warm-up call per (engine, B) to exclude compilation. Per-query latency of
a call = wall-clock / B; reported: p50 and p99 across calls, in ms.

All timed paths end in host materialization (np.asarray), which is the
only sync that works through the relay (block_until_ready does NOT block
through it — PERFORMANCE.md platform lessons).

Writes LATENCY.json. Run: python -m scripts.exp_latency
  env: LAT_REPS (default 12; batch-1 rows use 4x), LAT_BATCHES
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

K = 10
REPS = int(os.environ.get("LAT_REPS", 12))
BATCHES = [int(b) for b in os.environ.get(
    "LAT_BATCHES", "1,8,64,512,10000").split(",")]
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "LATENCY.json",
)


def log(m):
    print(f"[latency] {m}", file=sys.stderr, flush=True)


def sweep(name, fn, test, reps_mult=1):
    """Time fn(queries_block) over the batch sizes; rotate query slices."""
    rows = []
    nq = len(test)
    for B in BATCHES:
        if B > nq:
            continue
        reps = REPS * (4 if B == 1 else 1) * reps_mult
        fn(test[:B])  # warm / compile this batch shape
        per_call = []
        off = 0
        for _ in range(reps):
            if off + B > nq:
                off = 0
            blk = test[off : off + B]
            off += B
            t0 = time.perf_counter()
            fn(blk)
            per_call.append(time.perf_counter() - t0)
        per_q_ms = np.asarray(per_call) * 1000.0 / B
        row = {
            "engine": name,
            "batch": B,
            "reps": reps,
            "p50_ms_per_query": round(float(np.percentile(per_q_ms, 50)), 3),
            "p99_ms_per_query": round(float(np.percentile(per_q_ms, 99)), 3),
            "p50_call_ms": round(
                float(np.percentile(np.asarray(per_call) * 1000, 50)), 2),
            "qps_at_p50": round(B / float(np.percentile(per_call, 50)), 1),
        }
        rows.append(row)
        log(f"{name} B={B}: p50 {row['p50_ms_per_query']}ms/q "
            f"p99 {row['p99_ms_per_query']} (call {row['p50_call_ms']}ms)")
    return rows


def main():
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from bench import (
        DELTA, FACTOR, N_TRAIN, NUM_TABLES, get_dataset, wait_for_tpu,
    )

    wait_for_tpu()
    import jax
    import jax.numpy as jnp

    from clann_tpu.config import Config
    from clann_tpu.core.index import build_index
    from clann_tpu.metrics.recall import recall_values
    from clann_tpu.ops.ivf import dense_search, scan_search

    train, test, gt_d, gt_i = get_dataset()
    test = np.asarray(test)
    rows = []

    # --- phase 1: dense paths on the lean build (bench.py's headline
    # configuration — no LSH arrays resident) ---
    cfg = Config(
        num_tables=NUM_TABLES, num_clusters_factor=FACTOR, k=K, delta=DELTA,
        candidate_chunk=512, seed=0, pack_slot_records=False,
    )
    t0 = time.time()
    index = build_index(train, cfg)
    log(f"lean build {time.time()-t0:.0f}s")
    test_d = jax.device_put(jnp.asarray(test))
    _ = np.asarray(test_d[:1])

    # queries host-side per call: the latency story must include the
    # query transfer (a serving client sends queries); device_put of a
    # (B, 100) f32 block is tiny next to the fixed dispatch cost
    rows += sweep(
        "scan-pallas-idp",
        lambda q: scan_search(index, q, k=K, use_pallas=True,
                              pull="ids-packed", batch_q=len(q)),
        test,
    )
    rows += sweep(
        "scan-approx-idp",
        lambda q: scan_search(index, q, k=K, recall_target=0.85,
                              pull="ids-packed", batch_q=len(q)),
        test,
    )

    # ivf: smallest passing n_probe (bench.py protocol) on a subset
    n_rows = int(index.seg_centers.shape[0])
    chosen = None
    for n_probe in [8, 12, 16, 24, 32, 48, 64, 96, 128]:
        if n_probe > n_rows:
            break
        d_, _, _ = dense_search(index, test[:1000], k=K, n_probe=n_probe,
                                batch_size=2048)
        r, _, _ = recall_values(gt_d[:1000], d_, count=K)
        if r >= 0.9:
            chosen = n_probe
            break
    if chosen is not None:
        log(f"ivf n_probe={chosen}")
        rows += sweep(
            f"ivf-p{chosen}",
            lambda q: dense_search(index, q, k=K, n_probe=chosen,
                                   batch_size=2048),
            test,
        )

    # --- phase 2: the delta-guaranteed gate engine at the chosen knobs
    # (LSH_AT_09.json). Built directly at the chosen L (the resident scan
    # index above is released first — both together can exceed HBM). ---
    try:
        with open(os.path.join(
            os.path.dirname(OUT), "LSH_AT_09.json"
        )) as f:
            chosen_l = json.load(f).get("chosen") or {}
    except (OSError, ValueError):
        chosen_l = {}
    L9 = int(chosen_l.get("num_tables", NUM_TABLES))
    d9 = float(chosen_l.get("delta", 0.95))
    g9 = int(chosen_l.get("gather_block", 32))
    ch9 = int(chosen_l.get("candidate_chunk", 2048))
    fx9 = int(chosen_l.get("filter_expand", 8))
    del index
    from clann_tpu.ops.global_query import global_search

    cfg9 = Config(
        num_tables=L9, num_clusters_factor=FACTOR, k=K, delta=d9,
        candidate_chunk=ch9, filter_expand=fx9, gather_block=g9, seed=0,
        pack_slot_records=False, dense_layout=False, lsh_engine="global",
    )
    t0 = time.time()
    gindex = build_index(train, cfg9)
    log(f"global build (L={L9}) {time.time()-t0:.0f}s")
    sub = test[:2048]  # LSH batched throughput protocol is 512q; latency
    # rows rotate within 2048 queries (enough distinct slices up to B=512)
    rows += sweep(
        f"lsh-gate-L{L9}-d{d9}",
        lambda q: global_search(gindex, q, k=K, delta=d9,
                                batch_size=min(256, max(1, len(q)))),
        sub,
        reps_mult=1,
    )

    # reference row, from the measured baseline
    ref = None
    try:
        with open(os.path.join(
            os.path.dirname(OUT), "BASELINE_MEASURED.json"
        )) as f:
            m = json.load(f)
        ref = {
            "engine": "reference PUFFINN C++ (measured)",
            "ms_per_query": round(1000.0 / float(m["qps"]), 2),
            "note": "single-threaded by design (collection.hpp:106-112); "
                    "per-query latency == 1/QPS for a sequential loop",
            "knobs": {"L": m["num_tables"], "delta": m["delta"]},
        }
    except (OSError, KeyError, ValueError):
        pass

    # crossover per engine: smallest batch with p50 below the reference
    crossover = {}
    if ref:
        for name in {r["engine"] for r in rows}:
            ok = [r["batch"] for r in rows
                  if r["engine"] == name
                  and r["p50_ms_per_query"] < ref["ms_per_query"]]
            crossover[name] = min(ok) if ok else None

    out = {
        "protocol": (
            f"per-(engine, batch) p50/p99 of wall-clock/B over rotating "
            f"distinct query slices; {REPS} calls (4x at B=1), one warm-up "
            f"excluded; host np.asarray sync"
        ),
        "n_train": N_TRAIN,
        "rows": rows,
        "reference": ref,
        "crossover_batch": crossover,
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    log(f"wrote {OUT}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
