"""Jaccard parity benchmark: our set-LSH engine vs the GENUINE reference.

The reference's Jaccard support (Index<JaccardSimilarity> = MinHash tables
+ MinHash1Bit sketches, similarity_measure/jaccard.hpp:13-46, exposed by
the c_binder "jaccard" dispatch string, c_binder.cpp:39-50) is a
first-class capability, so parity needs a measured comparison, not just
recall-contract tests. This script:

  1. generates a clustered synthetic set corpus (data/synthetic.py
     clustered_sets) + exact Jaccard ground truth on device,
  2. runs the reference engine single-process via tools/ref_cross.cpp
     `bench_jaccard` (query loop single-threaded by design,
     collection.hpp:106-112),
  3. runs our core/jaccard.py engine on the real TPU chip at the same
     L/k/delta, flat AND clustered (clustered=True is our exact
     ball-pruned composition the reference never wires for sets),
  4. computes both engines' recall with the reference's definition
     (distance <= gt k-th distance + 1e-3, i.e. J >= kth_J - 1e-3,
     src/utils/mod.rs:59-95) and writes BASELINE_MEASURED_JACCARD.json.

Usage: python -m scripts.jaccard_baseline [--n 200000] [--nq 512]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_INCLUDE = "/root/reference/libpuffinn/include"
HARNESS_SRC = os.path.join(REPO, "tools", "ref_cross.cpp")
OUT_JSON = os.path.join(REPO, "BASELINE_MEASURED_JACCARD.json")

K = 10
DELTA = 0.9
L = 50


def log(msg):
    print(f"[jaccard-baseline] {msg}", file=sys.stderr, flush=True)


def compile_harness(workdir: str) -> str:
    exe = os.path.join(workdir, "ref_cross_bench")
    if os.path.exists(exe) and os.path.getmtime(exe) >= os.path.getmtime(
        HARNESS_SRC
    ):
        return exe
    log("compiling reference harness")
    r = subprocess.run(
        ["g++", "-std=c++14", "-O3", "-march=native", "-fopenmp",
         "-I", REF_INCLUDE, "-o", exe, HARNESS_SRC],
        capture_output=True, text=True,
    )
    if r.returncode != 0:
        sys.exit(f"compile failed:\n{r.stderr[-2000:]}")
    return exe


def dump_sets(sets, tok_path, off_path):
    offsets = np.zeros(len(sets) + 1, dtype=np.uint32)
    for i, s in enumerate(sets):
        offsets[i + 1] = offsets[i] + len(s)
    tokens = np.concatenate([np.asarray(s, dtype=np.uint32) for s in sets])
    tokens.tofile(tok_path)
    offsets.tofile(off_path)


def threshold_recall(sims_of_returned, gt_kth_sim, k):
    """Reference recall: distance <= kth + 1e-3 ⇔ J >= kth_J - 1e-3."""
    ok = sims_of_returned >= (gt_kth_sim[:, None] - 1e-3)
    return float(ok.sum(axis=1).mean() / k)


def exact_sims_of_ids(data, queries_padded, ids):
    """(Q, k) exact Jaccard of returned ids (sentinel -> -1)."""
    from clann_tpu.data.setdata import jaccard_similarity_rowwise

    Q, k = ids.shape
    safe = np.where(ids == 0xFFFFFFFF, 0, ids).astype(np.int64)
    rows = data.tokens[safe.reshape(-1)]  # (Q*k, T)
    qrep = np.repeat(queries_padded, k, axis=0)  # (Q*k, T)
    sims = np.asarray(jaccard_similarity_rowwise(rows, qrep)).reshape(Q, k)
    return np.where(ids == 0xFFFFFFFF, -1.0, sims)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--nq", type=int, default=512)
    ap.add_argument("--universe", type=int, default=50_000)
    ap.add_argument("--avg-size", type=int, default=64)
    ap.add_argument("--modes", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--L", type=int, default=L)
    args = ap.parse_args()

    from clann_tpu.data.setdata import JaccardData, brute_force_jaccard_topk
    from clann_tpu.data.synthetic import clustered_sets

    workdir = os.path.join(os.path.expanduser("~"), ".cache", "clann_tpu")
    os.makedirs(workdir, exist_ok=True)
    exe = compile_harness(workdir)

    log(f"generating {args.n} sets (universe={args.universe}, "
        f"avg={args.avg_size}, modes={args.modes})")
    sets = clustered_sets(args.n, args.universe, avg_size=args.avg_size,
                          n_modes=args.modes, core_share=0.8,
                          pool_factor=1.25, seed=0)
    qsets = clustered_sets(args.nq, args.universe, avg_size=args.avg_size,
                           n_modes=args.modes, core_share=0.8,
                           pool_factor=1.25, seed=1)
    data = JaccardData(sets, args.universe)
    queries = JaccardData(qsets, args.universe, t_max=data.tokens.shape[1])

    log("computing exact Jaccard ground truth on device")
    t0 = time.time()
    gt_sims, gt_ids = brute_force_jaccard_topk(data, queries.tokens, K)
    gt_kth = gt_sims[:, K - 1]
    log(f"ground truth in {time.time()-t0:.0f}s")

    # --- reference engine ---
    tok, off = os.path.join(workdir, "jac_tok.u32"), os.path.join(
        workdir, "jac_off.u32")
    qtok, qoff = os.path.join(workdir, "jac_qtok.u32"), os.path.join(
        workdir, "jac_qoff.u32")
    ids_bin = os.path.join(workdir, "jac_ids.u32")
    dump_sets(sets, tok, off)
    dump_sets(qsets, qtok, qoff)
    log(f"running reference bench_jaccard: n={args.n} L={args.L} "
        f"nq={args.nq} k={K} delta={DELTA}")
    r = subprocess.run(
        [exe, "bench_jaccard", tok, off, str(args.n), str(args.universe),
         str(args.L), qtok, qoff, str(args.nq), str(K), str(DELTA),
         str(args.reps), ids_bin],
        capture_output=True, text=True,
    )
    if r.returncode != 0:
        sys.exit(f"reference harness failed:\n{r.stderr[-2000:]}")
    ref = json.loads(r.stdout.strip().splitlines()[-1])
    ref_ids = np.fromfile(ids_bin, dtype=np.uint32).reshape(args.nq, K)
    ref_recall = threshold_recall(
        exact_sims_of_ids(data, queries.tokens, ref_ids), gt_kth, K)
    log(f"reference: qps={ref['qps']:.1f} build={ref['build_s']:.1f}s "
        f"recall={ref_recall:.4f}")

    # --- our engine (real TPU) ---
    from clann_tpu.config import Config
    from clann_tpu.core.jaccard import (
        build_jaccard_index, jaccard_scan, jaccard_search,
    )

    results = {}
    flat_index = None
    for variant, clustered in (("flat", False), ("clustered", True)):
        cfg = Config(num_tables=args.L, k=K, delta=DELTA,
                     num_clusters_factor=0.4, seed=0,
                     dataset_name=f"jaccard-{args.n}")
        t0 = time.time()
        index = build_jaccard_index(data, cfg, clustered=clustered)
        build_s = time.time() - t0
        if variant == "flat":
            flat_index = index
        # warm-up (compile) + timed reps, small query batches (large
        # adaptive batches fault the TPU worker — ROUND_NOTES; 256 was
        # still enough to fault at 200k sets)
        B = 128
        out_s, out_i, dc = [], [], []
        t0 = time.time()
        for s in range(0, args.nq, B):
            sims, ids, st = jaccard_search(index, queries.tokens[s:s + B])
            out_s.append(sims), out_i.append(ids)
            dc.append(np.asarray(st.distance_computations))
        warm_s = time.time() - t0
        dc_q = float(np.concatenate(dc).mean())
        ids = np.concatenate(out_i)
        t0 = time.time()
        for _ in range(args.reps):
            for s in range(0, args.nq, B):
                jaccard_search(index, queries.tokens[s:s + B])
        dt = time.time() - t0
        qps = args.nq * args.reps / dt
        rec = threshold_recall(
            exact_sims_of_ids(data, queries.tokens, ids), gt_kth, K)
        log(f"clann_tpu[{variant}]: qps={qps:.1f} build={build_s:.1f}s "
            f"recall={rec:.4f} dc/q={dc_q:.0f} "
            f"(warm pass {args.nq/warm_s:.1f} qps)")
        results[variant] = {
            "qps": round(qps, 1), "build_seconds": round(build_s, 1),
            "recall_mean": round(rec, 4), "dc_per_query": round(dc_q, 1),
        }

    # EXACT dense multi-hot MXU scan (core/jaccard.jaccard_scan) — the
    # TPU-native fast path; needs only the token tensor, whole query set
    # in one call
    sims, ids, _ = jaccard_scan(flat_index, queries.tokens, k=K)
    t0 = time.time()
    for _ in range(args.reps):
        jaccard_scan(flat_index, queries.tokens, k=K)
    qps = args.nq * args.reps / (time.time() - t0)
    rec = threshold_recall(
        exact_sims_of_ids(data, queries.tokens, ids.astype(np.uint32)),
        gt_kth, K)
    log(f"clann_tpu[scan]: qps={qps:.1f} recall={rec:.4f} (exact)")
    results["scan"] = {"qps": round(qps, 1), "build_seconds": 0.0,
                       "recall_mean": round(rec, 4)}

    out = {
        "dataset": f"clustered synthetic sets {args.n} x universe "
                   f"{args.universe}, avg size {args.avg_size}, "
                   f"{args.modes} modes",
        "config": {"num_tables": args.L, "k": K, "delta": DELTA,
                   "nq": args.nq, "reps": args.reps},
        "reference": {
            "engine": "vendored PUFFINN Index<JaccardSimilarity>",
            "qps": ref["qps"], "warm_qps": ref["warm_qps"],
            "build_seconds": ref["build_s"],
            "recall_mean": round(ref_recall, 4),
            "build_cores": os.cpu_count() or 1,
            "query_threading": "single-threaded by design "
                               "(collection.hpp:106-112)",
        },
        "clann_tpu": results,
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    with open(OUT_JSON, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    log(f"wrote {OUT_JSON}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
