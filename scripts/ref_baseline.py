"""Measure the GENUINE reference engine on bench.py's exact dataset.

The reference publishes no numbers (BASELINE.md), so the honest baseline is
a measurement of the reference's own C++ engine on the same data, queries,
and config as bench.py's headline. This drives tools/ref_cross.cpp (compiled
against the read-only vendored PUFFINN headers, /root/reference/libpuffinn)
in `bench` mode:

  - build: insert + rebuild(L) — the reference's monolithic-PUFFINN
    comparison baseline (benches/distance_benches.rs:93-203). Build is
    OpenMP-parallel in the reference, so the build time recorded here is
    tagged with the core count.
  - search: the reference query loop is single-threaded BY DESIGN
    (collection.hpp:106-112 — shared query buffers are documented
    non-thread-safe), so QPS measured on one core IS the reference's
    per-process number, not an artifact of this host.

Recall is computed from the returned ids with the reference's own
definition (returned distance <= ground-truth k-th distance + 1e-3,
src/utils/mod.rs:59-95) against bench.py's cached exact ground truth.

Writes BASELINE_MEASURED.json at the repo root; bench.py uses it for
vs_baseline when present.

Usage: python -m scripts.ref_baseline [--nq 1000] [--reps 1] [--n N]
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
OUT_JSON = os.path.join(REPO, "BASELINE_MEASURED.json")

K = 10
DEFAULT_DELTA = 0.9
NUM_TABLES = 50  # bench.py's BENCH_L default (benches/configs.json L=50)


def log(msg):
    print(f"[ref-baseline] {msg}", file=sys.stderr, flush=True)


def compile_harness(workdir: str) -> str:
    exe = os.path.join(workdir, "ref_cross_bench")
    if os.path.exists(exe) and os.path.getmtime(exe) >= os.path.getmtime(
        HARNESS_SRC
    ):
        return exe
    log("compiling reference harness (-O3 -march=native -fopenmp, the "
        "reference's own release flags, build.rs:40)")
    r = subprocess.run(
        ["g++", "-std=c++14", "-O3", "-march=native", "-fopenmp",
         "-I", REF_INCLUDE, "-o", exe, HARNESS_SRC],
        capture_output=True, text=True,
    )
    if r.returncode != 0:
        sys.exit(f"compile failed:\n{r.stderr[-2000:]}")
    return exe


def reference_recall(train, queries, gt_d, ids, k):
    """The reference's recall definition (src/utils/mod.rs:59-95):
    fraction of returned points whose distance <= gt k-th distance + 1e-3."""
    nq = ids.shape[0]
    recalls = np.empty(nq)
    for i in range(nq):
        valid = ids[i][ids[i] != 0xFFFFFFFF]
        if valid.size == 0:
            recalls[i] = 0.0
            continue
        rows = train[valid.astype(np.int64)]
        # angular distance 1 - cos; train rows are unit vectors
        d = 1.0 - rows @ queries[i]
        thresh = gt_d[i, k - 1] + 1e-3
        recalls[i] = float((d <= thresh).sum()) / k
    return float(recalls.mean()), float(recalls.std())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nq", type=int, default=1000,
                    help="queries to time (subset of bench.py's 10k)")
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--L", type=int, default=NUM_TABLES)
    ap.add_argument("--delta", type=float, default=DEFAULT_DELTA,
                    help="the reference's recall knob passed to search() "
                         "(collection.hpp:324). Non-default runs are merged "
                         "into BASELINE_MEASURED.json's rows list so the "
                         "same-knob in-class comparison (VERDICT r4 #1) has "
                         "a matched denominator per (L, delta)")
    ap.add_argument("--family", default="fhtcp",
                    help="fhtcp (the reference cosine default) or simhash")
    ap.add_argument("--n", type=int, default=1_183_514,
                    help="train size (bench.py's BENCH_N default)")
    ap.add_argument("--d", type=int, default=100,
                    help="dimensions (25 = the reference's canonical "
                         "glove-25-angular demo shape, main.rs:22-29)")
    ap.add_argument("--q-cache", type=int, default=10_000,
                    help="query count in the cached dataset")
    ap.add_argument("--out", default=OUT_JSON)
    args = ap.parse_args()

    cache = os.path.join(
        os.path.expanduser("~"), ".cache", "clann_tpu",
        f"bench_{args.n}x{args.d}_q{args.q_cache}.npz",
    )
    if not os.path.exists(cache):
        # build it exactly as bench.py's get_dataset does (same generator,
        # same seeds, same cache name — bench.py will reuse it)
        log(f"cache {cache} missing; generating (GT on device)")
        from clann_tpu.data.synthetic import clustered_unit_vectors
        from clann_tpu.ops.distances import brute_force_topk

        train = clustered_unit_vectors(args.n, args.d, n_modes=1024,
                                       spread=0.7, seed=0)
        test = clustered_unit_vectors(args.q_cache, args.d, n_modes=1024,
                                      spread=0.7, seed=1)
        gt_d, gt_i = brute_force_topk(train, test, k=max(K, 10),
                                      metric="angular", block_q=512)
        gt_d, gt_i = np.asarray(gt_d), np.asarray(gt_i)
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        np.savez(cache, train=train, test=test, gt_d=gt_d, gt_i=gt_i)
    z = np.load(cache)
    train, test, gt_d, gt_i = z["train"], z["test"], z["gt_d"], z["gt_i"]
    test = test[: args.nq]
    gt_d = gt_d[: args.nq]

    workdir = os.path.join(os.path.expanduser("~"), ".cache", "clann_tpu")
    exe = compile_harness(workdir)

    shape_tag = f"{args.n}x{args.d}"
    train_bin = os.path.join(workdir, f"ref_train_{shape_tag}.f32")
    test_bin = os.path.join(workdir, f"ref_test_{shape_tag}.f32")
    ids_bin = os.path.join(workdir, "ref_ids.u32")
    if not os.path.exists(train_bin):
        train.astype(np.float32).tofile(train_bin)
    test.astype(np.float32).tofile(test_bin)

    n, d = train.shape
    cores = os.cpu_count() or 1
    log(f"running reference bench: n={n} d={d} L={args.L} nq={len(test)} "
        f"k={K} delta={args.delta} reps={args.reps} family={args.family} "
        f"(build uses {cores} core(s); query loop single-threaded by design)")
    t0 = time.time()
    r = subprocess.run(
        [exe, "bench", args.family, train_bin, str(n), str(d), str(args.L),
         test_bin, str(len(test)), str(K), str(args.delta), str(args.reps),
         ids_bin],
        capture_output=True, text=True,
    )
    log(f"harness finished in {time.time()-t0:.0f}s")
    if r.returncode != 0:
        sys.exit(f"harness failed:\n{r.stderr[-2000:]}")
    bench = json.loads(r.stdout.strip().splitlines()[-1])

    ids = np.fromfile(ids_bin, dtype=np.uint32).reshape(len(test), K)
    rec_mean, rec_std = reference_recall(train, test, gt_d, ids, K)

    result = {
        "engine": "reference PUFFINN C++ (vendored, CLANN-modified API)",
        "harness": "tools/ref_cross.cpp bench mode",
        "dataset": f"synthetic angular clustered {n}x{d} "
                   "(bench.py cache layout, identical bytes)",
        "family": args.family,
        "num_tables": args.L,
        "k": K,
        "delta": args.delta,
        "nq": len(test),
        "reps": args.reps,
        "build_seconds": bench["build_s"],
        "build_cores": cores,
        "qps": bench["qps"],
        "warm_qps": bench["warm_qps"],
        "index_memory_bytes": bench.get("memory"),
        "recall_mean": rec_mean,
        "recall_std": rec_std,
        "query_threading": "single-threaded by design "
                           "(collection.hpp:106-112)",
        "host": os.uname().nodename,
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }

    # Merge into the baseline file rather than overwrite: the top-level
    # fields stay the default-knob headline row (what bench.py's
    # vs_baseline divides by), and EVERY measured (family, L, delta, n)
    # combination is kept in "rows" so in-class claims can cite the
    # same-knob reference row (VERDICT r4 #1).
    existing = {}
    if os.path.exists(args.out):
        try:
            with open(args.out) as f:
                existing = json.load(f)
        except (OSError, ValueError):
            existing = {}
    rows = [r_ for r_ in existing.get("rows", [])
            if not (r_.get("family") == result["family"]
                    and r_.get("num_tables") == result["num_tables"]
                    and r_.get("delta") == result["delta"]
                    and r_.get("dataset") == result["dataset"])]
    rows.append(result)
    is_default = (args.L == NUM_TABLES and args.delta == DEFAULT_DELTA
                  and args.family == "fhtcp")
    top = dict(result) if is_default or not existing else {
        k_: v_ for k_, v_ in existing.items() if k_ != "rows"}
    top["rows"] = rows
    with open(args.out, "w") as f:
        json.dump(top, f, indent=2)
        f.write("\n")
    log(f"wrote {args.out} ({len(rows)} rows)")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
