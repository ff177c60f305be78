"""Knob sweep for the round-5 Jaccard blocked-record engine.

jaccard_baseline measured the new engine at the DEFAULT knobs
(chunk=512, fx=8, G=16): 5.4 QPS vs the reference's 2.9 in-class. At
dc/q=154k a chunk of 512 means ~300 adaptive-loop iterations per batch;
the cosine gate regime measured chunk=2048 and G=32 as its optimum
(GLOBAL_KNOBS, GATHER_RATE). This sweeps (chunk, G) on the identical
dataset/protocol, and if a combo beats the default it re-times the full
jaccard_baseline flat protocol at those knobs and records a
"flat_tuned" row in BASELINE_MEASURED_JACCARD.json.

Run: python -m scripts.exp_jaccard_knobs   (writes JACCARD_KNOBS.json)
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
DELTA = 0.9
L = 50
N = int(os.environ.get("JK_N", 200_000))
NQ = int(os.environ.get("JK_NQ", 512))
PROBE_Q = 256
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "JACCARD_KNOBS.json")
BASE = os.path.join(REPO, "BASELINE_MEASURED_JACCARD.json")


def log(m):
    print(f"[jaccard_knobs] {m}", file=sys.stderr, flush=True)


def main():
    sys.path.insert(0, REPO)
    from bench import wait_for_tpu

    wait_for_tpu()
    from clann_tpu.config import Config
    from clann_tpu.core.jaccard import (
        _pack_jaccard_records_host,
        build_jaccard_index,
        jaccard_search,
    )
    from clann_tpu.data.setdata import JaccardData, brute_force_jaccard_topk
    from clann_tpu.data.synthetic import clustered_sets
    from scripts.jaccard_baseline import exact_sims_of_ids, threshold_recall

    log(f"generating {N} sets (same generator/seeds as jaccard_baseline)")
    sets = clustered_sets(N, 50_000, avg_size=64, n_modes=1024,
                          core_share=0.8, pool_factor=1.25, seed=0)
    qsets = clustered_sets(NQ, 50_000, avg_size=64, n_modes=1024,
                           core_share=0.8, pool_factor=1.25, seed=1)
    data = JaccardData(sets, 50_000)
    queries = JaccardData(qsets, 50_000, t_max=data.tokens.shape[1])
    t0 = time.time()
    gt_sims, _ = brute_force_jaccard_topk(data, queries.tokens, K)
    gt_kth = gt_sims[:, K - 1]
    log(f"ground truth {time.time()-t0:.0f}s")

    cfg = Config(num_tables=L, k=K, delta=DELTA, num_clusters_factor=0.4,
                 seed=0, dataset_name=f"jaccard-{N}")
    t0 = time.time()
    index = build_jaccard_index(data, cfg)
    log(f"build {time.time()-t0:.0f}s (default knobs: "
        f"chunk={cfg.candidate_chunk} fx={cfg.filter_expand} "
        f"G={cfg.gather_block})")

    def probe(chunk, fx, G, nq=PROBE_Q, reps=2, B=128):
        idx = index
        if G != max(1, idx.config.gather_block):
            idx = idx.replace(g_records=_pack_jaccard_records_host(
                idx.sorted_idx, idx.sketches, idx.assignment, pad_to=G))
        idx = idx.replace(config=cfg.replace(
            candidate_chunk=chunk, filter_expand=fx, gather_block=G))
        out_i, dc = [], []
        t0 = time.time()
        for s in range(0, nq, B):  # warm pass (compile) + collect ids
            _, ids, st = jaccard_search(idx, queries.tokens[s:s + B])
            out_i.append(ids)
            dc.append(np.asarray(st.distance_computations))
        warm = nq / (time.time() - t0)
        t0 = time.time()
        for _ in range(reps):
            for s in range(0, nq, B):
                jaccard_search(idx, queries.tokens[s:s + B])
        qps = nq * reps / (time.time() - t0)
        ids = np.concatenate(out_i)
        rec = threshold_recall(
            exact_sims_of_ids(data, queries.tokens[:nq], ids),
            gt_kth[:nq], K)
        return qps, rec, float(np.concatenate(dc).mean()), warm

    rows = []
    combos = [(512, 8, 16), (2048, 8, 16), (2048, 8, 32), (4096, 8, 32),
              (2048, 4, 16)]
    for chunk, fx, G in combos:
        qps, rec, dcq, warm = probe(chunk, fx, G)
        rows.append({"chunk": chunk, "fx": fx, "G": G,
                     "qps": round(qps, 2), "recall": round(rec, 4),
                     "dc_per_query": round(dcq, 1)})
        log(f"chunk={chunk} fx={fx} G={G}: {qps:.2f} QPS recall={rec:.4f} "
            f"dc/q={dcq:.0f} (warm {warm:.2f})")

    best = max(rows, key=lambda r: r["qps"])
    out = {"n": N, "L": L, "delta": DELTA, "probe_queries": PROBE_Q,
           "rows": rows, "best": best,
           "protocol": "B=128 batches, warm pass + 2 timed reps, "
                       "same generator/protocol as jaccard_baseline",
           "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}

    # if a non-default combo wins, confirm at the full NQ protocol and
    # record it next to jaccard_baseline's rows
    if (best["chunk"], best["fx"], best["G"]) != (512, 8, 16):
        qps, rec, dcq, _ = probe(best["chunk"], best["fx"], best["G"],
                                 nq=NQ, reps=2)
        tuned = {"qps": round(qps, 1), "recall_mean": round(rec, 4),
                 "dc_per_query": round(dcq, 1),
                 "knobs": {k: best[k] for k in ("chunk", "fx", "G")},
                 "nq": NQ}
        out["flat_tuned_full"] = tuned
        log(f"tuned full protocol: {qps:.2f} QPS recall={rec:.4f}")
        try:
            with open(BASE) as f:
                doc = json.load(f)
            doc["clann_tpu_flat_tuned"] = tuned
            with open(BASE, "w") as f:
                json.dump(doc, f, indent=2)
                f.write("\n")
            log("recorded flat_tuned in BASELINE_MEASURED_JACCARD.json")
        except (OSError, ValueError) as e:
            log(f"baseline update skipped: {e}")

    with open(OUT, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    log(f"wrote {OUT}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
