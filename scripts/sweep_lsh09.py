"""Find a delta-guaranteed LSH config meeting recall@10 >= 0.9 (VERDICT #2).

The north-star gate is "QPS at recall@10 >= 0.9"; round 1 measured the
global engine only at delta=0.9 (recall 0.84, plain-PUFFINN semantics —
reference parity, below the gate). This sweeps the guarantee knob delta
(the reference's own contract: failure-prob stop at
collection.hpp:927-943) and the entry/chunk execution knobs on the BENCH
dataset until the gate is met, and records honest QPS at that point.

Writes LSH_AT_09.json at the repo root; bench.py reads it to pick the
delta for its first-class `lsh_at_0.9` metric without re-sweeping.

Run: python -m scripts.sweep_lsh09            (1.18M bench dataset)
     BENCH_N=200000 python -m scripts.sweep_lsh09
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
SUB = int(os.environ.get("SWEEP_Q", 512))


def log(m):
    print(f"[sweep_lsh09] {m}", file=sys.stderr, flush=True)


def main():
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from bench import DELTA, FACTOR, N_TRAIN, NUM_TABLES, get_dataset, wait_for_tpu

    wait_for_tpu()
    import jax.numpy as jnp

    from clann_tpu.config import Config
    from clann_tpu.core.index import (
        build_index,
        make_global_tables,
        unsort_hashes,
    )
    from clann_tpu.metrics.recall import recall_values
    from clann_tpu.ops.global_query import global_search
    from clann_tpu.ops.prefixmap import build_prefix_directory

    train, test, gt_d, gt_i = get_dataset()
    test, gt_d = test[:SUB], gt_d[:SUB]

    cfg = Config(
        num_tables=NUM_TABLES, num_clusters_factor=FACTOR, k=K, delta=DELTA,
        # chunk/fx from the measured knob surface (GLOBAL_KNOBS.json +
        # GLOBAL_KNOBS_FX.json): fx=8 beats 4 by ~1.24x at the gate and
        # 12/16 regress; chunk 1024-2048 is the flat peak
        candidate_chunk=2048, filter_expand=8, gather_block=16, seed=0,
        pack_slot_records=False, dense_layout=False,
    )
    t0 = time.time()
    index = build_index(train, cfg)
    log(f"build {time.time()-t0:.0f}s")
    hashes_T = unsort_hashes(index.sorted_hash, index.sorted_idx)
    gh, gr = make_global_tables(
        hashes_T, index.sketches, index.assignment, pad_to=cfg.gather_block
    )
    n_pts = index.vectors.shape[0]
    gd = build_prefix_directory(
        gh, jnp.asarray(np.asarray([0, n_pts], np.int32)),
        cfg.global_dir_bits,
        int(np.ceil(np.log2(max(2, n_pts)))) + 1, cfg.max_hashbits,
    )
    gdi = int(np.ceil(np.log2(max(2, int(jnp.max(
        gd[:, :, 1:] - gd[:, :, :-1])))))) + 1
    index = index.replace(g_sorted_hash=gh, g_records=gr, g_dir=gd,
                          g_dir_iters=gdi)

    rows = []
    best = None
    reps = int(os.environ.get("BENCH_LSH_REPS", 7))
    for delta in (0.9, 0.95, 0.975, 0.99):
        global_search(index, test[:256], k=K, delta=delta,
                      batch_size=256)  # warm/compile
        per_rep = []
        for _ in range(reps):  # one protocol with bench.py (median of reps)
            t0 = time.time()
            d_, _, st = global_search(index, test, k=K, delta=delta,
                                      batch_size=256)
            per_rep.append(len(test) / (time.time() - t0))
        qps = float(np.median(per_rep))
        r, _, _ = recall_values(gt_d, d_, count=K)
        dc = float(st.distance_computations.mean())
        log(f"delta={delta}: QPS={qps:.1f} (reps {per_rep}) recall={r:.4f} "
            f"dc/q={dc:.0f}")
        rows.append({"delta": delta, "qps": round(qps, 1),
                     "recall": round(float(r), 4), "dc_per_query": round(dc),
                     "per_rep_qps": [round(q, 1) for q in per_rep]})
        if r >= 0.9 and best is None:
            best = rows[-1]
        if r >= 0.9 and delta > 0.95:
            break

    out = {
        "n": int(N_TRAIN), "num_tables": int(NUM_TABLES), "k": K,
        "queries": int(len(test)), "rows": rows, "chosen": best,
        "note": (
            "global ball-filtered delta-LSH engine "
            "(clann_tpu/ops/global_query.py), sweep over the reference's "
            "guarantee knob delta; chosen = first config with "
            "recall@10 >= 0.9"
        ),
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "LSH_AT_09.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    log(f"wrote {path}: chosen={best}")


if __name__ == "__main__":
    main()
