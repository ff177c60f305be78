"""Confirm the gate row on the FULL 10k query set (VERDICT r4 #4).

The chosen gate row (LSH_AT_09.json: L=128/delta=0.95/G=32, 137 QPS at
recall 0.9158) was measured under the unified LSH protocol on 512
queries; the margin over the 0.9 gate is ~7x the binomial sigma at that
sample size but the flagship number should rest on the full set. This
runs ONE configuration — the chosen knobs — over all 10k bench queries,
BENCH_LSH_REPS (7) timed sweeps after a warm-up, and promotes the
full-set recall + QPS into LSH_AT_09.json under "full_10k" (and
chosen.recall_full10k). bench.py's gate row continues to use the unified
512-query protocol for comparability; the full-set number is the recall
authority.

Run: python -m scripts.confirm_gate_full   (~15 min TPU at ~137 QPS)
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


def log(m):
    print(f"[confirm_gate] {m}", file=sys.stderr, flush=True)


def main():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    from bench import FACTOR, N_TRAIN, NUM_TABLES, get_dataset, wait_for_tpu

    with open(os.path.join(root, "LSH_AT_09.json")) as f:
        doc = json.load(f)
    chosen = doc["chosen"]
    L = int(chosen["num_tables"])
    delta = float(chosen["delta"])
    G = int(chosen.get("gather_block", 16))
    chunk = int(chosen.get("candidate_chunk", 2048))
    fx = int(chosen.get("filter_expand", 8))
    bsz = int(chosen.get("batch_size", 256))
    log(f"chosen knobs: L={L} delta={delta} G={G} chunk={chunk} fx={fx}")

    wait_for_tpu()
    import jax
    import jax.numpy as jnp

    from clann_tpu.config import Config
    from clann_tpu.core.index import (
        _hash_in_blocks,
        build_index,
        derive_probs_tables,
        make_global_tables,
        unsort_hashes,
    )
    from clann_tpu.metrics.recall import recall_values
    from clann_tpu.ops.global_query import global_search
    from clann_tpu.ops.hashing import make_hash_family
    from clann_tpu.ops.prefixmap import build_prefix_directory
    from clann_tpu.ops.sources import make_hash_source

    train, test, gt_d, gt_i = get_dataset()

    cfg = Config(
        num_tables=L, num_clusters_factor=FACTOR, k=K, delta=delta,
        candidate_chunk=chunk, filter_expand=fx, gather_block=G, seed=0,
        pack_slot_records=False, dense_layout=False, lsh_engine="global",
    )
    t0 = time.time()
    if L == NUM_TABLES:
        index = build_index(train, cfg)
        hashes_T = unsort_hashes(index.sorted_hash, index.sorted_idx)
    else:
        # geometry+sketches once, hash at the gate L (bench.py's rehash)
        index = build_index(train, cfg.replace(num_tables=NUM_TABLES,
                                               lsh_engine="clustered"))
        family = make_hash_family(
            cfg.hash_family, int(index.vectors.shape[1]),
            num_rotations=cfg.num_rotations,
            estimation_repetitions=cfg.estimation_repetitions,
            estimation_eps=cfg.estimation_eps,
        )
        k_hash, _ = jax.random.split(jax.random.PRNGKey(cfg.seed))
        src = make_hash_source(
            cfg.hash_source, family, L, cfg.max_hashbits,
            pool_size=cfg.pool_size,
        ).init(k_hash)
        hashes_T = _hash_in_blocks(src.hash, index.vectors, 8192).T
        _probs, _ = derive_probs_tables(family, cfg)
        index = index.replace(
            hash_params=src.params, probs_table=jnp.asarray(_probs.table),
        )
    n_pts = index.vectors.shape[0]
    gh, gr = make_global_tables(
        hashes_T, index.sketches, index.assignment, pad_to=G
    )
    gd = build_prefix_directory(
        gh, jnp.asarray(np.asarray([0, n_pts], np.int32)),
        cfg.global_dir_bits,
        int(np.ceil(np.log2(max(2, n_pts)))) + 1, cfg.max_hashbits,
    )
    gdi = int(np.ceil(np.log2(max(2, int(jnp.max(
        gd[:, :, 1:] - gd[:, :, :-1])))))) + 1
    index = index.replace(
        g_sorted_hash=gh, g_records=gr, g_dir=gd, g_dir_iters=gdi,
        config=cfg,
    )
    log(f"build+tables {time.time()-t0:.0f}s")

    reps = int(os.environ.get("BENCH_LSH_REPS", 7))
    # warm/compile on one batch
    global_search(index, test[:bsz], k=K, delta=delta, batch_size=bsz)
    per_rep = []
    d_full = None
    st = None
    for i in range(reps):
        t0 = time.time()
        d_full, _, st = global_search(index, test, k=K, delta=delta,
                                      batch_size=bsz)
        per_rep.append(len(test) / (time.time() - t0))
        log(f"rep {i+1}/{reps}: {per_rep[-1]:.1f} QPS")
    qps = float(np.median(per_rep))
    r_full, r_std, _ = recall_values(gt_d, d_full, count=K)
    dc = float(st.distance_computations.mean())
    log(f"FULL 10k: QPS={qps:.1f} recall={r_full:.4f} (std {r_std:.4f}) "
        f"dc/q={dc:.0f}")

    full = {
        "nq": int(len(test)),
        "qps": round(qps, 1),
        "recall": round(float(r_full), 4),
        "recall_std": round(float(r_std), 4),
        "dc_per_query": round(dc, 1),
        "per_rep_qps": [round(q, 1) for q in per_rep],
        "knobs": {"num_tables": L, "delta": delta, "gather_block": G,
                  "candidate_chunk": chunk, "filter_expand": fx,
                  "batch_size": bsz},
        "protocol": f"all 10k queries, batch {bsz}, median of {reps} full "
                    "sweeps after one warm-up",
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    doc["full_10k"] = full
    doc["chosen"]["recall_full10k"] = full["recall"]
    doc["chosen"]["qps_full10k"] = full["qps"]
    with open(os.path.join(root, "LSH_AT_09.json"), "w") as f:
        json.dump(doc, f, indent=1)
    log("promoted into LSH_AT_09.json (full_10k + chosen.recall_full10k)")
    print(json.dumps(full))
    if full["recall"] < 0.9:
        log("WARNING: full-set recall below the 0.9 gate!")
        sys.exit(1)


if __name__ == "__main__":
    main()
