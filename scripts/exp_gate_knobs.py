"""A/B the gate config's execution knobs at the 1.18M bench shape.

GATHER_RATE.json (round 4) showed the record gather — the loop body's
dominant cost — is issue-rate bound with its per-row optimum at
gather_block=32 (17.9 ns/row for 512B rows vs 20.7 at the production
G=16, flat index). This measures what that means end-to-end: the chosen
(L, delta) gate row from LSH_AT_09.json re-measured at G in {16, 32}
(records re-packed per G; same protocol as bench.py/sweep_lsh09).

Writes GATE_KNOBS.json. Run after sweep_lsh09:
    python -m scripts.exp_gate_knobs
    GATE_G=16,32,64 python -m scripts.exp_gate_knobs
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
G_LIST = [int(x) for x in os.environ.get("GATE_G", "16,32").split(",")]
# empty -> just the chosen delta; the gate row has recall slack (0.9164
# vs the 0.9 bar), so a slightly lower delta may keep the gate at less dc
DELTA_LIST = [
    float(x)
    for x in os.environ.get("GATE_DELTA", "").split(",")
    if x.strip()
]


def log(m):
    print(f"[exp_gate_knobs] {m}", file=sys.stderr, flush=True)


def main():
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from bench import DELTA, FACTOR, N_TRAIN, NUM_TABLES, get_dataset, wait_for_tpu

    wait_for_tpu()
    import jax
    import jax.numpy as jnp

    from clann_tpu.config import Config
    from clann_tpu.core.index import (
        _hash_in_blocks,
        build_index,
        make_global_tables,
        unsort_hashes,
    )
    from clann_tpu.metrics.recall import recall_values
    from clann_tpu.ops.global_query import global_search
    from clann_tpu.ops.hashing import make_hash_family
    from clann_tpu.ops.prefixmap import build_prefix_directory
    from clann_tpu.ops.sources import make_hash_source

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "LSH_AT_09.json")) as f:
        chosen = json.load(f)["chosen"]
    if chosen is None:
        # the sweep found no gate-passing row; probe from the bench
        # defaults so the knob experiments can still run
        chosen = {"num_tables": 50, "delta": 0.95, "qps": 0.0}
    # GATE_L probes a table count beyond the sweep's surface (e.g. 192)
    # at the production G; the promote step below only replaces the gate
    # row if the probe is strictly better at recall >= 0.9
    L = int(os.environ.get("GATE_L", chosen.get("num_tables", NUM_TABLES)))
    delta = float(chosen["delta"])
    log(f"gate config: L={L} delta={delta} "
        f"(chosen: L={chosen.get('num_tables')})")

    train, test, gt_d, gt_i = get_dataset()
    test, gt_d = test[:SUB], gt_d[:SUB]

    # GATE_CHUNK / GATE_FX re-open the round-2 knob surface at the
    # current gate config (it was tuned at L=50/G=16; the optimum may
    # move at L=128/G=32)
    cfg = Config(
        num_tables=L, num_clusters_factor=FACTOR, k=K, delta=delta,
        candidate_chunk=int(
            os.environ.get("GATE_CHUNK", "2048").split(",")[0]),
        filter_expand=int(os.environ.get("GATE_FX", "8").split(",")[0]),
        gather_block=16, seed=0,
        pack_slot_records=False, dense_layout=False, lsh_engine="global",
    )
    t0 = time.time()
    if L == NUM_TABLES:
        index = build_index(train, cfg)
        hashes_T = unsort_hashes(index.sorted_hash, index.sorted_idx)
    else:
        # build geometry+sketches once, hash at the gate L
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
        # probs_table is num_tables-dependent for the tensored source;
        # re-derive at the probed L (same fix as bench.py's rehash)
        from clann_tpu.core.index import derive_probs_tables

        _probs, _ = derive_probs_tables(family, cfg)
        index = index.replace(
            hash_params=src.params,
            probs_table=jnp.asarray(_probs.table),
        )
    log(f"build {time.time()-t0:.0f}s")

    n_pts = index.vectors.shape[0]
    reps = int(os.environ.get("BENCH_LSH_REPS", 7))
    rows = []
    for G in G_LIST:
        t0 = time.time()
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
        idx_G = index.replace(
            g_sorted_hash=gh, g_records=gr, g_dir=gd, g_dir_iters=gdi,
            config=cfg.replace(gather_block=G),
        )
        log(f"G={G}: tables repacked {time.time()-t0:.0f}s")
        batches = [
            int(x) for x in os.environ.get("GATE_BATCH", "256").split(",")
        ]
        # chunk/fx are TRACE-time knobs: sweeping them re-jits but does
        # not rebuild tables, so the whole (chunk, fx) surface rides one
        # table repack
        chunks = [
            int(x) for x in os.environ.get("GATE_CHUNK", "2048").split(",")
        ]
        fxs = [int(x) for x in os.environ.get("GATE_FX", "8").split(",")]
        for dlt in DELTA_LIST or [delta]:
          for bsz in batches:
           for ch in chunks:
            for fx in fxs:
                idx_R = idx_G.replace(config=idx_G.config.replace(
                    candidate_chunk=ch, filter_expand=fx))
                try:
                    global_search(idx_R, test[:bsz], k=K, delta=dlt,
                                  batch_size=bsz)
                except Exception as e:
                    # record HBM-infeasible corners instead of dying:
                    # at L=128/G=32 fx=4 exhausts HBM (measured round 4)
                    log(f"G={G} delta={dlt} batch={bsz} chunk={ch} "
                        f"fx={fx}: FAILED {type(e).__name__}")
                    rows.append({
                        "gather_block": G, "num_tables": L, "delta": dlt,
                        "batch_size": bsz, "candidate_chunk": ch,
                        "filter_expand": fx, "recall": 0.0,
                        "error": str(e)[:200],
                    })
                    continue
                per_rep = []
                for _ in range(reps):
                    t0 = time.time()
                    d_, _, st = global_search(idx_R, test, k=K, delta=dlt,
                                              batch_size=bsz)
                    per_rep.append(len(test) / (time.time() - t0))
                qps = float(np.median(per_rep))
                r, _, _ = recall_values(gt_d, d_, count=K)
                dc = float(st.distance_computations.mean())
                log(f"G={G} delta={dlt} batch={bsz} chunk={ch} fx={fx}: "
                    f"QPS={qps:.1f} (reps {[round(q,1) for q in per_rep]}) "
                    f"recall={r:.4f} dc/q={dc:.0f}")
                g_bytes = sum(
                    a.size * a.dtype.itemsize for a in (gh, gr, gd)
                )
                rows.append({
                    "gather_block": G, "num_tables": L, "delta": dlt,
                    "batch_size": bsz, "candidate_chunk": ch,
                    "filter_expand": fx,
                    "qps": round(qps, 1), "recall": round(float(r), 4),
                    "dc_per_query": round(dc),
                    "per_rep_qps": [round(q, 1) for q in per_rep],
                    "index_bytes": int(idx_G.memory_usage()),
                    "global_struct_bytes": int(g_bytes),
                })
        del idx_G, gh, gr, gd

    out = {
        "n": int(N_TRAIN), "k": K, "queries": int(len(test)),
        "chosen_base": chosen, "rows": rows,
        "note": (
            "gather_block (x delta) sweep at the gate L from "
            "LSH_AT_09.json; motivated by GATHER_RATE.json's issue-rate "
            "curve (G=32 row optimum). Same unified LSH protocol (512q "
            "batch256 chunk2048 fx8, median of BENCH_LSH_REPS)."
        ),
    }
    out_name = os.environ.get("GATE_OUT", "GATE_KNOBS.json")
    with open(os.path.join(root, out_name), "w") as f:
        json.dump(out, f, indent=1)
    log(f"wrote {out_name}")

    # promote a strictly better gate row (recall >= 0.9, higher QPS) into
    # LSH_AT_09.json so bench.py picks up the winning knobs
    gate_rows = [r for r in rows if r["recall"] >= 0.9]
    if gate_rows:
        best = max(gate_rows, key=lambda r: r["qps"])
        if best["qps"] > chosen["qps"]:
            path = os.path.join(root, "LSH_AT_09.json")
            with open(path) as f:
                doc = json.load(f)
            doc["chosen"] = {**chosen, **best}
            doc["rows"] = doc.get("rows", []) + [
                {**r, "source": "exp_gate_knobs"} for r in rows
            ]
            with open(path, "w") as f:
                json.dump(doc, f, indent=1)
            log(f"promoted new chosen into LSH_AT_09.json: {doc['chosen']}")


if __name__ == "__main__":
    main()
