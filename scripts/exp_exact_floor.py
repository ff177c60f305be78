"""Measure the exact-scan floor and the certified-exact lift (VERDICT r4 #7).

BENCH_r04 left scan-exact at 16.5k QPS — 8x below the approx paths —
with no decomposition. The gap is the per-block `lax.top_k` sort (TPU
lowers top_k to a selection network per (Q, block) tile; `approx_max_k`
rides the binned-max hardware path). Round 5 adds the certified exact
algorithm (ops/distances._certified_scan_impl): approx winners + exact
rescore + a selection-free counting pass that CERTIFIES exactness per
query (count == k), with a direct-sort fallback only for uncertified
queries. This experiment measures, at the 1.18M bench shape:

  - direct exact QPS (the old floor, 1 rep — it is slow);
  - certified exact QPS (5 reps, median) + fallback fraction;
  - the approx path QPS (the certified path's pass-1 cost reference);
  - equality of certified vs direct ids on a query subset;
  - fallback fraction at eps in {0, 1e-6, 1e-5, 1e-4} — the measured
    sensitivity of the certificate to the precision margin.

Writes EXACT_FLOOR.json. Run: python -m scripts.exp_exact_floor
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
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "EXACT_FLOOR.json",
)


def log(m):
    print(f"[exact_floor] {m}", file=sys.stderr, flush=True)


def main():
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from bench import DELTA, FACTOR, N_TRAIN, NUM_TABLES, get_dataset, wait_for_tpu

    wait_for_tpu()
    import jax
    import jax.numpy as jnp

    from clann_tpu.config import Config
    from clann_tpu.core.index import build_index
    from clann_tpu.metrics.recall import recall_values
    from clann_tpu.ops.ivf import scan_search

    train, test, gt_d, gt_i = get_dataset()
    cfg = Config(
        num_tables=NUM_TABLES, num_clusters_factor=FACTOR, k=K, delta=DELTA,
        candidate_chunk=512, seed=0, pack_slot_records=False,
    )
    t0 = time.time()
    index = build_index(train, cfg)
    log(f"build {time.time()-t0:.0f}s")
    test_d = jax.device_put(jnp.asarray(test))
    _ = np.asarray(test_d[:1])
    Q = len(test)

    def timed(fn, reps):
        fn()
        per = []
        out = None
        for _ in range(reps):
            t0 = time.time()
            out = fn()
            per.append(time.time() - t0)
        return float(np.median(per)), out, [round(p, 3) for p in per]

    # approx reference (pass-1 cost), direct exact, certified exact
    el_a, (d_a, i_a, _), reps_a = timed(
        lambda: scan_search(index, test_d, k=K, recall_target=0.85,
                            batch_q=Q), 5)
    log(f"approx: {Q/el_a:.0f} QPS")
    el_d, (d_d, i_d, _), reps_d = timed(
        lambda: scan_search(index, test_d, k=K, exact=True,
                            exact_certify=False, batch_q=Q), 1)
    log(f"direct exact: {Q/el_d:.0f} QPS")
    el_c, (d_c, i_c, st_c), reps_c = timed(
        lambda: scan_search(index, test_d, k=K, exact=True,
                            exact_certify=True, batch_q=Q), 5)
    fb = float(np.asarray(st_c.uncertified).mean())
    log(f"certified exact: {Q/el_c:.0f} QPS, fallback {fb:.4f}")

    # equality vs direct (membership; scores differ at ~1e-7 — certified
    # returns the HIGHEST-precision rescore)
    same = bool(np.array_equal(np.sort(i_c, axis=1), np.sort(i_d, axis=1)))
    r_c, _, _ = recall_values(gt_d, d_c, count=K)
    r_d, _, _ = recall_values(gt_d, d_d, count=K)
    log(f"ids equal direct: {same}; recall certified {r_c:.4f} "
        f"direct {r_d:.4f}")

    # eps sensitivity (fallback fraction only; 1 rep each)
    eps_rows = []
    for eps in (0.0, 1e-6, 1e-5, 1e-4):
        _, (_, _, st_e), _ = timed(
            lambda: scan_search(index, test_d, k=K, exact=True,
                                exact_certify=True, exact_eps=eps,
                                batch_q=Q), 1)
        eps_rows.append({
            "eps": eps,
            "fallback_fraction":
                round(float(np.asarray(st_e.uncertified).mean()), 5),
        })
        log(f"eps={eps}: fallback {eps_rows[-1]['fallback_fraction']}")

    out = {
        "n": int(N_TRAIN), "nq": Q, "k": K,
        "approx_qps": round(Q / el_a, 1),
        "direct_exact_qps": round(Q / el_d, 1),
        "certified_exact_qps": round(Q / el_c, 1),
        "certified_speedup_vs_direct": round(el_d / el_c, 2),
        "certified_fallback_fraction": round(fb, 5),
        "ids_equal_direct": same,
        "recall_certified": round(float(r_c), 4),
        "recall_direct": round(float(r_d), 4),
        "per_rep_s": {"approx": reps_a, "direct": reps_d,
                      "certified": reps_c},
        "eps_sensitivity": eps_rows,
        "note": (
            "certified = approx winners + exact rescore + selection-free "
            "counting certificate; fallback re-runs only uncertified "
            "queries through the direct per-block top_k sort "
            "(ops/distances._certified_scan_impl soundness note)"
        ),
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    log(f"wrote {OUT}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
