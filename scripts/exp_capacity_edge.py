"""Witness the single-chip capacity edge (VERDICT r4 #5).

PERFORMANCE.md asserts the dense scan's single-chip ceiling at ~30M
points x 100d (f32 vectors + bf16 scan copy outgrow HBM) and that
IVF/sharding is the answer beyond — but the largest measured run was 10M
and nothing witnessed what the framework actually DOES at the edge. This
experiment converts the story to measurement:

  1. plan_capacity's verdict across an n ladder (free, analytic);
  2. a REAL build+search at the largest n the planner accepts;
  3. real attempts one and two steps past it, each in its own subprocess
     (one HBM OOM poisons a process for all later dispatches — platform
     lesson, ROUND_NOTES), recording the actual outcome: clean run,
     RESOURCE_EXHAUSTED, or worker crash;
  4. the planner's fallback prescription (min_devices/recommended) for
     every failing n — the sharded path the multichip dryrun validates.

The scan config is the scan-relevant structure set: L=1 table (tables are
not the object under test; L*n*8 would dominate and muddy the edge),
tiny cluster factor (geometry is not under test), dense_layout on.

Writes CAPACITY_EDGE.json. Run: python -m scripts.exp_capacity_edge
  env: CAP_LADDER="15000000,20000000,25000000,30000000" CAP_Q=512
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "CAPACITY_EDGE.json")
D = 100
K = 10
NQ = int(os.environ.get("CAP_Q", 512))
LADDER = [int(x) for x in os.environ.get(
    "CAP_LADDER", "15000000,20000000,25000000,30000000").split(",")]


def log(m):
    print(f"[capacity] {m}", file=sys.stderr, flush=True)


def cfg_kwargs():
    # CAP_DENSE=0 drops the plain-scan eager bf16 copy — the LEAN pallas
    # serving residency (f32 vectors + the kernel's own padded base).
    # With it on, THREE copies are resident (f32 + dense bf16 + pallas
    # base) and the witnessed edge drops below 10M (attempts in
    # CAPACITY_EDGE.json).
    return dict(
        num_tables=1, num_clusters_factor=0.02, k=K, delta=0.9,
        hash_family="simhash", seed=0, pack_slot_records=False,
        dense_layout=os.environ.get("CAP_DENSE", "1") != "0",
    )


CHILD = r"""
import json, os, sys, time
import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

n, d, nq, k = (int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]),
               int(sys.argv[4]))

import jax
import jax.numpy as jnp
from clann_tpu.config import Config
from clann_tpu.core.index import build_index
from clann_tpu.ops.ivf import scan_search

cfg = Config(**json.loads(sys.argv[5]))

def gen(rows, seed):
    rng = np.random.default_rng(seed)
    out = np.empty((rows, d), np.float32)
    B = 1 << 20
    for s in range(0, rows, B):
        e = min(rows, s + B)
        blk = rng.standard_normal((e - s, d)).astype(np.float32)
        out[s:e] = blk / np.linalg.norm(blk, axis=1, keepdims=True)
    return out

t0 = time.time()
train = gen(n, 0)
queries = gen(nq, 1)
gen_s = time.time() - t0
print(json.dumps({"stage": "generated", "s": round(gen_s, 1)}),
      file=sys.stderr, flush=True)

t0 = time.time()
index = build_index(train, cfg)
build_s = time.time() - t0
del train
resident = int(sum(int(np.prod(a.shape)) * a.dtype.itemsize
                   for a in jax.live_arrays()))
print(json.dumps({"stage": "built", "s": round(build_s, 1),
                  "resident_gb": round(resident / 1e9, 2)}),
      file=sys.stderr, flush=True)

# warm (compiles + materializes the bf16 scan copy), then timed reps
_ = scan_search(index, queries, k=k, use_pallas=True, pull="ids",
                batch_q=nq)
reps = []
out = None
for _i in range(5):
    t0 = time.time()
    out = scan_search(index, queries, k=k, use_pallas=True, pull="ids",
                      batch_q=nq)
    reps.append(time.time() - t0)
resident = int(sum(int(np.prod(a.shape)) * a.dtype.itemsize
                   for a in jax.live_arrays()))
qps = nq / float(np.median(reps))
# sanity: ids in range, no sentinel rows
ids = out[1]
assert ids.max() < n and (ids >= 0).all()
print(json.dumps({
    "outcome": "ok", "n": n, "build_s": round(build_s, 1),
    "gen_s": round(gen_s, 1), "qps": round(qps, 1),
    "rep_s": [round(r, 3) for r in reps],
    "resident_bytes": resident,
}))
"""


def main():
    sys.path.insert(0, REPO)
    from bench import wait_for_tpu

    from clann_tpu.config import Config
    from clann_tpu.parallel.capacity import plan_capacity

    cfg = Config(**cfg_kwargs())
    plans = []
    for n in LADDER:
        p = plan_capacity(n, D, cfg)
        plans.append({
            "n": n,
            "fits_single_chip": p.fits_single_chip,
            "total_gb": round(p.total_bytes / 1e9, 2),
            "usable_gb": round(p.usable_bytes / 1e9, 2),
            "min_devices": p.min_devices,
            "recommended_devices": p.recommended_devices,
        })
        log(f"plan n={n}: fits={p.fits_single_chip} "
            f"total={p.total_bytes/1e9:.1f}GB min_dev={p.min_devices}")

    fits = [p["n"] for p in plans if p["fits_single_chip"]]
    beyond = [p["n"] for p in plans if not p["fits_single_chip"]]
    attempts = []
    # largest planner-accepted n, then upward past the edge; stop at the
    # first hard failure TWO sizes in a row would only re-witness the OOM
    to_try = ([max(fits)] if fits else []) + beyond[:2]

    for n in to_try:
        wait_for_tpu()
        log(f"attempting n={n} in a subprocess...")
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, "-c", CHILD, str(n), str(D), str(NQ), str(K),
             json.dumps(cfg_kwargs())],
            capture_output=True, text=True, cwd=REPO, timeout=5400,
        )
        tail = (r.stderr or "")[-3000:]
        row = {"n": n, "rc": r.returncode,
               "wall_s": round(time.time() - t0, 1)}
        if r.returncode == 0 and r.stdout.strip():
            row.update(json.loads(r.stdout.strip().splitlines()[-1]))
        else:
            # classify on the FULL stderr (the RESOURCE_EXHAUSTED header
            # precedes a multi-KB allocation dump — a tail-only check
            # mislabels OOM as crash); store only a tail in the artifact
            low = (r.stderr or "").lower()
            if ("resource_exhausted" in low or "out of memory" in low
                    or "allocation type: hlo temp" in low):
                row["outcome"] = "oom"
            else:
                row["outcome"] = "crash"
            row["stderr_tail"] = tail[-1200:]
        plan = next(p for p in plans if p["n"] == n)
        row["planner_fits"] = plan["fits_single_chip"]
        row["planner_recommended_devices"] = plan["recommended_devices"]
        attempts.append(row)
        log(f"n={n}: outcome={row.get('outcome')} "
            f"qps={row.get('qps')} planner_fits={plan['fits_single_chip']}")
        if row.get("outcome") != "ok":
            # first failure witnessed; try at most one more size up
            if n != to_try[-1] and to_try.index(n) >= len(to_try) - 2:
                continue
            break

    out = {
        "config": cfg_kwargs(),
        "d": D,
        "nq": NQ,
        "planner_ladder": plans,
        "attempts": attempts,
        "fallback": (
            "past the edge the framework path is plan_capacity -> "
            "build_sharded/shard_index over recommended_devices "
            "(parallel/sharded.py; validated on the virtual mesh by "
            "dryrun_multichip and at realistic shape by dryrun_large)"
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
