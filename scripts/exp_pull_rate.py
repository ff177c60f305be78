"""Measure the relay's device->host result-pull cost vs byte count.

Motivation: the dense headline path is bound by compute (~69ms/10k
queries at the VMEM floor) + the result pull. `pull="ids"` (400KB at
Q=10k, k=10) already beats the packed (dists, ids) pull (800KB) by
~11ms. Before building a 21-bit bit-packed id pull (280KB), measure
whether the pull cost is marginal in BYTES or dominated by fixed
dispatch latency — if fixed, packing cannot pay.

Protocol: np.asarray on device-resident uint32 arrays of the exact
candidate sizes, medians of N reps, interleaved across sizes to
decorrelate relay drift (VERDICT r3 #6 lesson). Output: PULL_RATE.json.
"""

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/jax_comp_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax
import jax.numpy as jnp


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    log(f"devices: {jax.devices()}")
    reps = int(os.environ.get("PULL_REPS", 15))
    Q, K = 10_000, 10
    # sizes in int32 words per query: 20 = packed(dists,ids), 10 = ids,
    # 7 = 21-bit-packed ids, 4/2/1 = hypothetical floors
    widths = [20, 10, 7, 4, 2, 1]
    arrs = {
        w: jax.device_put(
            jnp.asarray(
                np.random.randint(0, 2**21, size=(Q, w), dtype=np.int32)
            )
        )
        for w in widths
    }
    # materialize once so the arrays are resident before timing
    for w in widths:
        _ = np.asarray(arrs[w][:1])

    # jax.Array caches its host copy after the first np.asarray, so the
    # pull must target a FRESH device array each rep: add a per-rep
    # constant on device (same tiny dispatch cost at every width — it
    # shifts the fit's intercept, not the byte slope)
    bump = jax.jit(lambda a, c: a + c)
    times = {w: [] for w in widths}
    for r in range(reps):
        for w in widths:  # interleaved: each rep sees every size
            t0 = time.time()
            out = np.asarray(bump(arrs[w], jnp.int32(r)))
            dt = time.time() - t0
            assert out.shape == (Q, w)
            times[w].append(dt)
        log(f"rep {r+1}/{reps}: " + " ".join(
            f"{w}w={times[w][-1]*1e3:.1f}ms" for w in widths))

    rows = []
    for w in widths:
        med = float(np.median(times[w]))
        rows.append({
            "words_per_query": w,
            "bytes": Q * w * 4,
            "median_ms": round(med * 1e3, 2),
            "per_rep_ms": [round(t * 1e3, 2) for t in times[w]],
        })
        log(f"width {w}: {Q*w*4/1024:.0f}KB median {med*1e3:.1f}ms")

    # marginal byte rate from the least-squares slope over the medians
    xs = np.array([r["bytes"] for r in rows], float)
    ys = np.array([r["median_ms"] for r in rows], float)
    A = np.vstack([xs, np.ones_like(xs)]).T
    slope, intercept = np.linalg.lstsq(A, ys, rcond=None)[0]
    verdict = {
        "fixed_ms": round(float(intercept), 2),
        "marginal_ms_per_100KB": round(float(slope) * 102_400, 2),
        "pack_ids_21bit_saves_ms": round(float(slope) * (10 - 7) * 4 * Q, 2),
    }
    log(f"fit: fixed={verdict['fixed_ms']}ms "
        f"marginal={verdict['marginal_ms_per_100KB']}ms/100KB "
        f"packing ids 10w->7w saves ~{verdict['pack_ids_21bit_saves_ms']}ms")

    out = {"rows": rows, "fit": verdict, "reps": reps, "q": Q, "k": K}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PULL_RATE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    log(f"wrote {path}")


if __name__ == "__main__":
    main()
