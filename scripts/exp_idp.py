"""A/B: ids pull vs 21-bit bit-packed ids pull on the fused scan path.

Full-path measurement at the bench shape (1.18M x 100, 10k queries,
k=10): `fused_scan_topk_e2e` + np.asarray(ids) versus the
`_pallas_scan_ids_packed` wrapper (pack fused into the same jit) +
exact host unpack. PULL_RATE.json predicts ~3.5-4.3ms savings from the
3 fewer int32 words/query. Interleaved reps (relay drift), medians.
Output: IDP_AB.json.
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
    from clann_tpu.ops.ivf import (
        _ids_pack_spec, _pallas_scan_ids_packed, _unpack_ids_host,
        pallas_scan_plan,
    )
    from clann_tpu.ops.pallas.scan_topk import fused_scan_topk_e2e

    log(f"devices: {jax.devices()}")
    reps = int(os.environ.get("IDP_REPS", 12))
    z = np.load(os.path.expanduser(
        "~/.cache/clann_tpu/bench_1183514x100_q10000.npz"))
    train, test = z["train"], z["test"]
    n, d = train.shape
    k = 10
    tn = train / np.maximum(
        np.linalg.norm(train, axis=1, keepdims=True), 1e-30)
    block_n, num_bins, rescore_m, q_tile = pallas_scan_plan(n, k, d=d)
    dpad = ((d + 1 + 127) // 128) * 128
    n_pad = ((n + block_n - 1) // block_n) * block_n
    vecs = jax.device_put(jnp.asarray(tn, jnp.float32))
    base_p = jnp.pad(
        jnp.concatenate(
            [vecs.astype(jnp.bfloat16),
             jnp.ones((n, 1), jnp.bfloat16),
             jnp.zeros((n, dpad - d - 1), jnp.bfloat16)], axis=1),
        ((0, n_pad - n), (0, 0)))
    qd = jax.device_put(jnp.asarray(test, jnp.float32))
    bits, words = _ids_pack_spec(n, k)
    log(f"plan block_n={block_n} nb={num_bins} m={rescore_m} qt={q_tile} "
        f"bits={bits} words={words}")

    def run_ids():
        _, ti = fused_scan_topk_e2e(
            base_p, vecs, qd, n_real=n, k=k, rescore_m=rescore_m,
            num_bins=num_bins, block_n=block_n, q_tile=q_tile,
            normalize=True, biased=True)
        return np.asarray(ti)

    def run_idp():
        w = _pallas_scan_ids_packed(
            base_p, vecs, qd, n_real=n, k=k, rescore_m=rescore_m,
            num_bins=num_bins, block_n=block_n, q_tile=q_tile,
            interpret=False, bits=bits, words=words)
        return _unpack_ids_host(np.asarray(w), n=n, bits=bits, k=k)

    i_a = run_ids()  # warm/compile
    i_b = run_idp()
    np.testing.assert_array_equal(i_a, i_b)
    log("ids identical across modes")

    t_ids, t_idp = [], []
    for r in range(reps):
        t0 = time.time(); run_ids(); t_ids.append(time.time() - t0)
        t0 = time.time(); run_idp(); t_idp.append(time.time() - t0)
        log(f"rep {r+1}/{reps}: ids={t_ids[-1]*1e3:.1f}ms "
            f"idp={t_idp[-1]*1e3:.1f}ms")

    Q = test.shape[0]
    med_a, med_b = float(np.median(t_ids)), float(np.median(t_idp))
    out = {
        "shape": [int(n), int(d)], "q": Q, "k": k, "reps": reps,
        "bits": bits, "words": words,
        "ids": {"median_ms": round(med_a * 1e3, 1),
                "qps": round(Q / med_a, 0),
                "per_rep_ms": [round(t * 1e3, 1) for t in t_ids]},
        "ids_packed": {"median_ms": round(med_b * 1e3, 1),
                       "qps": round(Q / med_b, 0),
                       "per_rep_ms": [round(t * 1e3, 1) for t in t_idp]},
        "delta_ms": round((med_a - med_b) * 1e3, 2),
    }
    log(f"ids {out['ids']['qps']:.0f} QPS vs packed "
        f"{out['ids_packed']['qps']:.0f} QPS (delta {out['delta_ms']}ms)")
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "IDP_AB.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    log(f"wrote {path}")


if __name__ == "__main__":
    main()
