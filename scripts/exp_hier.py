"""Hierarchical-data measurement: where the clustered design pays.

Builds the index on a multi-scale (super/sub-mode) dataset at glove scale
and compares the full fused scan against IVF probing and the adaptive
wave driver — the regimes the ball-overlap geometry was designed for.
"""
import os
import sys
import time

import numpy as np

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp_cache")
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax
import jax.numpy as jnp

from clann_tpu.config import Config
from clann_tpu.core.index import build_index
from clann_tpu.data.synthetic import hierarchical_unit_vectors
from clann_tpu.metrics.recall import recall_values
from clann_tpu.ops.distances import brute_force_topk
from clann_tpu.ops.ivf import adaptive_dense_search, dense_search, scan_search

N = int(os.environ.get("HIER_N", 1_183_514))
D, Q, K = 100, 10_000, 10


def log(m):
    print(m, file=sys.stderr, flush=True)


log(f"devices: {jax.devices()}")
cache = os.path.expanduser(f"~/.cache/clann_tpu/hier_{N}x{D}_q{Q}.npz")
if os.path.exists(cache):
    z = np.load(cache)
    train, test, gt_d = z["train"], z["test"], z["gt_d"]
else:
    t0 = time.time()
    train = hierarchical_unit_vectors(N, D, n_super=64, subs_per_super=64,
                                      seed=0)
    test = hierarchical_unit_vectors(Q, D, n_super=64, subs_per_super=64,
                                     seed=0)  # same modes; queries = seed 0
    # held-out queries: perturb train-distribution draws
    rng = np.random.default_rng(1)
    test = test[rng.permutation(Q)]
    log(f"generated {time.time()-t0:.0f}s; exact GT on device")
    t0 = time.time()
    gt_d, _ = brute_force_topk(train, test, k=K, metric="angular",
                               block_q=512)
    gt_d = np.asarray(gt_d)
    log(f"GT {time.time()-t0:.0f}s")
    np.savez(cache, train=train, test=test, gt_d=gt_d)

cfg = Config(num_tables=50, num_clusters_factor=0.4, k=K, delta=0.9,
             dataset_name=f"hier-{N}", candidate_chunk=512, seed=0,
             pack_slot_records=False)
t0 = time.time()
index = build_index(train, cfg)
log(f"build {time.time()-t0:.0f}s clusters={index.n_clusters} "
    f"rows={index.seg_centers.shape[0]}")

test_d = jax.device_put(jnp.asarray(test))
_ = np.asarray(test_d[:1])


def timed(fn, reps=6):
    fn()
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    return (time.time() - t0) / reps, out


# full fused scan (the flat baseline)
el, (d_s, _, st) = timed(lambda: scan_search(index, test_d, k=K,
                                             use_pallas=True,
                                             batch_q=len(test)))
r, _, _ = recall_values(gt_d, d_s, count=K)
log(f"scan-pallas: QPS={Q/el:.0f} recall={r:.4f} dc/q={N}")

# IVF probing sweep
for n_probe in [4, 8, 12, 16, 24, 32, 48]:
    el, (d_i, _, st) = timed(lambda: dense_search(index, test_d, k=K,
                                                  n_probe=n_probe,
                                                  batch_size=4096), reps=3)
    r, _, _ = recall_values(gt_d, d_i, count=K)
    log(f"ivf p={n_probe}: QPS={Q/el:.0f} recall={r:.4f} "
        f"dc/q={st.distance_computations.mean():.0f} "
        f"uncert={st.uncertified.mean():.2f}")
    if r >= 0.95:
        break

# adaptive wave driver (ball certificates)
el, (d_a, _, st) = timed(lambda: adaptive_dense_search(
    index, test[:2048], k=K), reps=2)
r, _, _ = recall_values(gt_d[:2048], d_a, count=K)
log(f"adaptive: QPS={2048/el:.0f} recall={r:.4f} "
    f"dc/q={st.distance_computations.mean():.0f}")
