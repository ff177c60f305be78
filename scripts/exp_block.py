"""Block-probed fused scan vs the full fused scan, at glove scale.

Measures ops/pallas/block_scan.py on the bench dataset (flat, deliberately
hard) and on the hierarchical (ball-prunable) dataset: QPS + recall across
probe budgets against the scan-pallas baseline.

Run: python -m scripts.exp_block            (flat bench data)
     BLOCK_KIND=hier python -m scripts.exp_block
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
from clann_tpu.data.synthetic import (
    clustered_unit_vectors,
    hierarchical_unit_vectors,
)
from clann_tpu.metrics.recall import recall_values
from clann_tpu.ops.distances import brute_force_topk
from clann_tpu.ops.ivf import scan_search
from clann_tpu.ops.pallas.block_scan import block_scan_search, get_block_layout
from clann_tpu.ops.ivf import pallas_scan_plan

N = int(os.environ.get("BLOCK_N_TRAIN", 1_183_514))
D, Q, K = 100, 10_000, 10
KIND = os.environ.get("BLOCK_KIND", "flat")


def log(m):
    print(m, file=sys.stderr, flush=True)


log(f"devices: {jax.devices()}")
if KIND == "flat":
    cache = os.path.expanduser(f"~/.cache/clann_tpu/bench_{N}x{D}_q{Q}.npz")
    z = np.load(cache)
    train, test = z["train"], z["test"]
    gt_cache = os.path.expanduser(f"~/.cache/clann_tpu/bench_gt_{N}.npz")
    if os.path.exists(gt_cache):
        gt_d = np.load(gt_cache)["gt_d"]
    else:
        t0 = time.time()
        gt_d, _ = brute_force_topk(train, test, k=K, metric="angular",
                                   block_q=512)
        gt_d = np.asarray(gt_d)
        log(f"GT {time.time()-t0:.0f}s")
        np.savez(gt_cache, gt_d=gt_d)
else:
    cache = os.path.expanduser(f"~/.cache/clann_tpu/hier_{N}x{D}_q{Q}.npz")
    z = np.load(cache)
    train, test, gt_d = z["train"], z["test"], z["gt_d"]

cfg = Config(num_tables=10, num_clusters_factor=0.4, k=K, delta=0.9,
             dataset_name=f"block-{KIND}-{N}", seed=0,
             pack_slot_records=False)
t0 = time.time()
index = build_index(train, cfg)
log(f"build {time.time()-t0:.0f}s clusters={index.n_clusters}")

test_d = jax.device_put(jnp.asarray(test))
_ = np.asarray(test_d[:1])

block_n = pallas_scan_plan(N, K)[0]
layout = get_block_layout(index, block_n)
log(f"layout: {layout.n_blocks} blocks x {block_n}")


def timed(fn, reps=5):
    fn()
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    return (time.time() - t0) / reps, out


el, (d_s, _, st) = timed(lambda: scan_search(index, test_d, k=K,
                                             use_pallas=True,
                                             batch_q=len(test)))
r, _, _ = recall_values(gt_d, d_s, count=K)
log(f"scan-pallas (full): QPS={Q/el:.0f} recall={r:.4f}")

nb = layout.n_blocks
for B in sorted({max(2, nb // 8), nb // 4, nb // 3, nb // 2,
                 (2 * nb) // 3, nb}):
    el, (d_b, _, st) = timed(
        lambda: block_scan_search(index, test_d, k=K, n_probe=B,
                                  batch_q=len(test))
    )
    r, _, _ = recall_values(gt_d, d_b, count=K)
    log(f"block-scan B={B:3d}/{nb}: QPS={Q/el:.0f} recall={r:.4f} "
        f"dc/q={st.distance_computations.mean():.0f} "
        f"uncert={st.uncertified.mean():.2f}")
