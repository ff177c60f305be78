"""Sweep the clustered-walk engine's knobs on the real chip.

Usage: python -m scripts.tune_clustered "g,bs,onehot,cap,lc" ...
where g = lsh_group_ranks, bs = query batch size, onehot = dir_onehot,
cap = lsh_entry_cap, lc = lsh_level_chunk (0 = eager).
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

from clann_tpu.config import Config
from clann_tpu.core.index import build_index
from clann_tpu.data.synthetic import clustered_unit_vectors
from clann_tpu.metrics.recall import recall_values
from clann_tpu.ops.distances import brute_force_topk
from clann_tpu.ops.query import search

KIND = os.environ.get("TUNE_DATA", "flat")  # flat | hier
cache = os.path.expanduser(f"~/.cache/clann_tpu/tune_200k_{KIND}.npz")
if os.path.exists(cache):
    z = np.load(cache)
    train, test, gt_d = z["train"], z["test"], z["gt_d"]
else:
    if KIND == "hier":
        from clann_tpu.data.synthetic import hierarchical_unit_vectors

        train = hierarchical_unit_vectors(200_000, 100, n_super=32,
                                          subs_per_super=32, seed=0)
        test = hierarchical_unit_vectors(256, 100, n_super=32,
                                         subs_per_super=32, seed=3)
    else:
        train = clustered_unit_vectors(200_000, 100, n_modes=1024,
                                       spread=0.7, seed=0)
        test = clustered_unit_vectors(256, 100, n_modes=1024, spread=0.7,
                                      seed=1)
    gt_d, _ = brute_force_topk(train, test, k=10, metric="angular",
                               block_q=256)
    gt_d = np.asarray(gt_d)
    np.savez(cache, train=train, test=test, gt_d=gt_d)

cfg0 = Config(num_tables=50, num_clusters_factor=0.4, k=10, delta=0.9,
              candidate_chunk=512, seed=0, pack_slot_records=True,
              dense_layout=False, gather_block=16)
t0 = time.time()
index = build_index(train, cfg0)
print(f"build {time.time() - t0:.0f}s", flush=True)

configs = [tuple(map(int, c.split(","))) for c in sys.argv[1:]] or [
    (1, 64, 1, 1, 0), (1, 64, 1, 1, 1), (1, 64, 1, 1, 2), (1, 64, 1, 1, 3),
]
for g, bs, onehot, cap, lc in configs:
    cfg = cfg0.replace(lsh_group_ranks=g, dir_onehot=bool(onehot),
                       lsh_entry_cap=bool(cap), lsh_level_chunk=lc)
    idx = index.replace(config=cfg)
    search(idx, test, k=10, delta=0.9, batch_size=bs)  # warm/compile
    t0 = time.time()
    d_, i_, st = search(idx, test, k=10, delta=0.9, batch_size=bs)
    el = time.time() - t0
    r, _, _ = recall_values(gt_d, d_, count=10)
    print(
        f"g={g} bs={bs} onehot={onehot} cap={cap} lc={lc}: "
        f"QPS={len(test)/el:.1f} recall={r:.4f} "
        f"dc/q={st.distance_computations.mean():.0f} "
        f"visited/q={st.clusters_visited.mean():.0f}",
        flush=True,
    )
