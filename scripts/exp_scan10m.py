"""10M-point single-chip capacity check for the fused scan kernel.

Generates 10M clustered unit vectors, stages them once, runs the biased
packed kernel at the pallas_scan_plan shapes, and validates recall on a
256-query exact-GT subset.
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

from clann_tpu.data.synthetic import clustered_unit_vectors
from clann_tpu.metrics.recall import recall_values
from clann_tpu.ops.ivf import pallas_scan_plan
from clann_tpu.ops.pallas.scan_topk import fused_scan_topk_e2e

N, D, Q, K = 10_000_000, 100, 2048, 10


def log(m):
    print(m, file=sys.stderr, flush=True)


log(f"devices: {jax.devices()}")
t0 = time.time()
train = clustered_unit_vectors(N, D, n_modes=4096, spread=0.7, seed=0)
test = clustered_unit_vectors(Q, D, n_modes=4096, spread=0.7, seed=1)
log(f"generated {time.time()-t0:.0f}s")

block_n, num_bins, rescore_m, q_tile = pallas_scan_plan(N, K)
log(f"plan: block_n={block_n} nb={num_bins} m={rescore_m} qt={q_tile}")

dpad = ((D + 1 + 127) // 128) * 128
n_pad = ((N + block_n - 1) // block_n) * block_n
t0 = time.time()
base_p = jnp.zeros((n_pad, dpad), jnp.bfloat16)
base_p = base_p.at[:N, :D].set(jnp.asarray(train, jnp.bfloat16))
base_p = base_p.at[:N, D].set(jnp.bfloat16(1.0))
base_f32 = jnp.asarray(train, jnp.float32)
_ = np.asarray(base_p[:1, :1])
log(f"staged {time.time()-t0:.0f}s")

q_dev = jax.device_put(jnp.asarray(test, jnp.float32))
_ = np.asarray(q_dev[:1, :1])


def call():
    s, i = fused_scan_topk_e2e(
        base_p, base_f32, q_dev, n_real=N, k=K, rescore_m=rescore_m,
        num_bins=num_bins, block_n=block_n, q_tile=q_tile,
        normalize=True, biased=True)
    packed = jnp.concatenate(
        [jax.lax.bitcast_convert_type(s, jnp.int32), i], axis=1)
    flat = np.asarray(packed)
    return np.ascontiguousarray(flat[:, :K]).view(np.float32), flat[:, K:]


call()  # warm/compile
reps = 4
t0 = time.time()
for _ in range(reps):
    dots, ids = call()
el = (time.time() - t0) / reps
log(f"e2e {el*1000:.0f}ms -> QPS={Q/el:.0f}")

# exact GT on a subset, against the RESIDENT f32 copy (a second host
# transfer of the 4GB dataset OOMs the 16GB chip alongside the bf16 copy)
from clann_tpu.ops.distances import brute_force_topk
gt_d, _ = brute_force_topk(base_f32, test[:256], k=K, metric="angular",
                           block_q=256)
dists = np.where(ids >= 0, np.clip(1.0 - dots, 0, 2), np.inf)
r, _, _ = recall_values(np.asarray(gt_d), dists[:256], count=K)
log(f"recall@10 (256-query GT) = {r:.4f}")
print(f'{{"qps": {Q/el:.0f}, "recall": {r:.4f}}}')
