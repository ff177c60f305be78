import time, os, sys, numpy as np, jax, jax.numpy as jnp
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
from clann_tpu.config import Config
from clann_tpu.core.index import build_index, make_global_tables, unsort_hashes
from clann_tpu.ops.global_query import global_search
from clann_tpu.ops.prefixmap import build_prefix_directory
from clann_tpu.data.synthetic import clustered_unit_vectors
from clann_tpu.ops.distances import brute_force_topk
from clann_tpu.metrics.recall import recall_values

cache = os.path.expanduser("~/.cache/clann_tpu/tune_200k.npz")
if os.path.exists(cache):
    z = np.load(cache); train, test, gt_d = z["train"], z["test"], z["gt_d"]
else:
    train = clustered_unit_vectors(200_000, 100, n_modes=1024, spread=0.7, seed=0)
    test = clustered_unit_vectors(256, 100, n_modes=1024, spread=0.7, seed=1)
    gt_d, _ = brute_force_topk(train, test, k=10, metric="angular", block_q=256)
    gt_d = np.asarray(gt_d)
    np.savez(cache, train=train, test=test, gt_d=gt_d)

cfg0 = Config(num_tables=50, num_clusters_factor=0.4, k=10, delta=0.9,
              candidate_chunk=512, seed=0, pack_slot_records=False,
              dense_layout=False, gather_block=8)
t0=time.time(); index = build_index(train, cfg0)
print(f"build {time.time()-t0:.0f}s", flush=True)
hashes_T = unsort_hashes(index.sorted_hash, index.sorted_idx)
gh, gr = make_global_tables(hashes_T, index.sketches, index.assignment, pad_to=16)
n_pts = index.vectors.shape[0]
gd = build_prefix_directory(gh, jnp.asarray(np.asarray([0, n_pts], np.int32)),
    cfg0.global_dir_bits, int(np.ceil(np.log2(max(2, n_pts)))) + 1, cfg0.max_hashbits)
gdi = int(np.ceil(np.log2(max(2, int(jnp.max(gd[:, :, 1:] - gd[:, :, :-1])))))) + 1
index = index.replace(g_sorted_hash=gh, g_records=gr, g_dir=gd, g_dir_iters=gdi)

configs = [tuple(map(int, (c.split(",") + ["0"])[:5])) for c in sys.argv[1:]]
for g, chunk, fx, bs, cap in configs:
    cfg = cfg0.replace(gather_block=g, candidate_chunk=chunk,
                       filter_expand=fx, global_entry_cap=cap)
    idx = index.replace(config=cfg)
    global_search(idx, test, k=10, delta=0.9, batch_size=bs)  # warm
    t0 = time.time()
    d_, i_, st = global_search(idx, test, k=10, delta=0.9, batch_size=bs)
    el = time.time() - t0
    r, _, _ = recall_values(gt_d, d_, count=10)
    print(f"G={g} chunk={chunk} fx={fx} bs={bs} cap={cap}: QPS={256/el:.1f} recall={r:.4f} dc/q={st.distance_computations.mean():.0f}", flush=True)
