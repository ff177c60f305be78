"""Headline benchmark: QPS/chip at recall@10 >= 0.9, glove-100-angular scale.

Runs on the real TPU chip (ambient axon env). Prints ONE JSON line:
  {"metric": ..., "value": QPS, "unit": "queries/s", "vs_baseline": x}

Dataset: no public ann-benchmarks files exist in this zero-egress image, so
the benchmark uses a synthetic clustered unit-vector dataset with the exact
glove-100-angular shape (1,183,514 train x 100 dims, 10,000 queries, k=10,
delta=0.9 — BASELINE.md target config) and exact ground truth computed on
device. The dataset+GT are cached under ~/.cache/clann_tpu.

Baseline: the reference publishes no numbers (BASELINE.md). When
BASELINE_MEASURED.json exists (written by `python -m scripts.ref_baseline`,
which runs the GENUINE vendored PUFFINN C++ engine on the identical dataset
bytes), `vs_baseline` divides by that measured QPS; otherwise it falls back
to a generous 2,000 QPS literature estimate (PUFFINN ESA'19 reports
10^2-10^3 QPS/core at recall 0.9 on glove-100). The reference query loop is
single-threaded BY DESIGN (collection.hpp:106-112), so the measured number
is per-process, not an artifact of this 1-core host. See baseline_note in
the output.

Protocol: build the clustered index, sweep n_probe to the smallest value
with recall@10 >= 0.9, then time repeated full query sweeps (warm,
batched) at that n_probe. Also reports the reference-faithful adaptive-LSH
path's QPS on a query subset as a secondary metric.
"""

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "jax_comp_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

BASELINE_QPS_ESTIMATE = 2000.0
BASELINE_MEASURED = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BASELINE_MEASURED.json"
)


def baseline_qps():
    """Measured reference QPS when available (scripts/ref_baseline.py runs
    the genuine vendored PUFFINN engine on this dataset — its query loop is
    single-threaded by design, collection.hpp:106-112), else the generous
    2000-QPS literature estimate."""
    try:
        with open(BASELINE_MEASURED) as f:
            m = json.load(f)
        return float(m["qps"]), (
            f"measured reference engine (tools/ref_cross.cpp bench, "
            f"{m['engine']}): {m['qps']:.1f} QPS at recall "
            f"{m['recall_mean']:.3f}, build {m['build_seconds']:.0f}s on "
            f"{m['build_cores']} core(s), same dataset bytes, L="
            f"{m['num_tables']} delta={m['delta']}; reference query loop "
            f"is single-threaded by design (collection.hpp:106-112)"
        )
    except (OSError, KeyError, ValueError):
        return BASELINE_QPS_ESTIMATE, (
            "reference publishes no numbers (BASELINE.md); vs_baseline "
            "uses a 2000 QPS estimate for the Rust/OpenMP reference on "
            "glove-100 at recall 0.9"
        )

N_TRAIN = int(os.environ.get("BENCH_N", 1_183_514))
DIMS = int(os.environ.get("BENCH_D", 100))
N_QUERIES = int(os.environ.get("BENCH_Q", 10_000))
K = 10
DELTA = 0.9
FACTOR = 0.4
NUM_TABLES = int(os.environ.get("BENCH_L", 50))
BATCH = 2048


def log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def wait_for_tpu(max_wait_s=2700, probe_timeout_s=240):
    """Block until the TPU relay answers a trivial dispatch.

    The ambient axon relay occasionally wedges for tens of minutes (even
    `import jax` blocks inside the sitecustomize plugin registration), so
    probing must happen in a SUBPROCESS — from the parent, before jax is
    imported. Without this the benchmark dies silently with zero output
    when the relay is down at launch time.
    """
    import subprocess

    probe = (
        "import numpy, jax.numpy as jnp;"
        "print(float(numpy.asarray(jnp.ones((8,8))@jnp.ones((8,8)))[0,0]))"
    )
    t0 = time.time()
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe],
                timeout=probe_timeout_s,
                capture_output=True,
            )
            if r.returncode == 0 and b"8.0" in r.stdout:
                if attempt > 1:
                    log(f"TPU relay recovered after {time.time()-t0:.0f}s")
                return
        except subprocess.TimeoutExpired:
            pass
        if time.time() - t0 > max_wait_s:
            log(f"TPU relay unresponsive for {max_wait_s}s; aborting")
            sys.exit(2)
        log(f"TPU relay not responding (probe {attempt}); retrying in 60s")
        time.sleep(60)


def get_dataset():
    """Bench dataset through the ann-benchmarks HDF5 path.

    The benchmark consumes its data the way a reference user would: an
    ann-benchmarks layout file (train/test/distances[/neighbors],
    src/utils/mod.rs:25-57) read through clann_tpu.data.hdf5 — so the
    real-data path is exercised end-to-end on every bench run even though
    no public dataset file exists in this zero-egress image (the file
    holds the synthetic glove-shaped set). Set BENCH_DATASET=/path/to/
    any-ann-benchmarks.hdf5 (e.g. a real glove-25-angular.hdf5) to run
    that file instead — missing ground truth is computed on device.

    The legacy .npz cache is kept alongside (scripts/ref_baseline.py
    feeds the genuine C++ engine from it) and converted to .hdf5 once.
    """
    from clann_tpu.data.hdf5 import (
        AnnDataset, load_hdf5_dataset, save_hdf5_dataset,
    )
    from clann_tpu.ops.distances import brute_force_topk

    def with_gt(ds):
        gt_d, gt_i = ds.distances, ds.neighbors
        if gt_d is None or gt_i is None or gt_d.shape[1] < K:
            log("dataset lacks ground truth; computing exactly on device")
            gt_d, gt_i = brute_force_topk(
                ds.train, ds.test, k=max(K, 10), metric="angular",
                block_q=512,
            )
            gt_d, gt_i = np.asarray(gt_d), np.asarray(gt_i)
        return ds.train, ds.test, gt_d, np.asarray(gt_i, np.int32)

    explicit = os.environ.get("BENCH_DATASET")
    if explicit:
        log(f"loading ann-benchmarks dataset {explicit}")
        return with_gt(load_hdf5_dataset(explicit))

    cache_dir = os.path.join(os.path.expanduser("~"), ".cache", "clann_tpu")
    os.makedirs(cache_dir, exist_ok=True)
    stem = f"bench_{N_TRAIN}x{DIMS}_q{N_QUERIES}"
    h5_path = os.path.join(cache_dir, stem + ".hdf5")
    npz_path = os.path.join(cache_dir, stem + ".npz")
    if os.path.exists(h5_path):
        log(f"loading cached dataset {h5_path} (ann-benchmarks layout)")
        return with_gt(load_hdf5_dataset(h5_path))
    if os.path.exists(npz_path):
        # one-time migration: same bytes, reference file layout
        log(f"converting {npz_path} -> {h5_path}")
        z = np.load(npz_path)
        save_hdf5_dataset(h5_path, AnnDataset(
            train=z["train"], test=z["test"], distances=z["gt_d"],
            neighbors=z["gt_i"], name=stem,
        ))
        return with_gt(load_hdf5_dataset(h5_path))

    from clann_tpu.data.synthetic import clustered_unit_vectors

    log(f"generating synthetic glove-100-like dataset {N_TRAIN}x{DIMS}")
    t0 = time.time()
    train = clustered_unit_vectors(N_TRAIN, DIMS, n_modes=1024, spread=0.7, seed=0)
    test = clustered_unit_vectors(N_QUERIES, DIMS, n_modes=1024, spread=0.7, seed=1)
    log(f"generated in {time.time()-t0:.0f}s; computing exact ground truth on device")
    t0 = time.time()
    gt_d, gt_i = brute_force_topk(train, test, k=max(K, 10), metric="angular",
                                  block_q=512)
    gt_d, gt_i = np.asarray(gt_d), np.asarray(gt_i)
    log(f"ground truth in {time.time()-t0:.0f}s")
    np.savez(npz_path, train=train, test=test, gt_d=gt_d, gt_i=gt_i)
    save_hdf5_dataset(h5_path, AnnDataset(
        train=train, test=test, distances=gt_d, neighbors=gt_i, name=stem,
    ))
    return with_gt(load_hdf5_dataset(h5_path))


def main():
    wait_for_tpu()
    import jax
    import jax.numpy as jnp

    log(f"devices: {jax.devices()}")
    from clann_tpu.config import Config
    from clann_tpu.core.index import build_index
    from clann_tpu.metrics.recall import recall_values
    from clann_tpu.ops.ivf import dense_search

    train, test, gt_d, gt_i = get_dataset()
    log(f"dataset in memory: train={train.shape} test={test.shape}")

    # lean build for the dense candidates: no LSH acceleration structures
    # resident (the ~1.2GB global-engine arrays measurably depress the
    # scan's HBM streaming rate; they are attached later, just for the
    # LSH secondary metric)
    cfg = Config(
        num_tables=NUM_TABLES,
        num_clusters_factor=FACTOR,
        k=K,
        delta=DELTA,
        dataset_name=f"glove-{DIMS}-angular-synthetic",
        candidate_chunk=512,
        seed=0,
        pack_slot_records=False,
    )
    log("building index...")
    t0 = time.time()
    index = build_index(train, cfg)
    build_s = time.time() - t0
    n_rows = int(index.seg_centers.shape[0])
    build_mem = index.memory_usage()
    log(
        f"build: {build_s:.0f}s, clusters={index.n_clusters}, rows={n_rows}, "
        f"memory={build_mem/1e9:.2f}GB"
    )

    candidates = []  # (name, qps, recall, dc, id_recall, rep_qps)

    def id_recall(ids):
        # id-membership recall vs exact ground-truth ids. The headline
        # recall is distance-threshold based (the reference's definition),
        # which cannot see id corruption — this gate exists because a
        # TPU denormal-flush bug once zeroed every returned id while
        # distance recall read 0.99 (fixed in ops/ivf.py; kept as a
        # permanent regression tripwire).
        return float(np.mean([
            len(set(a.tolist()) & set(b.tolist())) / K
            for a, b in zip(np.asarray(ids), gt_i[:, :K])
        ]))

    # relay dispatch jitter is ~±40ms/call and occasionally spikes far
    # above that, so the per-mode number is the MEDIAN over reps (round-1
    # used the mean of 8, which let one relay spike reorder the
    # pallas/approx headline between runs); per-rep times are persisted
    # in the JSON so the spread is auditable
    def timed(fn, reps=12):
        fn()  # warm / compile
        per_rep = []
        out = None
        for _ in range(reps):
            t0 = time.time()
            out = fn()
            per_rep.append(time.time() - t0)
        return float(np.median(per_rep)), out, per_rep

    # --- candidate 1: full dense scan with hardware approx_max_k ---
    from clann_tpu.ops.ivf import scan_search

    # queries device-resident (the serving scenario; the tunnel's host
    # transfer otherwise dominates at ~33MB/s)
    test_d = jax.device_put(jnp.asarray(test))
    _ = np.asarray(test_d[:1])
    el, (d_s, i_s, st_s), reps_s = timed(
        # recall_target swept at this scale: measured recall is 0.9991 at
        # EVERY setting down to 0.1 (the exact merge + final rescore keep
        # membership); 0.85 is ~15-20% faster than 0.95 and the curve is
        # flat below it (the bound moves to score materialization)
        lambda: scan_search(index, test_d, k=K, recall_target=0.85,
                            batch_q=len(test))
    )
    r_s, _, _ = recall_values(gt_d, d_s, count=K)
    ir_s = id_recall(i_s)
    log(f"scan(approx): QPS={len(test)/el:.0f} recall={r_s:.4f} "
        f"id_recall={ir_s:.4f} ({el*1000:.0f}ms)")
    candidates.append(("scan-approx", len(test) / el, r_s,
                       float(np.mean(st_s.distance_computations)), ir_s,
                       reps_s))

    # --- candidate 1b: fused Pallas scan kernel ---
    el, (d_p, i_p, st_p), reps_p = timed(
        lambda: scan_search(index, test_d, k=K, use_pallas=True,
                            batch_q=len(test))
    )
    r_p, _, _ = recall_values(gt_d, d_p, count=K)
    ir_p = id_recall(i_p)
    log(f"scan(pallas): QPS={len(test)/el:.0f} recall={r_p:.4f} "
        f"id_recall={ir_p:.4f}")
    candidates.append(("scan-pallas", len(test) / el, r_p,
                       float(np.mean(st_p.distance_computations)), ir_p,
                       reps_p))

    # --- candidates 1a'/1b': ids-only result pull (pull="ids"). The
    # measured decomposition (scripts/exp_kernel_floor.py): compute runs
    # at its VMEM floor (~69ms/10k) and the packed (dists, ids) pull
    # costs ~46ms through the host link, so result BYTES are the marginal
    # cost. ids are the ann-benchmarks protocol's unit of delivery;
    # recall below is computed from distances reconstructed EXACTLY on
    # the host (sims are deterministic per id), id_recall from the ids
    # as delivered. Both pull modes are reported side by side. ---
    _recon = {}

    def dists_from_ids(ids):
        if "tn" not in _recon:
            tn = train / np.maximum(
                np.linalg.norm(train, axis=-1, keepdims=True), 1e-30)
            qn = test / np.maximum(
                np.linalg.norm(test, axis=-1, keepdims=True), 1e-30)
            _recon["tn"], _recon["qn"] = tn, qn
        tn, qn = _recon["tn"], _recon["qn"]
        safe = np.clip(ids, 0, tn.shape[0] - 1)
        d = 1.0 - np.einsum("qkd,qd->qk", tn[safe], qn)
        return np.where(ids >= 0, np.clip(d, 0.0, 2.0), np.inf)

    for nm, pull, kw in (
            ("scan-approx-ids", "ids", dict(recall_target=0.85)),
            ("scan-pallas-ids", "ids", dict(use_pallas=True)),
            # 21-bit bit-packed id pull (7 int32 words/query vs 10): the
            # pull tail is marginal in BYTES (PULL_RATE.json), and the
            # pack is fused into the scan's jit (zero extra dispatches)
            ("scan-approx-idp", "ids-packed", dict(recall_target=0.85)),
            ("scan-pallas-idp", "ids-packed", dict(use_pallas=True))):
        el, (_, i_x, st_x), reps_x = timed(
            lambda: scan_search(index, test_d, k=K, batch_q=len(test),
                                pull=pull, **kw)
        )
        r_x, _, _ = recall_values(gt_d, dists_from_ids(i_x), count=K)
        ir_x = id_recall(i_x)
        log(f"{nm}: QPS={len(test)/el:.0f} recall={r_x:.4f} "
            f"id_recall={ir_x:.4f} ({el*1000:.0f}ms)")
        candidates.append((nm, len(test) / el, r_x,
                           float(np.mean(st_x.distance_computations)),
                           ir_x, reps_x))

    # --- candidate 1c: block-probed fused scan (scan pruned at the
    # kernel's own contiguous-block granularity — zero gathers) ---
    from clann_tpu.ops.pallas.block_scan import (
        block_scan_search, get_block_layout,
    )
    from clann_tpu.ops.ivf import pallas_scan_plan

    n_blocks = get_block_layout(
        index, pallas_scan_plan(N_TRAIN, K)[0]
    ).n_blocks
    sub_b = min(2000, len(test))
    chosen_b = None
    for B in [b for b in (max(2, n_blocks // 8), n_blocks // 4,
                          n_blocks // 3, n_blocks // 2, (2 * n_blocks) // 3)
              if b >= 2]:
        d_b, i_b, st_b = block_scan_search(index, test[:sub_b], k=K,
                                           n_probe=B)
        r_b, _, _ = recall_values(gt_d[:sub_b], d_b, count=K)
        log(f"block B={B}/{n_blocks}: recall={r_b:.4f} "
            f"dc/q={st_b.distance_computations.mean():.0f}")
        if r_b >= 0.9:
            chosen_b = B
            break
    if chosen_b is not None:
        el, (d_b, i_b, st_b), reps_b = timed(
            lambda: block_scan_search(index, test_d, k=K, n_probe=chosen_b,
                                      batch_q=len(test))
        )
        r_b, _, _ = recall_values(gt_d, d_b, count=K)
        ir_b = id_recall(i_b)
        log(f"block-scan(B={chosen_b}): QPS={len(test)/el:.0f} "
            f"recall={r_b:.4f} id_recall={ir_b:.4f}")
        candidates.append((f"scan-block-B{chosen_b}", len(test) / el, r_b,
                           float(np.mean(st_b.distance_computations)), ir_b,
                           reps_b))
    else:
        log("block-scan cannot reach 0.9 below 2/3 of the blocks; skipping")

    # --- candidate 2: exact dense scan ---
    el, (d_e, i_e, st_e), reps_e = timed(
        lambda: scan_search(index, test_d, k=K, exact=True,
                            batch_q=len(test)), reps=1
    )
    r_e, _, _ = recall_values(gt_d, d_e, count=K)
    ir_e = id_recall(i_e)
    log(f"scan(exact): QPS={len(test)/el:.0f} recall={r_e:.4f} "
        f"id_recall={ir_e:.4f}")
    candidates.append(("scan-exact", len(test) / el, r_e,
                       float(np.mean(st_e.distance_computations)), ir_e,
                       reps_e))

    # --- candidate 3: IVF probing at the smallest passing n_probe ---
    sub = min(2000, len(test))
    chosen = None
    r = 0.0
    for n_probe in [8, 12, 16, 24, 32, 48, 64, 96, 128]:
        if n_probe > n_rows:
            break
        d_, _, st = dense_search(index, test[:sub], k=K, n_probe=n_probe,
                                 batch_size=BATCH)
        r, _, _ = recall_values(gt_d[:sub], d_, count=K)
        log(
            f"n_probe={n_probe}: recall={r:.4f} "
            f"dc/q={st.distance_computations.mean():.0f}"
        )
        if r >= 0.9:
            chosen = n_probe
            break
        if n_probe >= 48 and r < 0.75:
            log("ivf cannot reach 0.9 at reasonable probe depth; skipping")
            break
    if chosen is not None:
        el, (d_i, i_i, st_i), reps_i = timed(
            lambda: dense_search(index, test, k=K, n_probe=chosen,
                                 batch_size=BATCH)
        )
        r_i, _, _ = recall_values(gt_d, d_i, count=K)
        ir_i = id_recall(i_i)
        log(f"ivf(n_probe={chosen}): QPS={len(test)/el:.0f} "
            f"recall={r_i:.4f} id_recall={ir_i:.4f}")
        candidates.append((f"ivf-p{chosen}", len(test) / el, r_i,
                           float(np.mean(st_i.distance_computations)), ir_i,
                           reps_i))

    # headline: fastest candidate meeting the recall bar; the id-recall
    # floor (0.8 < the 0.9 distance bar: distance ties make id matching
    # strictly pessimistic) guards against silent id corruption
    passing = [c for c in candidates if c[2] >= 0.9 and c[4] >= 0.8]
    best = max(passing or candidates, key=lambda c: c[1])
    mode_name, qps, full_recall, dc, idr = best[:5]
    log(f"headline: {mode_name} QPS={qps:.0f} recall={full_recall:.4f} "
        f"id_recall={idr:.4f}")

    # --- secondary: delta-guarantee LSH path (ball-filtered global
    # engine, ops/global_query.py) on a subset. Small sample: the path is
    # gather-rate bound on this (deliberately hard, heavy hash-collision)
    # dataset; blocked gather (gather_block=16) with a wide chunk measured
    # fastest (2.3x the position-at-a-time stream at 200k).
    lsh_sub = min(512, len(test))
    lsh_qps = 0.0
    lsh_recall = 0.0
    lsh_at_09 = None
    try:
        from clann_tpu.core.index import make_global_tables, unsort_hashes
        from clann_tpu.ops.global_query import global_search
        from clann_tpu.ops.prefixmap import build_prefix_directory

        log("attaching global LSH structures for the secondary metric...")
        # the (L, delta) sweep (scripts/sweep_lsh09.py, VERDICT r3 #2) may
        # have chosen a table count other than the build's NUM_TABLES;
        # honor it by re-hashing at that L (same PRNG key -> the sweep's
        # exact tables), mirroring the reference's rebuild(num_tables)
        lsh_tables = NUM_TABLES
        lsh_params = index.hash_params
        lsh_gblock = cfg.gather_block
        lsh_chunk, lsh_fx = 2048, 8
        try:
            with open(os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "LSH_AT_09.json"
            )) as f:
                _chosen = json.load(f).get("chosen") or {}
            lsh_tables = int(_chosen.get("num_tables", NUM_TABLES))
            lsh_gblock = int(_chosen.get("gather_block", cfg.gather_block))
            lsh_chunk = int(_chosen.get("candidate_chunk", lsh_chunk))
            lsh_fx = int(_chosen.get("filter_expand", lsh_fx))
        except (OSError, KeyError, ValueError, TypeError):
            pass
        if lsh_tables != NUM_TABLES:
            from clann_tpu.core.index import _hash_in_blocks
            from clann_tpu.ops.hashing import make_hash_family
            from clann_tpu.ops.sources import make_hash_source

            log(f"re-hashing at swept num_tables={lsh_tables}...")
            family = make_hash_family(
                cfg.hash_family, int(index.vectors.shape[1]),
                num_rotations=cfg.num_rotations,
                estimation_repetitions=cfg.estimation_repetitions,
                estimation_eps=cfg.estimation_eps,
            )
            k_hash, _ = jax.random.split(jax.random.PRNGKey(cfg.seed))
            src = make_hash_source(
                cfg.hash_source, family, lsh_tables, cfg.max_hashbits,
                pool_size=cfg.pool_size,
            ).init(k_hash)
            hashes_T = _hash_in_blocks(src.hash, index.vectors, 8192).T
            lsh_params = src.params
            # probs_table is num_tables-dependent for the tensored
            # source (1 - F^(1/L) folding, collision.tensored_effective
            # _table), so the termination probabilities must be
            # re-derived at the swept L, not inherited from the build
            from clann_tpu.core.index import derive_probs_tables

            _probs, _ = derive_probs_tables(
                family, cfg.replace(num_tables=lsh_tables))
            lsh_probs_table = jnp.asarray(_probs.table)
        else:
            hashes_T = unsort_hashes(index.sorted_hash, index.sorted_idx)
            lsh_probs_table = index.probs_table
        gh, gr = make_global_tables(hashes_T, index.sketches, index.assignment,
                                    pad_to=lsh_gblock)
        n_pts = index.vectors.shape[0]
        gd = build_prefix_directory(
            gh, jnp.asarray(np.asarray([0, n_pts], np.int32)),
            cfg.global_dir_bits,
            int(np.ceil(np.log2(max(2, n_pts)))) + 1, cfg.max_hashbits,
        )
        gdi = int(np.ceil(np.log2(max(2, int(jnp.max(
            gd[:, :, 1:] - gd[:, :, :-1])))))) + 1
        # knob surface measured in GLOBAL_KNOBS{,_FX}.json: fx=8 is the
        # peak (1.24-1.65x over fx=4 depending on delta), fx=12/16 and
        # chunk=4096 regress; dc/q moves ~1%
        lsh_cfg = cfg.replace(candidate_chunk=lsh_chunk,
                              filter_expand=lsh_fx,
                              num_tables=lsh_tables,
                              gather_block=lsh_gblock)
        index = index.replace(
            g_sorted_hash=gh, g_records=gr, g_dir=gd, g_dir_iters=gdi,
            config=lsh_cfg, hash_params=lsh_params,
            probs_table=lsh_probs_table,
        )
        # ONE protocol for every LSH artifact (VERDICT r2 #5 —
        # GLOBAL_KNOBS vs LSH_AT_09 differed 1.4x at delta=0.9 from
        # single-shot timing under relay jitter): 512 queries, batch 256,
        # chunk=2048/fx=8, median of BENCH_LSH_REPS timed runs after one
        # warm-up. The same helper is used by scripts/sweep_lsh09.py and
        # scripts/sweep_global_knobs.py. Default raised 3 -> 7 for round 4
        # (VERDICT r3 #6): round-3 same-knob artifacts still spanned the
        # claimed ~1.4x relay jitter with a median of 3.
        lsh_reps = int(os.environ.get("BENCH_LSH_REPS", 7))

        def timed_lsh(delta):
            global_search(index, test[:256], k=K, delta=delta,
                          batch_size=256)  # warm/compile
            per_rep = []
            out = None
            for _ in range(lsh_reps):
                t0 = time.time()
                out = global_search(
                    index, test[:lsh_sub], k=K, delta=delta, batch_size=256
                )
                per_rep.append(lsh_sub / (time.time() - t0))
            return float(np.median(per_rep)), per_rep, out

        lsh_qps, lsh_reps_09, (d_l, _, st_l) = timed_lsh(DELTA)
        lsh_recall, _, _ = recall_values(gt_d[:lsh_sub], d_l, count=K)
        log(
            f"lsh(global): QPS={lsh_qps:.0f} (reps {lsh_reps_09}) "
            f"recall={lsh_recall:.4f} "
            f"dc/q={st_l.distance_computations.mean():.0f}"
        )

        # --- lsh_at_0.9: the delta-guaranteed engine AT the recall gate.
        # delta=0.9 lands at reference-parity recall ~0.84 (the semantics
        # check above); the north star is QPS at recall@10 >= 0.9, so the
        # guarantee knob delta is raised until the gate is met. The sweep
        # order comes from scripts/sweep_lsh09.py's LSH_AT_09.json when
        # present (its chosen delta is tried first).
        deltas = [0.95, 0.975, 0.99]
        # _chosen was already read above for the knob selection; reuse it
        # so the knobs and the delta priority can never disagree
        if _chosen.get("delta") is not None:
            if _chosen["delta"] in deltas:
                deltas.remove(_chosen["delta"])
            # the (L, delta) surface can pick deltas below 0.95
            # (e.g. 0.9 at L=84); always try the sweep winner first
            deltas.insert(0, _chosen["delta"])
        for d9 in deltas:
            q9, reps9, (d_l9, _, st_l9) = timed_lsh(d9)
            r9, _, _ = recall_values(gt_d[:lsh_sub], d_l9, count=K)
            log(f"lsh(delta={d9}): QPS={q9:.1f} (reps {reps9}) "
                f"recall={r9:.4f} "
                f"dc/q={st_l9.distance_computations.mean():.0f}")
            if r9 >= 0.9:
                lsh_at_09 = {
                    "qps": round(q9, 1), "recall": round(float(r9), 4),
                    "delta": d9,
                    "dc_per_query": round(
                        float(st_l9.distance_computations.mean()), 1),
                    "per_rep_qps": [round(q, 1) for q in reps9],
                    "protocol": (
                        f"{lsh_sub}q batch256 chunk{lsh_chunk} "
                        f"fx{lsh_fx} median of {lsh_reps}"
                    ),
                }
                # same-knob in-class ratio (VERDICT r4 #1): divide by the
                # reference row measured at the SAME (L, delta) — the
                # genuine engine accepts both knobs and was run at the
                # gate config by scripts/ref_baseline.py --L --delta
                try:
                    with open(BASELINE_MEASURED) as f:
                        _rows = json.load(f).get("rows", [])
                    _match = [
                        r_ for r_ in _rows
                        if r_.get("num_tables") == lsh_tables
                        and r_.get("delta") == d9
                    ]
                    if _match:
                        _ref = _match[0]
                        lsh_at_09["reference_same_knob"] = {
                            "qps": _ref["qps"],
                            "recall": round(_ref["recall_mean"], 4),
                            "index_memory_bytes":
                                _ref.get("index_memory_bytes"),
                        }
                        lsh_at_09["vs_reference_same_knob"] = round(
                            q9 / float(_ref["qps"]), 2)
                except (OSError, KeyError, ValueError, ZeroDivisionError):
                    pass
                break
    except Exception as e:  # secondary metric must not sink the bench
        log(f"lsh path failed: {e}")

    base_qps, base_note = baseline_qps()
    print(
        json.dumps(
            {
                "metric": (
                    f"QPS/chip at recall@10>=0.9 on glove-100-angular "
                    f"(synthetic {N_TRAIN}x{DIMS}, 10k queries, v5e-1)"
                ),
                "value": round(qps, 1),
                "unit": "queries/s",
                "vs_baseline": round(qps / base_qps, 2),
                "recall_at_10": round(float(full_recall), 4),
                "mode": mode_name,
                "id_recall_at_10": round(float(idr), 4),
                "candidates": [
                    {"mode": c[0], "qps": round(c[1], 1),
                     "recall": round(float(c[2]), 4),
                     "id_recall": round(float(c[4]), 4),
                     "rep_qps": [round(len(test) / t, 1) for t in c[5]]}
                    for c in candidates
                ],
                "distance_computations_per_query": round(dc, 1),
                "build_seconds": round(build_s, 1),
                "index_bytes": build_mem,
                "lsh_qps": round(lsh_qps, 1),
                "lsh_recall": round(float(lsh_recall), 4),
                "lsh_at_0.9": lsh_at_09,
                "baseline_note": base_note,
            }
        )
    )


if __name__ == "__main__":
    main()
