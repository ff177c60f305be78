"""End-to-end sharded build (parallel/sharded.build_sharded).

Contract: with the same config/seed, building per-shard tables directly
from per-shard points over the mesh must give the SAME search results as
building single-chip and splitting (`shard_index(build_index(...))`) —
same GMM (the mesh GMM is bit-identical), same balanced partition, same
shared hash functions.
"""

import numpy as np
import pytest

from clann_tpu.config import Config
from clann_tpu.core.index import build_index
from clann_tpu.data.synthetic import clustered_unit_vectors, random_unit_vectors
from clann_tpu.parallel.mesh import make_mesh
from clann_tpu.parallel.sharded import (
    build_sharded,
    shard_index,
    sharded_global_search,
    sharded_scan_search,
    sharded_search,
)

N_DEV = 8


@pytest.fixture(scope="module")
def setup():
    cfg = Config(
        num_tables=6, num_clusters_factor=1.0, k=5, delta=0.85,
        hash_family="simhash", candidate_chunk=64, brute_force_threshold=8,
        seed=3, lsh_engine="both", dense_layout=False,
    )
    train = clustered_unit_vectors(700, 16, n_modes=24, seed=0)
    queries = random_unit_vectors(40, 16, seed=1)
    mesh = make_mesh(N_DEV)
    return cfg, train, queries, mesh


def test_matches_shard_of_built_index(setup):
    cfg, train, queries, mesh = setup
    via_single = shard_index(build_index(train, cfg, gmm_mesh=mesh), N_DEV)
    direct = build_sharded(train, cfg, mesh=mesh)
    d1, i1, s1 = sharded_search(via_single, queries, mesh=mesh)
    d2, i2, s2 = sharded_search(direct, queries, mesh=mesh)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(d1, d2, atol=1e-6)
    # shard geometry identical on the real slots (build_sharded rounds
    # n_max up to a gather_block multiple, so pad lengths may differ)
    ga = np.asarray(via_single.global_ids)
    gb = np.asarray(direct.global_ids)
    m = min(ga.shape[1], gb.shape[1])
    np.testing.assert_array_equal(ga[:, :m], gb[:, :m])
    assert (ga[:, m:] < 0).all() and (gb[:, m:] < 0).all()
    np.testing.assert_array_equal(
        np.asarray(via_single.cluster_starts),
        np.asarray(direct.cluster_starts),
    )


def test_global_engine_from_direct_build(setup):
    cfg, train, queries, mesh = setup
    direct = build_sharded(train, cfg, mesh=mesh)
    assert direct.g_records is not None
    d, i, st = sharded_global_search(direct, queries, mesh=mesh)
    assert d.shape == (40, 5)
    assert i.max() < 700 and (i >= -1).all()
    assert np.all(np.diff(np.where(np.isfinite(d), d, 9.0), axis=1) >= -1e-5)
    assert int(np.asarray(st.distance_computations).sum()) > 0


def test_scan_path_and_exactness(setup):
    cfg, train, queries, mesh = setup
    direct = build_sharded(train, cfg, mesh=mesh)
    d, i, _ = sharded_scan_search(direct, queries, k=5, exact=True, mesh=mesh)
    # exact scan over the sharded build == brute force oracle
    tn = train / np.linalg.norm(train, axis=1, keepdims=True)
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    full = 1.0 - qn @ tn.T
    gt = np.sort(full, axis=1)[:, :5]
    np.testing.assert_allclose(np.asarray(d), gt, atol=1e-5)


def test_recall_contract_direct_build(setup):
    cfg, train, queries, mesh = setup
    direct = build_sharded(train, cfg, mesh=mesh)
    d, i, _ = sharded_search(direct, queries, mesh=mesh)
    tn = train / np.linalg.norm(train, axis=1, keepdims=True)
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    gt = np.argsort(1.0 - qn @ tn.T, axis=1)[:, :5]
    rec = np.mean(
        [len(set(i[q]) & set(gt[q])) / 5 for q in range(len(queries))]
    )
    assert rec >= 0.8 * 0.85, rec
