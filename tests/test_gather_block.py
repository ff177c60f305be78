"""Blocked candidate gather (config.gather_block) parity tests.

The blocked layout fetches G consecutive packed records per gather lane
(ops/prefixmap.block_stream / blocked_window); it must score exactly the
same candidate set as the position-at-a-time stream — only the chunk
boundaries (and hence termination check points) may differ, which can only
make the engines do *more* work, never less recall.
"""

import numpy as np
import pytest

from clann_tpu.config import Config
from clann_tpu.core.index import build_index
from clann_tpu.data.synthetic import make_synthetic_dataset
from clann_tpu.metrics.recall import recall_values
from clann_tpu.ops.global_query import global_search
from clann_tpu.ops.query import search as clustered_search


@pytest.fixture(scope="module")
def ds():
    return make_synthetic_dataset(n=5000, d=24, n_queries=60, k_gt=15, seed=3)


def _build(ds, gb):
    cfg = Config(
        num_tables=10, num_clusters_factor=0.5, k=10, delta=0.9,
        dataset_name=ds.name, lsh_engine="both", dense_layout=False,
        gather_block=gb, seed=7,
    )
    return build_index(ds.train, cfg)


@pytest.mark.parametrize("gb", [1, 2, 8])
def test_recall_parity_across_block_sizes(ds, gb):
    """Same build seed -> same tables; recall must match G=1 (chunk
    boundaries differ, so allow a tiny slack from extra/earlier stops)."""
    base = _build(ds, 1)
    blocked = _build(ds, gb)
    for fn in (clustered_search, global_search):
        d0, i0, s0 = fn(base, ds.test, k=10, delta=0.9)
        d1, i1, s1 = fn(blocked, ds.test, k=10, delta=0.9)
        r0, _, _ = recall_values(ds.distances, d0, count=10)
        r1, _, _ = recall_values(ds.distances, d1, count=10)
        assert abs(r0 - r1) < 0.05, (fn.__module__, r0, r1)
        # the same guarantee contract holds at any block size
        assert r1 >= 0.8 * 0.9


def test_records_padded_to_block(ds):
    idx = _build(ds, 8)
    assert idx.slot_records.shape[1] % 8 == 0
    assert idx.g_records.shape[1] % 8 == 0
    # pad slots never appear as candidates: every returned id is real
    d, i, _ = global_search(idx, ds.test[:16], k=10)
    assert i.max() < ds.train.shape[0]


def test_int8_scoring_recall_and_exact_distances(ds):
    """rescore_dtype="int8": quantized in-loop ranking with a 2k buffer
    and exact f32 final rescore — recall within ~2pp of f32, and returned
    distances must be exact f32 (not quantized)."""
    f32 = _build(ds, 8)
    q8 = build_index(
        ds.train,
        f32.config.replace(rescore_dtype="int8"),
    )
    assert q8.vectors_q8 is not None and q8.vectors_q8.dtype == np.int8
    tn = np.asarray(q8.vectors)
    for fn in (clustered_search, global_search):
        d0, i0, _ = fn(f32, ds.test, k=10, delta=0.9)
        d1, i1, _ = fn(q8, ds.test, k=10, delta=0.9)
        r0, _, _ = recall_values(ds.distances, d0, count=10)
        r1, _, _ = recall_values(ds.distances, d1, count=10)
        assert r1 >= r0 - 0.03, (fn.__module__, r0, r1)
        # distances are exact f32 cosine of the returned ids
        qn = ds.test / np.linalg.norm(ds.test, axis=1, keepdims=True)
        got = 1.0 - np.einsum(
            "qd,qkd->qk", qn, tn[np.clip(i1, 0, None)]
        )
        mask = i1 >= 0
        # 2*(1-sim) with sim=(dot+1)/2 is exactly the cosine distance 1-dot
        np.testing.assert_allclose(d1[mask], got[mask], rtol=0, atol=2e-5)


def test_invalid_gather_block_rejected():
    from clann_tpu.errors import ConfigError

    with pytest.raises(ConfigError):
        Config(gather_block=3)
    with pytest.raises(ConfigError):
        Config(gather_block=0)
