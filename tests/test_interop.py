"""Tests for the native codec and reference-format interop.

Models the reference's serialization round-trip contract
(collection_test.hpp:291-336: ser(de(ser(x))) == ser(x)) at the byte-stream
level, plus full .h5 round trips through the native codec.
"""

import numpy as np
import pytest

from clann_tpu.config import Config
from clann_tpu.core.index import build_index
from clann_tpu.io.interop import (
    load_reference_h5,
    parse_reference_config,
    save_reference_h5,
)
from clann_tpu.io.refcodec import (
    f32_to_q15,
    parse_reference_stream,
    q15_to_f32,
    write_reference_stream,
)
from clann_tpu.metrics.recall import recall_by_ids
from clann_tpu.ops.distances import brute_force_topk
from clann_tpu.ops.query import search


class TestQ15:
    def test_round_trip(self):
        # reference: format_test.hpp exact Q15 conversions
        x = np.asarray([0.0, 0.5, -0.5, 0.999, -1.0], np.float32)
        q = f32_to_q15(x)
        assert q.dtype == np.int16
        np.testing.assert_allclose(q15_to_f32(q), x, atol=1.0 / 32768)

    def test_clamping(self):
        assert f32_to_q15(np.asarray([2.0]))[0] == 32767
        assert f32_to_q15(np.asarray([-2.0]))[0] == -32768


class TestStreamRoundTrip:
    def test_byte_stability(self):
        """ser(parse(ser(x))) produces identical arrays (the codec analog
        of collection_test.hpp:291-336)."""
        rng = np.random.default_rng(1)
        n, d, storage = 40, 20, 32
        vec = f32_to_q15(rng.standard_normal((n, storage)).astype(np.float32) * 0.1)
        skp = f32_to_q15(rng.standard_normal((2048, storage)).astype(np.float32) * 0.1)
        sk = rng.integers(0, 2**63, (n, 32), dtype=np.uint64)
        hp = f32_to_q15(rng.standard_normal((48, storage)).astype(np.float32) * 0.1)
        hashes = [np.sort(rng.integers(0, 1 << 24, n).astype(np.uint32)) for _ in range(2)]
        ids = [rng.permutation(n).astype(np.uint32) for _ in range(2)]

        buf1 = write_reference_stream(
            vec, d, skp, sk, hp, 2, 24, 0, ids, hashes, n
        )
        parsed = parse_reference_stream(buf1)
        buf2 = write_reference_stream(
            parsed.vectors_q15, parsed.dims, parsed.sketch_planes,
            parsed.sketches, parsed.hash_planes, parsed.num_hashers,
            parsed.functions_per_hasher, parsed.bits_to_cut,
            parsed.map_indices, parsed.map_hashes, parsed.last_rebuild,
        )
        assert buf1 == buf2

    def test_chunked_round_trip(self):
        """use_chunks=true layout (collection.hpp:178-209): main stream
        omits the PrefixMaps; each arrives as its own chunk stream."""
        from clann_tpu.errors import SerializeError

        rng = np.random.default_rng(3)
        n, d, storage = 40, 20, 32
        vec = f32_to_q15(rng.standard_normal((n, storage)).astype(np.float32) * 0.1)
        skp = f32_to_q15(rng.standard_normal((2048, storage)).astype(np.float32) * 0.1)
        sk = rng.integers(0, 2**63, (n, 32), dtype=np.uint64)
        hp = f32_to_q15(rng.standard_normal((48, storage)).astype(np.float32) * 0.1)
        hashes = [np.sort(rng.integers(0, 1 << 24, n).astype(np.uint32)) for _ in range(3)]
        ids = [rng.permutation(n).astype(np.uint32) for _ in range(3)]
        args = (vec, d, skp, sk, hp, 2, 24, 0, ids, hashes, n)

        flat = write_reference_stream(*args)
        main, chunks = write_reference_stream(*args, use_chunks=True)
        assert len(chunks) == 3
        # chunked main stream drops the inline maps
        assert len(main) < len(flat)

        parsed = parse_reference_stream(main, chunks=chunks)
        for m in range(3):
            np.testing.assert_array_equal(parsed.map_hashes[m], hashes[m])
            np.testing.assert_array_equal(parsed.map_indices[m], ids[m])
        # re-serializing flat reproduces the non-chunked bytes exactly
        re_flat = write_reference_stream(
            parsed.vectors_q15, parsed.dims, parsed.sketch_planes,
            parsed.sketches, parsed.hash_planes, parsed.num_hashers,
            parsed.functions_per_hasher, parsed.bits_to_cut,
            parsed.map_indices, parsed.map_hashes, parsed.last_rebuild,
        )
        assert re_flat == flat

        with pytest.raises(SerializeError):
            parse_reference_stream(main, chunks=chunks[:2])  # missing chunk
        with pytest.raises(SerializeError):
            parse_reference_stream(flat, chunks=chunks)  # spurious chunks

    def test_sentinel_padding_stripped(self):
        rng = np.random.default_rng(2)
        n = 30
        vec = f32_to_q15(rng.standard_normal((n, 16)).astype(np.float32) * 0.1)
        skp = np.zeros((2048, 16), np.int16)
        sk = np.zeros((n, 32), np.uint64)
        hp = np.zeros((24, 16), np.int16)
        hashes = [np.sort(rng.integers(0, 1 << 24, n).astype(np.uint32))]
        ids = [np.arange(n, dtype=np.uint32)]
        buf = write_reference_stream(vec, 16, skp, sk, hp, 1, 24, 0, ids, hashes, n)
        parsed = parse_reference_stream(buf)
        # parse strips the injected sentinels back out
        assert len(parsed.map_hashes[0]) == n
        np.testing.assert_array_equal(parsed.map_hashes[0], hashes[0])
        assert parsed.map_hashes[0].max() < (1 << 24)


class TestFaithfulImport:
    @pytest.mark.parametrize("fam", ["simhash", "fht_cross_polytope"])
    def test_bit_faithful_round_trip(self, fam, tmp_path):
        """Default import takes tables/sketches/functions from the blobs
        bit-for-bit; queries hash with each cluster's own functions and
        reproduce the stored table hashes exactly."""
        import jax

        from clann_tpu.data.synthetic import make_synthetic_dataset

        ds = make_synthetic_dataset(n=3000, d=25, n_queries=40, k_gt=15, seed=5)
        cfg = Config(
            num_tables=8, num_clusters_factor=0.35, k=10, delta=0.9,
            dataset_name=ds.name, hash_family=fam, dense_layout=False,
        )
        idx = build_index(ds.train, cfg)
        p = str(tmp_path / "ref.h5")
        save_reference_h5(idx, p)
        imp = load_reference_h5(p, data=ds.train)

        assert imp.pc_hash_params is not None
        brute = np.asarray(idx.brute)
        starts = np.asarray(idx.cluster_starts)
        src, _ = imp.rebuild_objects()
        for c in range(len(brute)):
            if brute[c]:
                continue
            lo, hi = int(starts[c]), int(starts[c + 1])
            # tables + sketches bit-identical per non-brute cluster
            np.testing.assert_array_equal(
                np.asarray(idx.sorted_hash)[:, lo:hi],
                np.asarray(imp.sorted_hash)[:, lo:hi],
            )
            np.testing.assert_array_equal(
                np.asarray(idx.sorted_idx)[:, lo:hi],
                np.asarray(imp.sorted_idx)[:, lo:hi],
            )
            # query hashing with cluster c's imported functions reproduces
            # the stored hashes for that cluster's own points
            pts = np.asarray(imp.sorted_idx)[0, lo:hi]
            params_c = jax.tree_util.tree_map(
                lambda a: a[c], imp.pc_hash_params
            )
            qh = np.asarray(src.hash_with(params_c, imp.vectors[pts]))
            match = (
                qh[:, 0] == np.asarray(imp.sorted_hash)[0, lo:hi]
            ).mean()
            assert match > 0.99, (c, match)

        # faithful search produces sane results at the delta contract
        d1, i1, _ = search(imp, ds.test, k=10, delta=0.9)
        r1 = recall_by_ids(ds.neighbors, i1, count=10)
        assert r1 >= 0.7 * 0.9

    @pytest.mark.parametrize("fam", ["simhash", "fht_cross_polytope"])
    def test_reexport_byte_stable(self, fam, tmp_path):
        """export -> faithful import -> export reproduces every blob
        byte-for-byte (the file-level analog of the reference's
        ser(de(ser(x))) == ser(x), collection_test.hpp:291-336)."""
        import h5py

        from clann_tpu.data.synthetic import make_synthetic_dataset

        ds = make_synthetic_dataset(n=2500, d=25, n_queries=10, k_gt=10, seed=8)
        cfg = Config(
            num_tables=6, num_clusters_factor=0.3, k=10, delta=0.9,
            dataset_name=ds.name, hash_family=fam, dense_layout=False,
        )
        idx = build_index(ds.train, cfg)
        p1 = str(tmp_path / "a.h5")
        p2 = str(tmp_path / "b.h5")
        save_reference_h5(idx, p1)
        imp = load_reference_h5(p1, data=ds.train)
        save_reference_h5(imp, p2)
        with h5py.File(p1) as f1, h5py.File(p2) as f2:
            assert sorted(f1.keys()) == sorted(f2.keys())
            for name in f1.keys():
                if not name.startswith("index_"):
                    continue
                b1 = np.asarray(f1[name], np.uint8).tobytes()
                b2 = np.asarray(f2[name], np.uint8).tobytes()
                assert b1 == b2, f"{name} differs after round trip"

    def test_rebuild_mode(self, tmp_path):
        from clann_tpu.data.synthetic import make_synthetic_dataset

        ds = make_synthetic_dataset(n=2000, d=16, n_queries=20, k_gt=15, seed=6)
        cfg = Config(
            num_tables=6, num_clusters_factor=0.3, k=10, delta=0.9,
            dataset_name=ds.name, dense_layout=False,
        )
        idx = build_index(ds.train, cfg)
        p = str(tmp_path / "ref.h5")
        save_reference_h5(idx, p)
        imp = load_reference_h5(p, data=ds.train, rebuild=True)
        assert imp.pc_hash_params is None  # shared functions, rebuilt
        d1, i1, _ = search(imp, ds.test, k=10, delta=0.9)
        assert d1.shape == (20, 10)


class TestReferenceConfig:
    def test_parse_rust_serde_json(self):
        cfg = parse_reference_config(
            '{"num_tables": 84, "num_clusters_factor": 0.4, "k": 10, '
            '"delta": 0.9, "dataset_name": "glove-25-angular", '
            '"metrics_output": "None"}'
        )
        assert cfg.num_tables == 84
        assert cfg.num_clusters_factor == 0.4
        assert cfg.dataset_name == "glove-25-angular"


class TestH5RoundTrip:
    def test_export_import_preserves_search(self, small_angular_dataset, tmp_path):
        ds = small_angular_dataset
        cfg = Config(
            num_tables=10, num_clusters_factor=0.25, k=10, delta=0.9,
            dataset_name="interop-test", hash_family="simhash",
            candidate_chunk=128, seed=13,
        )
        index = build_index(ds.train, cfg)
        path = str(tmp_path / "ref_format.h5")
        save_reference_h5(index, path)

        loaded = load_reference_h5(path, data=ds.train)
        assert loaded.n == index.n
        np.testing.assert_allclose(
            np.asarray(loaded.vectors), np.asarray(index.vectors), atol=2e-4
        )
        # blob-only load (no dataset) works when no cluster is brute-force;
        # with brute clusters present it must fail with a clear error
        from clann_tpu.errors import SerializeError
        if bool(np.asarray(index.brute).any()):
            with pytest.raises(SerializeError):
                load_reference_h5(path)
        else:
            loaded2 = load_reference_h5(path)
            # Q15 round trip: vectors within 1/32768 after renormalization
            np.testing.assert_allclose(
                np.asarray(loaded2.vectors), np.asarray(index.vectors),
                atol=2e-3,
            )
        # searching the reloaded index preserves recall
        gt_d, gt_i = brute_force_topk(ds.train, ds.test[:40], k=10, metric="angular")
        _, ids, _ = search(loaded, ds.test[:40], k=10, delta=0.9)
        r = recall_by_ids(np.asarray(gt_i), ids, count=10)
        assert r >= 0.6, r

    def test_export_blob_structure(self, small_angular_dataset, tmp_path):
        import h5py

        ds = small_angular_dataset
        cfg = Config(
            num_tables=6, num_clusters_factor=0.25, k=5,
            hash_family="simhash", seed=3,
        )
        index = build_index(ds.train, cfg)
        path = str(tmp_path / "ref2.h5")
        save_reference_h5(index, path)
        import json

        with h5py.File(path, "r") as f:
            assert "config" in f and "clusters" in f
            clusters = json.loads(f["clusters"][()].decode())
            brute = np.asarray(index.brute)
            for c in clusters:
                # reference ClusterCenter field shape (index.rs:27-35)
                assert set(c) == {
                    "idx", "center_idx", "radius", "assignment",
                    "brute_force", "memory_used",
                }
                if not brute[c["idx"]]:
                    assert f"index_{c['idx']}" in f
            # every point assigned exactly once
            all_pts = sorted(p for c in clusters for p in c["assignment"])
            assert all_pts == list(range(ds.train.shape[0]))

    def test_cp_family_round_trip(self, small_angular_dataset, tmp_path):
        ds = small_angular_dataset
        cfg = Config(num_tables=4, num_clusters_factor=0.2, k=5,
                     hash_family="fht_cross_polytope", seed=1,
                     estimation_repetitions=200, estimation_eps=2e-2)
        index = build_index(ds.train[:500], cfg)
        path = str(tmp_path / "cp.h5")
        save_reference_h5(index, path)
        loaded = load_reference_h5(path, data=ds.train[:500])
        assert loaded.n == 500
        _, ids, _ = search(loaded, ds.test[:20], k=5, delta=0.8)
        gt_d, gt_i = brute_force_topk(
            ds.train[:500], ds.test[:20], k=5, metric="angular"
        )
        assert recall_by_ids(np.asarray(gt_i), ids, count=5) >= 0.5
