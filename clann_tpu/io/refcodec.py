"""ctypes bindings for the native reference-format codec.

Python side of clann_tpu/native/codec.cpp — the first-class native
equivalent of the reference FFI shim (libpuffinn-ffi/c_binder.{h,cpp},
SURVEY.md §2.2): translates between the reference's versioned binary index
stream and numpy arrays. Builds the shared library on first use (g++ is in
the base image).

Interop surface:
- `parse_reference_stream(buf)` — read an index blob produced by the
  Rust/C++ reference (the "index_{i}" HDF5 datasets, c_binder.cpp:106-146)
  into arrays: Q15 vectors, sketches, hash-function parameters, per-table
  sorted (hash, index) arrays.
- `write_reference_stream(...)` — emit a stream the reference can load
  (SimHash-family / independent-source layout).
- Q15 <-> f32 conversion matching format/unit_vector.hpp:26-45.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from clann_tpu.errors import SerializeError

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libclann_codec.so")

FAMILY_SIMHASH = 0
FAMILY_FHT_CROSS_POLYTOPE = 1

_lib: Optional[ctypes.CDLL] = None


def q15_to_f32(x: np.ndarray) -> np.ndarray:
    """Fixed-point Q15 -> float (reference: unit_vector.hpp:39-45)."""
    return x.astype(np.float32) / 32768.0


def f32_to_q15(x: np.ndarray) -> np.ndarray:
    """float -> Q15 with clamping (reference: unit_vector.hpp:26-37)."""
    return np.clip(np.round(x * 32768.0), -32768, 32767).astype(np.int16)


def _build_library() -> None:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=True,
            text=True,
        )
    except subprocess.CalledProcessError as e:
        raise SerializeError(f"native codec build failed:\n{e.stderr}") from e


def load_library() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        _build_library()
    lib = ctypes.CDLL(_LIB_PATH)

    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.clann_ref_parse.restype = ctypes.c_void_p
    lib.clann_ref_parse.argtypes = [u8p, ctypes.c_uint64, ctypes.c_int32]
    lib.clann_ref_parse_chunk.restype = ctypes.c_int32
    lib.clann_ref_parse_chunk.argtypes = [ctypes.c_void_p, u8p, ctypes.c_uint64]
    lib.clann_ref_is_chunked.restype = ctypes.c_uint32
    lib.clann_ref_is_chunked.argtypes = [ctypes.c_void_p]
    lib.clann_ref_expected_maps.restype = ctypes.c_uint64
    lib.clann_ref_expected_maps.argtypes = [ctypes.c_void_p]
    lib.clann_ref_free.argtypes = [ctypes.c_void_p]
    lib.clann_ref_error.restype = ctypes.c_char_p
    lib.clann_ref_error.argtypes = [ctypes.c_void_p]
    for name in (
        "clann_ref_dims",
        "clann_ref_storage_len",
        "clann_ref_num_points",
        "clann_ref_num_maps",
        "clann_ref_last_rebuild",
        "clann_ref_num_sketch_fns",
        "clann_ref_num_hash_fns",
    ):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_uint32
        fn.argtypes = [ctypes.c_void_p]
    lib.clann_ref_data.restype = ctypes.POINTER(ctypes.c_int16)
    lib.clann_ref_data.argtypes = [ctypes.c_void_p]
    lib.clann_ref_num_sketches.restype = ctypes.c_uint64
    lib.clann_ref_num_sketches.argtypes = [ctypes.c_void_p]
    lib.clann_ref_sketches.restype = ctypes.POINTER(ctypes.c_uint64)
    lib.clann_ref_sketches.argtypes = [ctypes.c_void_p]
    lib.clann_ref_map_len.restype = ctypes.c_uint64
    lib.clann_ref_map_len.argtypes = [ctypes.c_void_p, ctypes.c_uint32]
    lib.clann_ref_map_indices.restype = ctypes.POINTER(ctypes.c_uint32)
    lib.clann_ref_map_indices.argtypes = [ctypes.c_void_p, ctypes.c_uint32]
    lib.clann_ref_map_hashes.restype = ctypes.POINTER(ctypes.c_uint32)
    lib.clann_ref_map_hashes.argtypes = [ctypes.c_void_p, ctypes.c_uint32]
    lib.clann_ref_map_hash_length.restype = ctypes.c_uint32
    lib.clann_ref_map_hash_length.argtypes = [ctypes.c_void_p, ctypes.c_uint32]
    lib.clann_ref_sketch_fn_plane.restype = ctypes.POINTER(ctypes.c_int16)
    lib.clann_ref_sketch_fn_plane.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.POINTER(ctypes.c_uint32),
    ]
    lib.clann_ref_hash_fn_plane.restype = ctypes.POINTER(ctypes.c_int16)
    lib.clann_ref_hash_fn_plane.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.POINTER(ctypes.c_uint32),
    ]
    lib.clann_ref_hash_fn_signs.restype = ctypes.POINTER(ctypes.c_int8)
    lib.clann_ref_hash_fn_signs.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint32),
    ]
    lib.clann_ref_source_info.argtypes = [
        ctypes.c_void_p] + [ctypes.POINTER(ctypes.c_uint32)] * 4
    lib.clann_ref_est_info.restype = ctypes.c_uint32
    lib.clann_ref_est_info.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint32),
    ]
    lib.clann_ref_est_data.restype = ctypes.POINTER(ctypes.c_float)
    lib.clann_ref_est_data.argtypes = [ctypes.c_void_p]
    lib.clann_ref_num_rotations.restype = ctypes.c_int32
    lib.clann_ref_num_rotations.argtypes = [ctypes.c_void_p]

    lib.clann_ref_write_simhash.restype = ctypes.c_void_p
    lib.clann_ref_write_simhash.argtypes = [
        ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_int16),
        ctypes.c_uint32, ctypes.POINTER(ctypes.c_int16),
        ctypes.c_uint64, ctypes.POINTER(ctypes.c_uint64),
        ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32,
        ctypes.c_uint32, ctypes.POINTER(ctypes.c_int16),
        ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32,
        ctypes.c_uint32, ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32),
        ctypes.c_uint32, ctypes.c_uint32,
    ]
    lib.clann_ref_write_fhtcp.restype = ctypes.c_void_p
    lib.clann_ref_write_fhtcp.argtypes = [
        ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_int16),
        ctypes.c_uint32, ctypes.POINTER(ctypes.c_int16),
        ctypes.c_uint64, ctypes.POINTER(ctypes.c_uint64),
        ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32,
        ctypes.c_uint32, ctypes.c_int32, ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_int8),
        ctypes.c_uint32, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.c_uint32, ctypes.c_uint32,
        ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32,
        ctypes.c_uint32, ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32),
        ctypes.c_uint32, ctypes.c_uint32,
    ]
    lib.clann_ref_write_chunk.restype = ctypes.c_void_p
    lib.clann_ref_write_chunk.argtypes = [
        ctypes.c_uint64, ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint32),
    ]
    lib.clann_ref_out_data.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.clann_ref_out_data.argtypes = [ctypes.c_void_p]
    lib.clann_ref_out_len.restype = ctypes.c_uint64
    lib.clann_ref_out_len.argtypes = [ctypes.c_void_p]
    lib.clann_ref_out_free.argtypes = [ctypes.c_void_p]

    _lib = lib
    return lib


class ReferenceIndexData:
    """Arrays extracted from a reference PUFFINN index stream."""

    def __init__(self):
        self.dims = 0
        self.storage_len = 0
        self.vectors_q15: Optional[np.ndarray] = None  # (n, storage_len) i16
        self.sketches: Optional[np.ndarray] = None  # (n, 32) u64
        self.map_indices: list = []  # per table (len,) u32
        self.map_hashes: list = []  # per table (len,) u32
        self.hash_lengths: list = []
        self.sketch_planes: Optional[np.ndarray] = None  # (F, storage_len) i16
        self.hash_planes: Optional[np.ndarray] = None  # (F, storage_len) i16
        self.fht_signs: Optional[np.ndarray] = None  # (F, R, 2^log_dims) i8
        # FHT-CP Monte-Carlo collision table as stored in the stream
        # (CrossPolytopeCollisionEstimates, crosspolytope.hpp:10-119) —
        # kept so re-exports can pass the reference's own tabulation back
        # through byte-identically
        self.estimates: Optional[np.ndarray] = None  # (rows, cols) f32
        self.est_reps = 0
        self.est_eps = 0.0
        self.num_rotations = 3
        self.num_hashers = 0
        self.functions_per_hasher = 0
        self.bits_to_cut = 0
        self.last_rebuild = 0

    @property
    def vectors(self) -> np.ndarray:
        return q15_to_f32(self.vectors_q15)


def parse_reference_stream(
    buf: bytes, family: int = FAMILY_SIMHASH, chunks: Optional[list] = None
) -> ReferenceIndexData:
    """Parse a reference index byte stream into arrays.

    `chunks`: per-table PrefixMap chunk streams for an index serialized with
    use_chunks=true (collection.hpp:178-209; upstream pickles store these as
    separate byte strings and replay them through deserialize_chunk).
    """
    lib = load_library()
    arr = np.frombuffer(bytearray(buf), dtype=np.uint8)
    h = lib.clann_ref_parse(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(buf), family
    )
    try:
        err = lib.clann_ref_error(h)
        if err:
            raise SerializeError(f"reference stream parse failed: {err.decode()}")
        if lib.clann_ref_is_chunked(h):
            expected = lib.clann_ref_expected_maps(h)
            got = len(chunks or [])
            if got != expected:
                raise SerializeError(
                    f"chunked stream expects {expected} map chunks, got {got}"
                )
            for c in chunks or []:
                carr = np.frombuffer(bytearray(c), dtype=np.uint8)
                ok = lib.clann_ref_parse_chunk(
                    h, carr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                    len(c),
                )
                if not ok:
                    err = lib.clann_ref_error(h)
                    raise SerializeError(
                        "chunk parse failed: "
                        f"{err.decode() if err else 'unknown'}"
                    )
        elif chunks:
            raise SerializeError("chunks supplied for a non-chunked stream")
        out = ReferenceIndexData()
        out.dims = lib.clann_ref_dims(h)
        out.storage_len = lib.clann_ref_storage_len(h)
        n = lib.clann_ref_num_points(h)
        out.vectors_q15 = np.ctypeslib.as_array(
            lib.clann_ref_data(h), shape=(n, out.storage_len)
        ).copy()
        n_sk = lib.clann_ref_num_sketches(h)
        if n_sk:
            out.sketches = np.ctypeslib.as_array(
                lib.clann_ref_sketches(h), shape=(n_sk // 32, 32)
            ).copy()
        for m in range(lib.clann_ref_num_maps(h)):
            ln = lib.clann_ref_map_len(h, m)
            out.map_indices.append(
                np.ctypeslib.as_array(lib.clann_ref_map_indices(h, m), shape=(ln,)).copy()
            )
            out.map_hashes.append(
                np.ctypeslib.as_array(lib.clann_ref_map_hashes(h, m), shape=(ln,)).copy()
            )
            out.hash_lengths.append(lib.clann_ref_map_hash_length(h, m))

        def planes(count_fn, plane_fn):
            count = count_fn(h)
            rows = []
            for i in range(count):
                ln = ctypes.c_uint32()
                ptr = plane_fn(h, i, ctypes.byref(ln))
                rows.append(np.ctypeslib.as_array(ptr, shape=(ln.value,)).copy())
            return np.stack(rows) if rows else None

        out.sketch_planes = planes(
            lib.clann_ref_num_sketch_fns, lib.clann_ref_sketch_fn_plane
        )
        if family == FAMILY_SIMHASH:
            out.hash_planes = planes(
                lib.clann_ref_num_hash_fns, lib.clann_ref_hash_fn_plane
            )
        else:
            rows = []
            for fi in range(lib.clann_ref_num_hash_fns(h)):
                log_dims = ctypes.c_int32()
                rotations = ctypes.c_uint32()
                ptr = lib.clann_ref_hash_fn_signs(
                    h, fi, ctypes.byref(log_dims), ctypes.byref(rotations)
                )
                rows.append(
                    np.ctypeslib.as_array(
                        ptr,
                        shape=(rotations.value, 1 << log_dims.value),
                    ).copy()
                )
            out.fht_signs = np.stack(rows) if rows else None
            reps = ctypes.c_uint32()
            eps = ctypes.c_float()
            er = ctypes.c_uint32()
            ec = ctypes.c_uint32()
            if lib.clann_ref_est_info(
                h, ctypes.byref(reps), ctypes.byref(eps), ctypes.byref(er),
                ctypes.byref(ec),
            ):
                out.est_reps = reps.value
                out.est_eps = eps.value
                out.estimates = np.ctypeslib.as_array(
                    lib.clann_ref_est_data(h), shape=(er.value, ec.value)
                ).copy()
            out.num_rotations = lib.clann_ref_num_rotations(h)
        nh = ctypes.c_uint32()
        fph = ctypes.c_uint32()
        bpf = ctypes.c_uint32()
        cut = ctypes.c_uint32()
        lib.clann_ref_source_info(
            h, ctypes.byref(nh), ctypes.byref(fph), ctypes.byref(bpf),
            ctypes.byref(cut),
        )
        out.num_hashers = nh.value
        out.functions_per_hasher = fph.value
        out.bits_to_cut = cut.value
        out.last_rebuild = lib.clann_ref_last_rebuild(h)
        return out
    finally:
        lib.clann_ref_free(h)


def write_reference_stream(
    vectors_q15: np.ndarray,
    dims: int,
    sketch_planes: np.ndarray,
    sketches: np.ndarray,
    hash_planes: np.ndarray,
    num_hashers: int,
    functions_per_hasher: int,
    bits_to_cut: int,
    map_indices: list,
    map_hashes: list,
    last_rebuild: int,
    use_chunks: bool = False,
):
    """Emit a reference-loadable SimHash/independent index stream.

    With use_chunks=True, returns (main_stream, [chunk_bytes]) following the
    reference's chunked layout (collection.hpp:184-209): the main stream
    records num_maps + use_chunks=1 but omits the PrefixMaps, which are
    emitted one per chunk.
    """
    lib = load_library()
    vec = np.ascontiguousarray(vectors_q15, dtype=np.int16)
    n, storage_len = vec.shape
    skp = np.ascontiguousarray(sketch_planes, dtype=np.int16)
    sk = np.ascontiguousarray(sketches, dtype=np.uint64).reshape(-1)
    hp = np.ascontiguousarray(hash_planes, dtype=np.int16)
    lens = np.asarray([len(m) for m in map_indices], dtype=np.uint64)
    mi = np.ascontiguousarray(
        np.concatenate(map_indices) if map_indices else np.zeros(0), dtype=np.uint32
    )
    mh = np.ascontiguousarray(
        np.concatenate(map_hashes) if map_hashes else np.zeros(0), dtype=np.uint32
    )
    i16p = ctypes.POINTER(ctypes.c_int16)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    h = lib.clann_ref_write_simhash(
        dims, storage_len, n, vec.ctypes.data_as(i16p),
        skp.shape[0], skp.ctypes.data_as(i16p),
        sk.size, sk.ctypes.data_as(u64p),
        32, sketch_planes.shape[0] // 32, 0,
        hp.shape[0], hp.ctypes.data_as(i16p),
        num_hashers, functions_per_hasher, bits_to_cut,
        len(map_indices), lens.ctypes.data_as(u64p),
        mi.ctypes.data_as(u32p), mh.ctypes.data_as(u32p),
        last_rebuild, 1 if use_chunks else 0,
    )
    try:
        ln = lib.clann_ref_out_len(h)
        data = np.ctypeslib.as_array(lib.clann_ref_out_data(h), shape=(ln,))
        main = bytes(data)
    finally:
        lib.clann_ref_out_free(h)
    if not use_chunks:
        return main
    return main, _write_chunks(lib, map_indices, map_hashes)


def _write_chunks(lib, map_indices: list, map_hashes: list) -> list:
    """One serialized PrefixMap chunk per table (collection.hpp:171-176)."""
    u32p = ctypes.POINTER(ctypes.c_uint32)
    chunks = []
    for mi, mh in zip(map_indices, map_hashes):
        mi = np.ascontiguousarray(mi, dtype=np.uint32)
        mh = np.ascontiguousarray(mh, dtype=np.uint32)
        h = lib.clann_ref_write_chunk(
            len(mi), mi.ctypes.data_as(u32p), mh.ctypes.data_as(u32p)
        )
        try:
            ln = lib.clann_ref_out_len(h)
            chunks.append(bytes(
                np.ctypeslib.as_array(lib.clann_ref_out_data(h), shape=(ln,))
            ))
        finally:
            lib.clann_ref_out_free(h)
    return chunks


def write_reference_stream_fhtcp(
    vectors_q15: np.ndarray,
    dims: int,
    sketch_planes: np.ndarray,
    sketches: np.ndarray,
    signs: np.ndarray,  # (F, R, 2^log_dims) +-1 int8
    estimates: np.ndarray,  # (log_dims+2, n_buckets) f32
    est_reps: int,
    est_eps: float,
    num_hashers: int,
    functions_per_hasher: int,
    bits_to_cut: int,
    map_indices: list,
    map_hashes: list,
    last_rebuild: int,
    use_chunks: bool = False,
):
    """Emit a reference-loadable FHT-cross-polytope/independent stream
    (the reference cosine default, similarity_measure/cosine.hpp:16).
    With use_chunks=True returns (main_stream, [chunk_bytes])."""
    lib = load_library()
    vec = np.ascontiguousarray(vectors_q15, dtype=np.int16)
    n, storage_len = vec.shape
    skp = np.ascontiguousarray(sketch_planes, dtype=np.int16)
    sk = np.ascontiguousarray(sketches, dtype=np.uint64).reshape(-1)
    sg = np.ascontiguousarray(signs, dtype=np.int8)
    F, R, dp = sg.shape
    log_dims = int(np.log2(dp))
    est = np.ascontiguousarray(estimates, dtype=np.float32)
    lens = np.asarray([len(m) for m in map_indices], dtype=np.uint64)
    mi = np.ascontiguousarray(
        np.concatenate(map_indices) if map_indices else np.zeros(0), dtype=np.uint32
    )
    mh = np.ascontiguousarray(
        np.concatenate(map_hashes) if map_hashes else np.zeros(0), dtype=np.uint32
    )
    i8p = ctypes.POINTER(ctypes.c_int8)
    i16p = ctypes.POINTER(ctypes.c_int16)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    f32p = ctypes.POINTER(ctypes.c_float)
    h = lib.clann_ref_write_fhtcp(
        dims, storage_len, n, vec.ctypes.data_as(i16p),
        skp.shape[0], skp.ctypes.data_as(i16p),
        sk.size, sk.ctypes.data_as(u64p),
        32, sketch_planes.shape[0] // 32, 0,
        F, log_dims, R, sg.ctypes.data_as(i8p),
        est_reps, est_eps,
        est.ctypes.data_as(f32p), est.shape[0], est.shape[1],
        num_hashers, functions_per_hasher, bits_to_cut,
        len(map_indices), lens.ctypes.data_as(u64p),
        mi.ctypes.data_as(u32p), mh.ctypes.data_as(u32p),
        last_rebuild, 1 if use_chunks else 0,
    )
    try:
        ln = lib.clann_ref_out_len(h)
        data = np.ctypeslib.as_array(lib.clann_ref_out_data(h), shape=(ln,))
        main = bytes(data)
    finally:
        lib.clann_ref_out_free(h)
    if not use_chunks:
        return main
    return main, _write_chunks(lib, map_indices, map_hashes)
