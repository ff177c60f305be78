"""Hash sources: combine family functions into L concatenated table hashes.

TPU-native equivalents of the reference hash sources:
- Independent (reference: hash_source/independent.hpp:19-119): L tables x
  `functions_per_hasher` iid functions, bits concatenated then cut to
  `num_bits`. The default source (collection.hpp:130-131).
- Pooled (reference: hash_source/pool.hpp:24-183): a shared pool of
  functions; each table samples indices into the pool. Cheaper hashing,
  weaker independence; failure probability approximated as independent.
- Tensored (reference: hash_source/tensor.hpp:19-163): two half-length hash
  sets of size ~sqrt(T) combined pairwise by bit interleaving.

All sources expose:
  hash(x: (n, d)) -> (n, L) uint32      # one batched call, all tables
  probs: HashSourceProbs                # collision/failure probabilities
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from clann_tpu.ops.collision import HashSourceProbs


def _combine_bits(h: jnp.ndarray, fph: int, bpf: int, bits_to_cut: int) -> jnp.ndarray:
    """Concatenate fph per-function hashes (bpf bits each) along last axis.

    h: (..., fph) uint32 -> (...) uint32, matching the accumulate-shift loop
    at independent.hpp:73-85 (res = (res << bpf) | h_i; res >>= cut).
    """
    res = jnp.zeros(h.shape[:-1], jnp.uint32)
    for i in range(fph):
        res = (res << np.uint32(bpf)) | h[..., i]
    return res >> np.uint32(bits_to_cut)


@dataclasses.dataclass
class IndependentHashSource:
    """iid functions per table (reference: hash_source/independent.hpp)."""

    family: object
    num_hashers: int
    num_bits: int

    def __post_init__(self):
        bpf = self.family.bits_per_function
        self.functions_per_hasher = (self.num_bits + bpf - 1) // bpf
        self.bits_to_cut = bpf * self.functions_per_hasher - self.num_bits
        self.params = None
        self.probs = HashSourceProbs(self.family, self.num_bits)

    def init(self, key: jax.Array) -> "IndependentHashSource":
        self.params = self.family.sample(
            key, self.num_hashers * self.functions_per_hasher
        )
        return self

    def hash(self, x: jnp.ndarray) -> jnp.ndarray:
        """(n, L) uint32 concatenated hashes (independent.hpp:70-87)."""
        return self.hash_with(self.params, x)

    def hash_with(self, params, x: jnp.ndarray) -> jnp.ndarray:
        """hash() with explicit function parameters (used by the
        per-cluster faithful-import path, io/interop.py)."""
        h = self.family.hash(params, x)  # (n, L*fph)
        n = h.shape[0]
        h = h.reshape(n, self.num_hashers, self.functions_per_hasher)
        return _combine_bits(
            h, self.functions_per_hasher, self.family.bits_per_function, self.bits_to_cut
        )


@dataclasses.dataclass
class PooledHashSource:
    """Pool of functions shared between tables (reference: hash_source/pool.hpp).

    Each table's hash is assembled from `functions_per_hasher` randomly
    chosen pool members (pool.hpp:134-157). The failure probability is
    approximated as if independent (pool.hpp:170-183), which we inherit by
    reusing HashSourceProbs.
    """

    family: object
    num_hashers: int
    num_bits: int
    pool_size: int = 0  # 0 -> default 3 * sqrt(L * fph) heuristic

    def __post_init__(self):
        bpf = self.family.bits_per_function
        self.functions_per_hasher = (self.num_bits + bpf - 1) // bpf
        self.bits_to_cut = bpf * self.functions_per_hasher - self.num_bits
        if self.pool_size == 0:
            need = self.num_hashers * self.functions_per_hasher
            self.pool_size = max(self.functions_per_hasher, int(3 * np.sqrt(need)) + 1)
        self.params = None
        self.probs = HashSourceProbs(self.family, self.num_bits)

    def init(self, key: jax.Array) -> "PooledHashSource":
        k1, k2 = jax.random.split(key)
        # pool_indices live INSIDE params: they are as much sampled state
        # as the pool functions themselves, and every restore path
        # (ClusteredIndex.rebuild_objects, io/h5 load) round-trips only
        # `params`. Keeping them outside silently re-broadcast the pool
        # via `pool[:, None]` after a restore — query hashes stopped
        # matching the tables. Families read only their own keys, so the
        # extra key is inert to family.hash.
        self.params = dict(self.family.sample(k1, self.pool_size))
        self.params["pool_indices"] = jax.random.randint(
            k2,
            (self.num_hashers, self.functions_per_hasher),
            0,
            self.pool_size,
            dtype=jnp.int32,
        )
        return self

    def hash(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.hash_with(self.params, x)

    def hash_with(self, params, x: jnp.ndarray) -> jnp.ndarray:
        """hash() with explicit parameters (restore paths pass the stored
        params; must include "pool_indices")."""
        pool = self.family.hash(params, x)  # (n, pool_size)
        h = pool[:, params["pool_indices"]]  # (n, L, fph)
        return _combine_bits(
            h, self.functions_per_hasher, self.family.bits_per_function, self.bits_to_cut
        )


def _intersperse_zero(v: jnp.ndarray, num_bits: int) -> jnp.ndarray:
    """Spread the low `num_bits` of v so bit i lands at position 2i
    (reference: hash_source/tensor.hpp:6-17)."""
    res = jnp.zeros_like(v)
    for i in range(num_bits):
        res = res | (((v >> np.uint32(i)) & np.uint32(1)) << np.uint32(2 * i))
    return res


def minimal_index_pairs(num_hashers: int) -> np.ndarray:
    """The reference's pair enumeration (tensor.hpp:20-33): both sides
    incremented as little as possible, rhs first — (0,0) (0,1) (1,0)
    (1,1) (0,2) (2,0) ... Returns (T, 2) int32 (left, right) indices."""
    pairs = []
    for idx in range(num_hashers):
        s = int(np.sqrt(idx))
        if idx == s * s + 2 * s:
            pairs.append((s, s))
        elif idx >= s * s + s:
            pairs.append((s, idx - (s * s + s)))
        else:
            pairs.append((idx - s * s, s))
    return np.asarray(pairs, dtype=np.int32)


@dataclasses.dataclass
class TensoredHashSource:
    """sqrt-trick source (reference: hash_source/tensor.hpp:19-118).

    Builds 2*ceil(sqrt(T)) half-length hashes; table rep combines left
    half i and right half j (pair order = get_minimal_index_pair,
    tensor.hpp:20-33) by bit interleaving: all halves are interspersed
    (bit i -> position 2i); for even num_bits the LEFT halves shift up one
    (tensor.hpp:100-104), for odd the RIGHT halves shift down one
    (:105-109), and the table hash is left | right (:111-117). Bit-exact
    to the reference so bit-faithful imports hash queries identically.

    Failure probability reuses the independent shape as a (slightly
    optimistic) approximation — the reference derives a bespoke one
    (tensor.hpp:127-163); ours is conservative in the query loop because
    depth-granular checking already over-delivers recall.
    """

    family: object
    num_hashers: int
    num_bits: int

    def __post_init__(self):
        self.num_halves = 2 * int(np.ceil(np.sqrt(self.num_hashers)))
        self.half_bits = (self.num_bits + 1) // 2
        bpf = self.family.bits_per_function
        self.fph = (self.half_bits + bpf - 1) // bpf
        self.bits_to_cut = bpf * self.fph - self.half_bits
        self.pair_idx = minimal_index_pairs(self.num_hashers)
        self.params = None
        self.probs = HashSourceProbs(self.family, self.num_bits)

    def init(self, key: jax.Array) -> "TensoredHashSource":
        self.params = self.family.sample(key, self.num_halves * self.fph)
        return self

    def hash(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.hash_with(self.params, x)

    def hash_with(self, params, x: jnp.ndarray) -> jnp.ndarray:
        """hash() with explicit function parameters (used by the
        per-cluster faithful-import path, io/interop.py)."""
        h = self.family.hash(params, x)  # (n, halves*fph)
        n = h.shape[0]
        h = h.reshape(n, self.num_halves, self.fph)
        halves = _combine_bits(
            h, self.fph, self.family.bits_per_function, self.bits_to_cut
        )  # (n, halves) each half_bits bits
        inter = _intersperse_zero(halves, self.half_bits)
        right_start = self.num_halves // 2
        if self.num_bits % 2 == 0:
            left = inter[:, : right_start] << np.uint32(1)
            right = inter[:, right_start:]
        else:
            left = inter[:, : right_start]
            right = inter[:, right_start:] >> np.uint32(1)
        return (
            left[:, self.pair_idx[:, 0]] | right[:, self.pair_idx[:, 1]]
        )


def make_hash_source(
    name: str, family, num_hashers: int, num_bits: int, pool_size: int = 0
):
    if name == "independent":
        return IndependentHashSource(family, num_hashers, num_bits)
    if name == "pool":
        return PooledHashSource(family, num_hashers, num_bits, pool_size)
    if name == "tensor":
        return TensoredHashSource(family, num_hashers, num_bits)
    raise ValueError(f"unknown hash source {name!r}")
