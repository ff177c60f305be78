"""MinHash LSH families for Jaccard similarity.

TPU-native equivalents of the reference MinHash machinery
(reference: libpuffinn/include/puffinn/hash/minhash.hpp):
- MinHash (minhash.hpp:165-254): hash every token, take the token with the
  smallest hash, emit a scrambled encoding of that token.
  bits_per_function = ceil_log(universe) (minhash.hpp:240-242); collision
  probability sim + (1-sim) * miss_collision_prob with
  miss = (U / min(2^b, U) - 1) / (U - 1)   (minhash.hpp:244-253).
- MinHash1Bit (minhash.hpp:256-283): the same function reduced to its
  lowest bit, for sketching.

Divergence (documented): the reference uses 4x8-bit tabulation hashing
(minhash.hpp:11-48) and a low-bit random permutation (minhash.hpp:51-95).
Tabulation is a table-gather per token — the worst possible TPU operation —
so both are replaced with a murmur3-finalizer integer mix seeded per
function, which vectorizes to a handful of VPU multiplies/shifts per token
and has full avalanche (a bare multiply is NOT enough: token 0 would hash
to 0 under every function and always win the min).

For reference interop, TabulationMinHash / TabulationMinHash1Bit evaluate
the reference's EXACT function (tabulation tables + BitPermutation as
explicit parameters), so imported jaccard streams hash queries
bit-identically and exported indexes are searchable by the reference
engine. They are the interop-grade option; the murmur families remain the
native default.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from clann_tpu.ops.hashing import ceil_log2


def _random_seeds(key: jax.Array, num: int) -> jnp.ndarray:
    return jax.random.randint(
        key, (num,), minval=jnp.iinfo(jnp.int32).min, maxval=jnp.iinfo(jnp.int32).max
    ).astype(jnp.uint32)


def fmix32(h: jnp.ndarray) -> jnp.ndarray:
    """murmur3 32-bit finalizer: full-avalanche integer mixing."""
    h = jnp.asarray(h, jnp.uint32)
    h = h ^ (h >> jnp.uint32(16))
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> jnp.uint32(13))
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> jnp.uint32(16))
    return h


@dataclasses.dataclass
class MinHash:
    """Min-wise hashing over padded token sets (reference: minhash.hpp)."""

    universe: int

    def __post_init__(self):
        self.set_size = max(self.universe, 2)
        self.bits_per_function = ceil_log2(self.set_size)

    def sample(self, key: jax.Array, num_functions: int) -> dict:
        k1, k2 = jax.random.split(key)
        return {
            "rank_seed": _random_seeds(k1, num_functions),
            "scramble_seed": _random_seeds(k2, num_functions),
        }

    def hash(self, params: dict, sets: jnp.ndarray) -> jnp.ndarray:
        """(n, F) uint32 minhashes of padded (n, T) token tensors.

        For each function f: rank tokens by fmix32(token ^ rank_seed[f])
        (minhash.hpp:185-192 min-selection), then encode the argmin token
        as the top bits of fmix32(token ^ scramble_seed[f]) — the
        permutation role of minhash.hpp:51-95.
        """
        tokens = jnp.asarray(sets)
        valid = tokens >= 0
        t = tokens.astype(jnp.uint32)
        # (n, T, F) ranks; padding ranks = max
        ranks = fmix32(t[:, :, None] ^ params["rank_seed"][None, None, :])
        ranks = jnp.where(valid[:, :, None], ranks, jnp.uint32(0xFFFFFFFF))
        min_pos = jnp.argmin(ranks, axis=1)  # (n, F)
        min_token = jnp.take_along_axis(t, min_pos, axis=1)  # (n, F)
        shift = jnp.uint32(32 - self.bits_per_function)
        return fmix32(min_token ^ params["scramble_seed"][None, :]) >> shift

    def collision_probability(self, sim, num_bits) -> jnp.ndarray:
        """sim + (1-sim) * miss_collision_prob (minhash.hpp:244-253)."""
        sim = jnp.asarray(sim, jnp.float32)
        nb = jnp.asarray(num_bits)
        u = float(self.set_size)
        hashes = jnp.minimum(2.0 ** nb.astype(jnp.float32), u)
        num_possible = u / hashes - 1.0
        miss = num_possible / (u - 1.0)
        p = sim + (1.0 - sim) * miss
        return jnp.where(nb == 0, 1.0, jnp.clip(p, 0.0, 1.0))


@dataclasses.dataclass
class TabulationMinHash(MinHash):
    """Reference-exact MinHash (minhash.hpp:11-127).

    Per function f: rank every token by a 64-bit 4x8-bit tabulation hash
    (t1[b0]^t2[b1]^t3[b2]^t4[b3], minhash.hpp:40-47), take the FIRST token
    achieving the minimum (strict `<` in the reference scan,
    minhash.hpp:116-127), and emit the token with its low `randomized_bits`
    bits sent through a random permutation (BitPermutation,
    minhash.hpp:51-95).

    Params (explicit, so reference-serialized functions evaluate
    bit-identically):
      tab_hi / tab_lo: (F, 4, 256) uint32 — high/low words of the uint64
        tables (x64 mode stays off; the 64-bit min is a lexicographic
        (hi, lo) compare).
      perm: (F, P) uint32, P = min(universe, 2^randomized_bits).
    The permutation mask is derived from P: if P < universe then P is
    exactly 2^randomized_bits; otherwise any mask covering the universe
    produces identical values (the permuted low bits span every token).
    """

    randomized_bits: int = 4  # MinHashArgs default (minhash.hpp:139-143)

    def sample(self, key: jax.Array, num_functions: int) -> dict:
        k1, k2, k3 = jax.random.split(key, 3)
        shape = (num_functions, 4, 256)
        p = min(self.universe, 1 << self.randomized_bits)
        perms = jax.vmap(
            lambda k: jax.random.permutation(k, jnp.arange(p, dtype=jnp.uint32))
        )(jax.random.split(k3, num_functions))
        return {
            "tab_hi": jax.random.bits(k1, shape, jnp.uint32),
            "tab_lo": jax.random.bits(k2, shape, jnp.uint32),
            "perm": perms,
        }

    def hash(self, params: dict, sets: jnp.ndarray) -> jnp.ndarray:
        tokens = jnp.asarray(sets)
        valid = tokens >= 0  # (n, T)
        t = jnp.where(valid, tokens, 0).astype(jnp.uint32)
        tab_hi, tab_lo = params["tab_hi"], params["tab_lo"]
        hi = jnp.zeros((tab_hi.shape[0],) + t.shape, jnp.uint32)
        lo = jnp.zeros_like(hi)
        for j in range(4):
            b = ((t >> jnp.uint32(8 * j)) & jnp.uint32(0xFF)).astype(jnp.int32)
            hi = hi ^ tab_hi[:, j, :][:, b]
            lo = lo ^ tab_lo[:, j, :][:, b]
        # first token with the lexicographic (hi, lo) minimum; padding
        # ranks as +inf
        umax = jnp.uint32(0xFFFFFFFF)
        hi = jnp.where(valid[None], hi, umax)
        m_hi = jnp.min(hi, axis=-1, keepdims=True)
        cand = valid[None] & (hi == m_hi)
        lo_m = jnp.where(cand, lo, umax)
        m_lo = jnp.min(lo_m, axis=-1, keepdims=True)
        win = cand & (lo_m == m_lo)
        pos = jnp.argmax(win, axis=-1)  # (F, n), first True
        min_token = jnp.take_along_axis(
            jnp.broadcast_to(t[None], win.shape), pos[..., None], axis=-1
        )[..., 0]
        # empty sets: the reference leaves min_token = 0 (minhash.hpp:118)
        min_token = jnp.where(jnp.any(valid, axis=1)[None], min_token, 0)
        # BitPermutation (minhash.hpp:87-96)
        perm = params["perm"]  # (F, P)
        p = perm.shape[1]
        if p < self.universe:
            rand_bits = int(np.round(np.log2(max(p, 1))))
        else:
            rand_bits = ceil_log2(max(p, 1))
        mask = jnp.uint32((1 << rand_bits) - 1)
        lower = jnp.clip(min_token & mask, 0, p - 1).astype(jnp.int32)
        permuted = jnp.take_along_axis(perm, lower, axis=1)  # (F, n)
        out = (min_token & ~mask) | permuted
        return out.T  # (n, F)


@dataclasses.dataclass
class TabulationMinHash1Bit(TabulationMinHash):
    """1-bit reduction of TabulationMinHash (minhash.hpp:256-283)."""

    def __post_init__(self):
        super().__post_init__()
        self.full_bits = self.bits_per_function
        self.bits_per_function = 1

    def hash(self, params: dict, sets: jnp.ndarray) -> jnp.ndarray:
        return TabulationMinHash.hash(self, params, sets) & jnp.uint32(1)

    def collision_probability(self, sim, num_bits) -> jnp.ndarray:
        nb = jnp.minimum(jnp.asarray(num_bits), 1)
        return MinHash.collision_probability(self, sim, nb)


@dataclasses.dataclass
class MinHash1Bit(MinHash):
    """1-bit MinHash for sketching (reference: minhash.hpp:256-283)."""

    def __post_init__(self):
        super().__post_init__()
        self.full_bits = self.bits_per_function
        self.bits_per_function = 1

    def hash(self, params: dict, sets: jnp.ndarray) -> jnp.ndarray:
        full = MinHash.hash(self, params, sets)
        return full & jnp.uint32(1)

    def collision_probability(self, sim, num_bits) -> jnp.ndarray:
        nb = jnp.minimum(jnp.asarray(num_bits), 1)
        return MinHash.collision_probability(self, sim, nb)
