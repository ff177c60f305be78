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
