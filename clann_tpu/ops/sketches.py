"""1-bit LSH sketch filtering.

TPU-native equivalent of the reference Filterer
(reference: libpuffinn/include/puffinn/filterer.hpp): NUM_SKETCHES=32
64-bit SimHash sketches per point (filterer.hpp:16, typedefs.hpp:12-15),
filter test popcount(xor) <= max_sketch_diff (filterer.hpp:28-31), and the
adaptive threshold round(64 * (1 - p_1(kth_sim))) (filterer.hpp:108-111).

64-bit integers are emulated (slow) on TPU, so each sketch is stored as two
uint32 lanes: sketches[n, NUM_SKETCHES, 2]. Hamming distance is two XOR +
population_count ops on the VPU.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from clann_tpu.ops.hashing import SimHash

NUM_SKETCHES = 32  # reference: filterer.hpp:16
SKETCH_BITS = 64  # reference: typedefs.hpp NUM_FILTER_HASHBITS
_WORDS = SKETCH_BITS // 32


def pack_bits_u32(bits: jnp.ndarray) -> jnp.ndarray:
    """Pack (..., 32*w) {0,1} uint32 values into (..., w) uint32 words.

    Bit i of a word is source column 31-i within its 32-column group, i.e.
    the first column is the most significant bit — matching the
    accumulate-shift order of the reference's bit concatenation
    (independent.hpp:79-83).
    """
    *lead, nb = bits.shape
    assert nb % 32 == 0
    w = nb // 32
    b = bits.reshape(*lead, w, 32)
    shifts = jnp.arange(31, -1, -1, dtype=jnp.uint32)
    return jnp.sum(b << shifts, axis=-1, dtype=jnp.uint32)


@dataclasses.dataclass
class SketchFilterer:
    """Builds and evaluates per-point sketches (reference: filterer.hpp)."""

    dimensions: int
    num_sketches: int = NUM_SKETCHES
    sketch_bits: int = SKETCH_BITS

    def __post_init__(self):
        assert self.sketch_bits % 32 == 0
        self.family = SimHash(self.dimensions)
        self.params = None

    def init(self, key: jax.Array) -> "SketchFilterer":
        self.params = self.family.sample(key, self.num_sketches * self.sketch_bits)
        return self

    def sketch(self, x: jnp.ndarray) -> jnp.ndarray:
        """(n, num_sketches, words) uint32 packed sketches.

        One (n, d) @ (d, num_sketches*bits) matmul + sign + bit-pack; the
        reference loops point-by-point under OpenMP (filterer.hpp:87-96).
        """
        return self.sketch_with(self.params, x)

    def sketch_with(self, params, x: jnp.ndarray) -> jnp.ndarray:
        """sketch() with explicit plane parameters (per-cluster faithful
        import, io/interop.py)."""
        bits = self.family.hash(params, x)  # (n, S*B) of {0,1}
        n = bits.shape[0]
        bits = bits.reshape(n, self.num_sketches, self.sketch_bits)
        return pack_bits_u32(bits)  # (n, S, words)

    @staticmethod
    def hamming(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """popcount(xor) summed over the word axis (filterer.hpp:28-31)."""
        x = jnp.bitwise_xor(a, b)
        return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)

    def max_sketch_diff(self, probs_1bit, kth_sim) -> jnp.ndarray:
        """round(bits * (1 - p_1(kth_sim))) (reference: filterer.hpp:108-111).

        probs_1bit: callable sim -> 1-bit collision probability of the
        sketch family (SimHash closed form).
        """
        p = probs_1bit(kth_sim)
        return jnp.round(self.sketch_bits * (1.0 - p)).astype(jnp.int32)


def simhash_p1(sim) -> jnp.ndarray:
    """1-bit SimHash collision probability (reference: simhash.hpp:96-102)."""
    s = jnp.asarray(sim, jnp.float32)
    return 1.0 - jnp.arccos(jnp.clip(2.0 * s - 1.0, -1.0, 1.0)) / jnp.pi
