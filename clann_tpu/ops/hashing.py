"""LSH hash families as batched MXU matmuls.

TPU-native equivalents of the reference hash families:
- SimHash (reference: libpuffinn/include/puffinn/hash/simhash.hpp:41-45,
  96-102): sign of a dot with a random unit vector; here one
  (n, d) @ (d, F) matmul + sign for all F functions at once.
- FHT cross-polytope (reference: hash/crosspolytope.hpp:121-311): 3 rounds
  of (+-1 diagonal x fast Hadamard transform) pseudo-rotation, hash = index
  of the max-|coordinate| axis with a sign bit. The reference uses the FFHT
  C library (O(d log d) butterflies, AVX); on TPU the Hadamard transform is
  expressed as a (d_pad, d_pad) matmul — at d_pad <= 256 the MXU executes a
  dense H-matmul faster than any butterfly network, so "fast" Hadamard IS a
  matmul here.
- Vanilla cross-polytope (reference: hash/crosspolytope.hpp:313-469): same
  encoding after one true Gaussian random rotation.

All hash values are uint32 with `bits_per_function` significant bits.
Tie-breaking in the argmax encode matches the reference scan order
(crosspolytope.hpp:131-144): lowest index wins, and at equal |v| the
positive sign wins.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def ceil_log2(x: int) -> int:
    """Smallest l with 2^l >= x (reference: math.hpp:105-113 ceil_log)."""
    l = 0
    while (1 << l) < x:
        l += 1
    return l


def hadamard_matrix(log_n: int) -> np.ndarray:
    """Unnormalized Hadamard matrix H_{2^log_n} (Sylvester construction).

    Matches FFHT semantics (unnormalized sums; reference FFHT fht() in
    libpuffinn/include/external/ffht) — normalization is irrelevant for the
    argmax/sign encodings that consume the transform.
    """
    h = np.array([[1.0]], dtype=np.float32)
    for _ in range(log_n):
        h = np.block([[h, h], [h, -h]])
    return h.astype(np.float32)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class SimHash:
    """1-bit hyperplane hash family (reference: hash/simhash.hpp)."""

    dimensions: int
    bits_per_function: int = 1

    def sample(self, key: jax.Array, num_functions: int) -> dict:
        """Random unit-vector hyperplanes, one per function
        (reference: simhash.hpp:20-23 generate_random + store)."""
        dirs = jax.random.normal(key, (num_functions, self.dimensions), jnp.float32)
        norms = jnp.linalg.norm(dirs, axis=1, keepdims=True)
        return {"dirs": dirs / jnp.where(norms == 0, 1.0, norms)}

    def hash(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        """(n, F) uint32 in {0, 1}: 1 iff dot >= 0 (simhash.hpp:41-45)."""
        dots = jnp.dot(x, params["dirs"].T, preferred_element_type=jnp.float32)
        return (dots >= 0).astype(jnp.uint32)

    def collision_probability(self, sim, num_bits) -> jnp.ndarray:
        """p = 1 - acos(2s-1)/pi for 1 bit, 1.0 for 0 bits
        (reference: simhash.hpp:96-102)."""
        sim = jnp.asarray(sim, jnp.float32)
        p1 = 1.0 - jnp.arccos(jnp.clip(2.0 * sim - 1.0, -1.0, 1.0)) / jnp.pi
        return jnp.where(jnp.asarray(num_bits) == 0, 1.0, p1)


# ---------------------------------------------------------------------------
# Cross-polytope (FHT pseudo-rotation and true Gaussian rotation)
# ---------------------------------------------------------------------------


def encode_closest_axis(v: jnp.ndarray, log_dim: int) -> jnp.ndarray:
    """Hash = argmax_i |v_i| with a sign bit: i if v_i > 0 else i + 2^log_dim.

    Reference: crosspolytope.hpp:131-144. The reference scans coordinates in
    order testing +v_i then -v_i with strict `>`; interleaving (+v_0, -v_0,
    +v_1, -v_1, ...) and taking the first argmax reproduces that tie-break
    exactly.

    v: (..., 2^log_dim) -> (...) uint32 with log_dim+1 bits.
    """
    inter = jnp.stack([v, -v], axis=-1).reshape(*v.shape[:-1], -1)
    pos = jnp.argmax(inter, axis=-1).astype(jnp.uint32)
    idx = pos >> 1
    neg = pos & 1
    return idx | (neg << log_dim)


@dataclasses.dataclass
class FHTCrossPolytope:
    """Pseudo-rotation cross-polytope LSH (reference: crosspolytope.hpp:121-311).

    bits_per_function = log2(padded_dim) + 1 (crosspolytope.hpp:301-303).
    Collision probabilities are Monte-Carlo tabulated (see collision.py),
    matching CrossPolytopeCollisionEstimates (crosspolytope.hpp:10-119).
    """

    dimensions: int
    num_rotations: int = 3
    estimation_repetitions: int = 1000
    estimation_eps: float = 5e-3

    def __post_init__(self):
        self.log_dim = ceil_log2(self.dimensions)
        self.padded_dim = 1 << self.log_dim
        self.bits_per_function = self.log_dim + 1
        self._estimates: Optional[np.ndarray] = None

    def sample(self, key: jax.Array, num_functions: int) -> dict:
        """+-1 diagonal signs per (function, rotation)
        (reference: crosspolytope.hpp:162-173)."""
        signs = (
            jax.random.bernoulli(
                key, 0.5, (num_functions, self.num_rotations, self.padded_dim)
            ).astype(jnp.float32)
            * 2.0
            - 1.0
        )
        return {"signs": signs}

    def hash(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        """(n, F) uint32 cross-polytope hashes.

        Per function: v = H S_r ... H S_1 x (crosspolytope.hpp:187-209),
        then closest-axis encoding. Batched over functions: the (n, dp)
        tensor is broadcast against (F, dp) sign diagonals, and each
        Hadamard application is one (F*n, dp) @ (dp, dp) matmul on the MXU.
        """
        signs = params["signs"]  # (F, R, dp)
        F = signs.shape[0]
        n = x.shape[0]
        h = jnp.asarray(hadamard_matrix(self.log_dim))
        v = jnp.pad(x, ((0, 0), (0, self.padded_dim - x.shape[1])))
        v = jnp.broadcast_to(v[None], (F, n, self.padded_dim))
        for r in range(self.num_rotations):
            v = v * signs[:, None, r, :]
            v = jnp.dot(v, h, preferred_element_type=jnp.float32)
        return encode_closest_axis(v, self.log_dim).T  # (n, F)

    def collision_probability(self, sim, num_bits) -> jnp.ndarray:
        """Tabulated MC estimate lookup (crosspolytope.hpp:117-119):
        probabilities[num_bits][floor(sim / eps)]."""
        if self._estimates is None:
            from clann_tpu.ops.collision import cross_polytope_estimates

            self._estimates = cross_polytope_estimates(
                self.padded_dim, self.estimation_repetitions, self.estimation_eps
            )
        table = jnp.asarray(self._estimates)  # (log_dim+2, n_buckets)
        bucket = jnp.clip(
            (jnp.asarray(sim, jnp.float32) / self.estimation_eps).astype(jnp.int32),
            0,
            table.shape[1] - 1,
        )
        nb = jnp.clip(jnp.asarray(num_bits, jnp.int32), 0, table.shape[0] - 1)
        return table[nb, bucket]


@dataclasses.dataclass
class CrossPolytope(FHTCrossPolytope):
    """Cross-polytope LSH with a single true Gaussian rotation.

    Reference: crosspolytope.hpp:313-469 (explicit random-matrix rotation in
    i16 fixed point). On the MXU a dense random rotation costs the same as
    one Hadamard pass, so this family is ~num_rotations x cheaper than the
    FHT variant while being statistically a true rotation.
    """

    def sample(self, key: jax.Array, num_functions: int) -> dict:
        """Each output axis gets a random UNIT vector, as the reference
        samples its matrix rows (crosspolytope.hpp:330-336 generate_random)
        — unit columns also keep the Q15 export conversion lossless-ish
        (values in [-1, 1))."""
        rot = jax.random.normal(
            key, (num_functions, self.dimensions, self.padded_dim), jnp.float32
        )
        norms = jnp.linalg.norm(rot, axis=1, keepdims=True)
        return {"rot": rot / jnp.where(norms == 0, 1.0, norms)}

    def hash(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        # (F, n, dp) = einsum((n, d), (F, d, dp)); one batched MXU matmul.
        v = jnp.einsum(
            "nd,fdp->fnp", x, params["rot"], preferred_element_type=jnp.float32
        )
        return encode_closest_axis(v, self.log_dim).T


def make_hash_family(name: str, dimensions: int, *, num_rotations: int = 3,
                     estimation_repetitions: int = 1000,
                     estimation_eps: float = 5e-3):
    if name == "simhash":
        return SimHash(dimensions)
    if name == "fht_cross_polytope":
        return FHTCrossPolytope(
            dimensions,
            num_rotations=num_rotations,
            estimation_repetitions=estimation_repetitions,
            estimation_eps=estimation_eps,
        )
    if name == "cross_polytope":
        return CrossPolytope(
            dimensions,
            num_rotations=num_rotations,
            estimation_repetitions=estimation_repetitions,
            estimation_eps=estimation_eps,
        )
    raise ValueError(f"unknown hash family {name!r}")
