"""Greedy minimum-maximum (Gonzalez) k-center clustering on the MXU.

TPU-native equivalent of the reference GMM
(reference: src/core/gmm.rs:21-63). Semantics matched exactly:
- first center is point 0 (gmm.rs:33)
- k-1 iterations: next center = argmax of current min-distance (first max
  wins, gmm.rs:5-15), then relax distances with strict `<` (gmm.rs:47-52)
- per-cluster radius = max assigned distance (gmm.rs:56-60)
- degenerate n <= k: every point its own center (gmm.rs:26-31)

The reference's hot loop is a scalar `all_distances` pass per center
(O(n*k) scalar distance calls, SURVEY §3.1); here each iteration is one
(n, d) x (d,) matvec on the MXU inside a `lax.fori_loop`, so the whole
clustering is a single compiled XLA program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from clann_tpu.ops.distances import exact_dot, l2_normalize


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "assume_normalized")
)
def _gmm_jit(x: jnp.ndarray, *, k: int, metric: str,
             assume_normalized: bool = False):
    n = x.shape[0]
    if metric == "angular":
        # assume_normalized skips the in-program re-normalize. This is
        # not cosmetic: at 13M x 100 the fused divide forced XLA to hold
        # TWO whole-array layout copies of the vectors inside the GMM
        # program (6.2G + 5.0G HLO temps on top of the 5.0G argument —
        # witnessed OOM, CAPACITY_EDGE round 5), capping single-chip
        # builds ~3x below the residency model. build_index normalizes
        # once up front and passes True.
        xn = x if assume_normalized else l2_normalize(x)

        def dist_col(c):
            # 1 - Xn @ Xn[c]; one MXU matvec (reference: angulardata.rs:38-43)
            return jnp.clip(1.0 - exact_dot(xn, xn[c]), 0.0, 2.0)

    else:
        sq = jnp.sum(x * x, axis=1)

        def dist_col(c):
            d2 = sq + sq[c] - 2.0 * exact_dot(x, x[c])
            return jnp.sqrt(jnp.clip(d2, 0.0, None))

    centers0 = jnp.zeros((k,), dtype=jnp.int32)
    dists0 = dist_col(0)
    assignment0 = jnp.zeros((n,), dtype=jnp.int32)

    def body(idx, state):
        centers, dists, assignment = state
        farthest = jnp.argmax(dists).astype(jnp.int32)  # first max (gmm.rs:5-15)
        centers = centers.at[idx].set(farthest)
        new_dists = dist_col(farthest)
        closer = new_dists < dists  # strict < (gmm.rs:48)
        assignment = jnp.where(closer, idx, assignment)
        dists = jnp.where(closer, new_dists, dists)
        return centers, dists, assignment

    centers, dists, assignment = jax.lax.fori_loop(
        1, k, body, (centers0, dists0, assignment0)
    )
    # radii[c] = max over assigned points of final min-distance (gmm.rs:56-60)
    radii = jnp.zeros((k,), dtype=jnp.float32).at[assignment].max(dists)
    return centers, assignment, radii


def greedy_minimum_maximum(data, k: int, metric: str = "angular",
                           assume_normalized: bool = False):
    """Cluster `data` into k groups; returns (centers, assignment, radii).

    centers: (k,) int32 indices into data rows
    assignment: (n,) int32 indices into centers
    radii: (k,) float32 max distance of an assigned point to its center
    assume_normalized: caller guarantees unit rows (angular); skips the
    in-program re-normalize and its large-n layout-copy cost (see
    _gmm_jit).
    """
    x = jnp.asarray(data, dtype=jnp.float32)
    n = x.shape[0]
    if n <= k:
        # Degenerate: each point is its own center (gmm.rs:26-31).
        ar = np.arange(n, dtype=np.int32)
        return ar, ar.copy(), np.zeros(n, dtype=np.float32)
    centers, assignment, radii = _gmm_jit(
        x, k=k, metric=metric, assume_normalized=assume_normalized
    )
    return np.asarray(centers), np.asarray(assignment), np.asarray(radii)


def greedy_minimum_maximum_reference(data: np.ndarray, k: int, metric: str = "angular"):
    """Pure-NumPy port of gmm.rs used ONLY as a test oracle for the JAX path."""
    x = np.asarray(data, dtype=np.float32)
    n = x.shape[0]
    if n <= k:
        ar = np.arange(n, dtype=np.int32)
        return ar, ar.copy(), np.zeros(n, dtype=np.float32)

    if metric == "angular":
        xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)

        def dist_col(c):
            return np.clip(1.0 - xn @ xn[c], 0.0, 2.0)

    else:
        sq = np.sum(x * x, axis=1)

        def dist_col(c):
            return np.sqrt(np.clip(sq + sq[c] - 2.0 * (x @ x[c]), 0.0, None))

    centers = np.zeros(k, dtype=np.int32)
    dists = dist_col(0)
    assignment = np.zeros(n, dtype=np.int32)
    for idx in range(1, k):
        farthest = int(np.argmax(dists))
        centers[idx] = farthest
        nd = dist_col(farthest)
        closer = nd < dists
        assignment[closer] = idx
        dists[closer] = nd[closer]
    radii = np.zeros(k, dtype=np.float32)
    np.maximum.at(radii, assignment, dists)
    return centers, assignment, radii
