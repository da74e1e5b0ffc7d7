"""Brute-force k-nearest-neighbour ops (MXU-friendly, chunked).

TPU-native replacement for the reference's two native KNN dependencies:
  * `simple_knn._C.distCUDA2` — mean distance to the 3 nearest neighbours,
    used only for Gaussian scale initialization
    (`/root/reference/src/pointrix/utils/gaussian_points/gaussian_utils.py:68-91`);
  * `pytorch3d.ops.knn_points` — K-NN connectivity for the ARAP regularizer
    (`/root/reference/src/geometry_utils.py:15`).

Distances are computed as one |x|^2 + |y|^2 - 2 x.y^T matmul per query chunk
(MXU does the heavy lifting), followed by top-k. O(N*M) flops — at the
reference's scales (<= ~200k points, K <= 10) this is well under a
millisecond of MXU time and needs no spatial data structure.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def _pairwise_sq_dists(q: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """[Q,3] x [N,3] -> [Q,N] squared euclidean distances (via MXU matmul)."""
    qq = jnp.sum(q * q, axis=-1, keepdims=True)         # [Q,1]
    pp = jnp.sum(p * p, axis=-1)[None, :]               # [1,N]
    qp = q @ p.T                                        # [Q,N] matmul
    return jnp.maximum(qq + pp - 2.0 * qp, 0.0)


@partial(jax.jit, static_argnames=("k", "chunk"))
def knn(
    query: jnp.ndarray,
    points: jnp.ndarray,
    k: int,
    chunk: int = 2048,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k nearest neighbours of `query` among `points`.

    Returns (sq_dists [Q,k], idx [Q,k]) sorted ascending by distance.
    When query is points itself, slot 0 is the point itself (dist 0) —
    same convention as `knn_points` with K+1 then dropping self
    (`geometry_utils.py:15-18`).
    """
    Q = query.shape[0]
    N = points.shape[0]
    k_eff = min(k, N)
    pad = (-Q) % chunk
    qpad = jnp.pad(query, ((0, pad), (0, 0)))
    qc = qpad.reshape(-1, chunk, query.shape[-1])

    def one_chunk(qb):
        d = _pairwise_sq_dists(qb, points)
        neg_d, idx = jax.lax.top_k(-d, k_eff)
        return -neg_d, idx

    d, idx = jax.lax.map(one_chunk, qc)
    d = d.reshape(-1, k_eff)[:Q]
    idx = idx.reshape(-1, k_eff)[:Q]
    if k_eff < k:  # tiny clouds: pad missing neighbours with +inf / last idx
        d = jnp.pad(d, ((0, 0), (0, k - k_eff)), constant_values=jnp.inf)
        idx = jnp.pad(idx, ((0, 0), (0, k - k_eff)), mode="edge")
    return d, idx


@partial(jax.jit, static_argnames=("chunk",))
def mean_knn3_sq_dist(points: jnp.ndarray, chunk: int = 2048) -> jnp.ndarray:
    """Mean squared distance to the 3 nearest neighbours of each point.

    Parity with `simple_knn.distCUDA2` as documented by the reference's
    sklearn fallback (`gaussian_utils.py:75-90`): query = points, exclude
    self, average the 3 NN *squared* distances.
    """
    if points.shape[0] < 2:
        # a single point has no neighbours; fall back to a small scale
        return jnp.full((points.shape[0],), 1e-4, jnp.float32)
    d, _ = knn(points, points, k=4, chunk=chunk)
    d = jnp.where(jnp.isfinite(d), d, 0.0)  # tiny clouds: ignore padded slots
    denom = jnp.minimum(points.shape[0] - 1, 3)
    return jnp.sum(d[:, 1:4], axis=-1) / denom
