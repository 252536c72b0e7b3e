"""Brute-force k-nearest-neighbors for point clouds.

Replaces pytorch3d.ops.knn_points / knn_gather (used by SconeOcc's
multi-scale local transformers and get_knn_points,
macarons/utility/utils.py:1499-1512). Point counts are <= a few thousand, so
a tiled MXU distance matrix + top_k is the right TPU shape — no spatial
acceleration structure needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_F32 = jax.lax.Precision.HIGHEST


@functools.partial(jax.jit, static_argnames=("k",))
def knn_indices(query: jnp.ndarray, points: jnp.ndarray, k: int) -> jnp.ndarray:
    """Indices of the k nearest points for each query. (B, Nq, k).

    query: (B, Nq, 3); points: (B, Np, 3).
    """
    q2 = jnp.sum(query * query, axis=-1)
    p2 = jnp.sum(points * points, axis=-1)
    cross = jnp.einsum("bqd,bpd->bqp", query, points, precision=_F32)
    d2 = q2[..., :, None] + p2[..., None, :] - 2.0 * cross
    _, idx = jax.lax.top_k(-d2, k)
    return idx


@functools.partial(jax.jit, static_argnames=("k",))
def knn_points(query: jnp.ndarray, points: jnp.ndarray, k: int):
    """(neighbors (B, Nq, k, 3), indices (B, Nq, k)) like get_knn_points."""
    idx = knn_indices(query, points, k)
    nbrs = jax.vmap(lambda p, i: p[i])(points, idx)
    return nbrs, idx
