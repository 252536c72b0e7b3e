"""View-state vectors and view harmonics for the SCONE modules.

Vectorized ports of macarons/utility/scone_utils.py:
- compute_view_state (:799-860): per-point binary grid over n_elev x n_azim
  discretized directions marking where cameras have observed the point from,
- compute_view_harmonics (:933-962): project the view state onto the
  spherical-harmonics basis with the sin(polar) quadrature weights,
- move_view_state_to_view_space (:863-930): permutation of the direction grid
  into a camera's view space,
- normalize_points_in_prediction_box (:788-797).
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp

from ..geometry.spherical import get_cartesian_coords, get_spherical_coords
from ..geometry.cameras import camera_center


def _direction_indices(rays: jnp.ndarray, n_elev: int, n_azim: int,
                       symmetric_clamp: bool = False):
    """Discretize ray directions into the (n_elev, n_azim) grid, flattened.

    Mirrors the floor-divide + round-to-nearest + clamping of
    compute_view_state (:828-847). REFERENCE QUIRK kept for parity
    (symmetric_clamp=False): the elevation clamp there is
    [-n_elev//2, n_elev-1] followed by a flat mod, so near-vertical UPWARD
    rays (elev above the top bin, e.g. > 78.75 deg at n_elev=7) wrap to
    the bottom rows of the grid. move_view_state_to_view_space (:915-917)
    instead clamps symmetrically to +-n_elev//2 — pass
    symmetric_clamp=True for that variant. Both behaviors are the
    reference's own; SCONE pretraining/inference must stay consistent
    with them.
    """
    _, elev, azim = get_spherical_coords(rays)
    elev_step = math.pi / (n_elev + 1)
    azim_step = 2 * math.pi / n_azim

    idx_elev = jnp.floor_divide(elev, elev_step)
    idx_azim = jnp.floor_divide(azim, azim_step)
    idx_elev = jnp.where(jnp.mod(elev, elev_step) > elev_step / 2.0,
                         idx_elev + 1, idx_elev)
    idx_azim = jnp.where(jnp.mod(azim, azim_step) > azim_step / 2.0,
                         idx_azim + 1, idx_azim)
    hi = n_elev // 2 if symmetric_clamp else n_elev - 1
    idx_elev = jnp.clip(idx_elev, -(n_elev // 2), hi)
    idx_azim = jnp.where(idx_azim > n_azim // 2, -(n_azim // 2), idx_azim)
    idx_elev = idx_elev + n_elev // 2
    idx_azim = jnp.where(idx_azim < 0, idx_azim + n_azim, idx_azim)
    indices = idx_elev.astype(jnp.int32) * n_azim + idx_azim.astype(jnp.int32)
    return jnp.mod(indices, n_elev * n_azim)


@functools.partial(jax.jit, static_argnames=("n_elev", "n_azim"))
def compute_view_state(pts: jnp.ndarray, X_view: jnp.ndarray,
                       n_elev: int = 7, n_azim: int = 14) -> jnp.ndarray:
    """pts (B, N, >=3), X_view (V, 3) -> view state (B, N, n_elev*n_azim)."""
    rays = X_view[None, None, :, :] - pts[:, :, None, :3]
    idx = _direction_indices(rays, n_elev, n_azim)  # (B, N, V)
    n_dir = n_elev * n_azim
    onehot = jax.nn.one_hot(idx, n_dir, dtype=jnp.float32)
    return jnp.minimum(jnp.sum(onehot, axis=2), 1.0)


@functools.partial(jax.jit, static_argnames=("n_elev", "n_azim"))
def compute_view_harmonics(view_state: jnp.ndarray,
                           base_harmonics: jnp.ndarray,
                           h_polar: jnp.ndarray,
                           n_elev: int = 7, n_azim: int = 14) -> jnp.ndarray:
    """Spherical L2 projection of the view state (B, N, V) onto the harmonic
    basis (n_harm, V) -> (B, N, n_harm)."""
    polar_step = math.pi / (n_elev + 1)
    azim_step = 2 * math.pi / n_azim
    w = jnp.sin(h_polar) * polar_step * azim_step  # (V,)
    return jnp.einsum("bnv,hv->bnh", view_state * w[None, None, :],
                      base_harmonics)


@functools.partial(jax.jit, static_argnames=("n_elev", "n_azim"))
def view_space_permutation(R: jnp.ndarray, T: jnp.ndarray,
                           n_elev: int = 7, n_azim: int = 14) -> jnp.ndarray:
    """(V,) gather indices rotating a view state into a camera's view space
    (move_view_state_to_view_space, :863-930)."""
    n_view = n_elev * n_azim
    elev = jnp.asarray(
        [-90.0 + (i + 1) / (n_elev + 1) * 180.0 for i in range(n_elev)
         for _ in range(n_azim)]
    )
    azim = jnp.asarray(
        [360.0 * j / n_azim for _ in range(n_elev) for j in range(n_azim)]
    )
    X_ref = get_cartesian_coords(jnp.ones(n_view), elev, azim, in_degrees=True)
    # world = view @ R^T - ... : inverse view transform of points, minus the
    # camera center (pure rotation back to world directions).
    eye = camera_center(R, T)
    world = (X_ref - T[None, :]) @ R.T  # inverse of X@R+T
    dirs = world - eye[None, :]

    # Same discretization core as compute_view_state; the reference clamps
    # elevation SYMMETRICALLY here (:915-917), unlike the state builder.
    return _direction_indices(dirs, n_elev, n_azim, symmetric_clamp=True)


def normalize_points_in_prediction_box(points, box_center, box_diag):
    return (points - box_center) / box_diag
