"""Spherical/cartesian conversions with the reference's elev/azim convention.

Convention (reference macarons/utility/CustomGeometry.py:5-45):
    x = r * cos(elev) * sin(azim)
    y = r * sin(elev)
    z = r * cos(elev) * cos(azim)
elev in [-pi/2, pi/2], azim measured from +z toward +x.
"""

from __future__ import annotations

import jax.numpy as jnp

_DEG = jnp.pi / 180.0


def get_cartesian_coords(r, elev, azim, in_degrees: bool = False):
    """(r, elev, azim) -> (N, 3) cartesian. Inputs broadcastable to (N,)."""
    f = _DEG if in_degrees else 1.0
    e = jnp.asarray(elev) * f
    a = jnp.asarray(azim) * f
    r = jnp.asarray(r)
    x = jnp.cos(e) * jnp.sin(a)
    y = jnp.sin(e)
    z = jnp.cos(e) * jnp.cos(a)
    pts = jnp.stack([x, y, z], axis=-1)
    return (jnp.reshape(r, r.shape + (1,) * (pts.ndim - r.ndim)) * pts).reshape(-1, 3)


def get_spherical_coords(X):
    """(N, 3) cartesian -> (r, elev, azim), radians.

    Matches the clamping behavior of the reference (CustomGeometry.py:27-45):
    elev clamped to +-pi/2, azim sign follows x.
    """
    X = jnp.asarray(X)
    r = jnp.linalg.norm(X, axis=-1)
    sin_e = jnp.clip(X[..., 1] / jnp.maximum(r, 1e-12), -1.0, 1.0)
    elev = jnp.arcsin(sin_e)
    cos_e = jnp.cos(elev)
    cos_a = jnp.clip(X[..., 2] / jnp.maximum(r * cos_e, 1e-12), -1.0, 1.0)
    azim = jnp.arccos(cos_a)
    azim = jnp.where(X[..., 0] < 0, -azim, azim)
    return r, elev, azim


def sample_cameras_on_sphere(n_x: int, radius: float):
    """Deterministic camera grid on a sphere (CustomGeometry.py:47-77).

    n_x should be a square; thetas/phis span +-0.9*pi and +-0.9*2pi on a
    sqrt(n_x) x sqrt(n_x) grid like the reference.
    """
    import math

    n_dim = int(math.isqrt(n_x))
    delta_theta = 0.9 * jnp.pi
    delta_phi = 0.9 * 2 * jnp.pi
    inc = jnp.linspace(0.0, n_dim - 1.0, n_dim)
    thetas = -delta_theta + inc * (2 * delta_theta / (n_dim - 1))
    phis = -delta_phi + inc * (2 * delta_phi / (n_dim - 1))
    tt = thetas[:, None]
    pp = phis[None, :]
    x = jnp.cos(tt) * jnp.sin(pp)
    y = jnp.sin(tt) * jnp.ones_like(pp)
    z = jnp.cos(tt) * jnp.cos(pp)
    return radius * jnp.stack(
        [jnp.broadcast_to(x, (n_dim, n_dim)),
         jnp.broadcast_to(y, (n_dim, n_dim)),
         jnp.broadcast_to(z, (n_dim, n_dim))], axis=-1).reshape(-1, 3)
