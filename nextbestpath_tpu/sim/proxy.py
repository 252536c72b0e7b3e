"""Proxy-point occupancy field (the MACARONS volumetric state).

Fixed-array port of the proxy-point machinery in the reference Scene class
(macarons/utility/macarons_utils.py:3246-3466):

* uniform proxy samples in the scene bbox with predicted probability,
  pseudo-GT supervision occupancy by space carving (behind-depth ratio >=
  score_threshold, update_proxy_supervision_occ :3338-3363),
* per-point view-state direction grids (update_proxy_view_states :3268-3327),
* out-of-field flags (:3329-3336),
* camera collision tests against occupied proxies near the interpolated ray
  (camera_collides :3426-3466).

Everything is a pure function over a ProxyField pytree — one fused update per
frame instead of the reference's masked in-place edits.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..geometry.cameras import CameraIntrinsics, points_in_fov_mask
from ..ops.depth_sample import signed_distance_to_depth
from ..ops.view_state import compute_view_state


class ProxyField(NamedTuple):
    points: jnp.ndarray           # (P, 3)
    proba: jnp.ndarray            # (P, 1) predicted occupancy
    supervision_occ: jnp.ndarray  # (P, 1) carving pseudo-GT
    view_states: jnp.ndarray      # (P, n_elev*n_azim)
    n_inside_fov: jnp.ndarray     # (P, 1)
    n_behind_depth: jnp.ndarray   # (P, 1)
    out_of_field: jnp.ndarray     # (P, 1)
    distance_between_points: jnp.ndarray  # scalar

    @staticmethod
    def create(key: jax.Array, x_min, x_max, n_points: int,
               n_elev: int = 7, n_azim: int = 14,
               default_proba: float = 0.5) -> "ProxyField":
        x_min = jnp.asarray(x_min)
        x_max = jnp.asarray(x_max)
        pts = x_min + (x_max - x_min) * jax.random.uniform(key, (n_points, 3))
        volume = jnp.prod(x_max - x_min)
        radius = jnp.power(3.0 * (volume / n_points) / (4.0 * math.pi), 1.0 / 3.0)
        return ProxyField(
            points=pts,
            proba=jnp.full((n_points, 1), default_proba),
            supervision_occ=jnp.ones((n_points, 1)),
            view_states=jnp.zeros((n_points, n_elev * n_azim)),
            n_inside_fov=jnp.zeros((n_points, 1)),
            n_behind_depth=jnp.zeros((n_points, 1)),
            out_of_field=jnp.ones((n_points, 1)),
            distance_between_points=2.0 * radius,
        )


@functools.partial(jax.jit, static_argnames=("intr", "n_elev", "n_azim",
                                              "sensor_range"))
def carve_with_frame(field: ProxyField, zbuf: jnp.ndarray, R: jnp.ndarray,
                     T: jnp.ndarray, X_cam: jnp.ndarray,
                     intr: CameraIntrinsics, score_threshold: float = 0.95,
                     carving_tolerance: float = 10.0,
                     n_elev: int = 7, n_azim: int = 14,
                     sensor_range: float = 70.0) -> ProxyField:
    """One frame's carving + view-state + out-of-field update.

    Mirrors the per-pose proxy update block (train_macarons.py:283-306):
    fov mask (range-limited to sensor_range like the reference's
    get_points_in_fov(fov_range=params.sensor_range) at :286 — frustum
    points beyond the sensor must stay untouched, not get carved against
    the 1.1*zfar background), signed distances to the depth map,
    supervision-occ counting with tolerance, view-state update for
    near-surface points.
    """
    fov_mask = points_in_fov_mask(field.points, R, T, intr,
                                  fov_range=sensor_range)
    sgn = signed_distance_to_depth(field.points, zbuf, R, T, intr)

    m = fov_mask[:, None]
    n_inside = field.n_inside_fov + m
    behind = (sgn[:, None] >= -carving_tolerance).astype(jnp.float32)
    n_behind = field.n_behind_depth + behind * m
    sup = jnp.where(
        m,
        ((n_behind / jnp.maximum(n_inside, 1.0)) >= score_threshold)
        .astype(jnp.float32),
        field.supervision_occ,
    )

    near_surface = sgn < 3.0 * field.distance_between_points
    update = fov_mask & near_surface
    vs_new = compute_view_state(field.points[None], X_cam.reshape(-1, 3),
                                n_elev, n_azim)[0]
    view_states = jnp.where(update[:, None],
                            jnp.minimum(field.view_states + vs_new, 1.0),
                            field.view_states)
    oof = jnp.where(m, 0.0, field.out_of_field)
    return field._replace(
        supervision_occ=sup,
        view_states=view_states,
        n_inside_fov=n_inside,
        n_behind_depth=n_behind,
        out_of_field=oof,
    )


@functools.partial(jax.jit, static_argnames=("n_interpolation_steps",
                                              "oof_collides",
                                              "collision_n_threshold"))
def camera_collides(field: ProxyField, x_from: jnp.ndarray, x_to: jnp.ndarray,
                    x_min: jnp.ndarray, x_max: jnp.ndarray,
                    oof_collides: bool = False,
                    collision_n_threshold: int = 6,
                    n_interpolation_steps: int = 4) -> jnp.ndarray:
    """True if moving from x_from to x_to passes near occupied proxies
    (camera_collides, macarons_utils.py:3426-3466)."""
    in_bbox = jnp.all((x_to >= x_min) & (x_to <= x_max))
    t = jnp.linspace(0.0, 1.0, n_interpolation_steps)[:, None]
    ray = x_from[None, :] + t * (x_to - x_from)[None, :]
    d2 = jnp.sum(
        (field.points[:, None, :] - ray[None, :, :]) ** 2, axis=-1
    )
    dist = jnp.sqrt(jnp.min(d2, axis=-1))
    dist_mask = dist < field.distance_between_points
    carved = field.supervision_occ[:, 0] > 0.0
    oof = field.out_of_field[:, 0] > 0.0
    if oof_collides:
        hit = (carved | oof) & dist_mask
    else:
        hit = (carved & ~oof) & dist_mask
    return in_bbox & (jnp.sum(hit) > collision_n_threshold)
