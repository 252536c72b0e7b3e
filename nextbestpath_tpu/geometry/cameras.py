"""FoV perspective camera math matching the reference's PyTorch3D conventions.

Conventions reproduced (all verified in tests/test_cameras.py):

* Row-vector world-to-view transform ``X_view = X_world @ R + T`` with
  ``T = -eye @ R`` (PyTorch3D ``look_at_view_transform``; used via
  ``get_camera_RT`` in macarons/utility/macarons_utils.py:940-957).
* Look-at axes: ``z = normalize(at - eye)``, ``x = normalize(cross(up, z))``,
  ``y = cross(z, x)`` with ``up = (0, 1, 0)``; R's *columns* are the axes.
  Note +x points LEFT in image space.
* Camera direction from a 5-D pose ``(x, y, z, elev, azim)``:
  ``dir = (cos e sin a, sin e, cos e cos a)`` — this is
  ``-get_cartesian_coords(1, -elev, 180+azim)`` simplified
  (macarons_utils.py:948-951).
* FoV projection with fov=60 deg, aspect=1 (PyTorch3D FoVPerspectiveCameras
  defaults): ``x_proj = x_view / (tan(fov/2) * z_view)`` and same for y.
* Non-square NDC pixel tables with the reference's exact ``(m-1)`` divisor
  (macarons_utils.py:2270-2279)::

      ndc_x[j] = W/m - 2*j/(m-1)      (column j, decreasing left->right)
      ndc_y[i] = H/m - 2*i/(m-1)      (row i,    decreasing top->bottom)
      m = min(H, W)

* Unprojection treats the depth channel as *view-space z*
  (``unproject_points(..., scaled_depth_input=False)``,
  macarons_utils.py:2788-2809). We build pixel rays in view space as
  ``d_view = (ndc_x*tan(fov/2), ndc_y*tan(fov/2), 1)`` so the ray parameter t
  equals view-space z; then ``world = eye + z * (d_view @ R^T)``.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


DEFAULT_FOV_DEGREES = 60.0

# Geometry must not silently run in bf16: this JAX build defaults matmuls to
# bfloat16 precision (~0.4% relative error, which breaks pixel-exact
# project/unproject roundtrips). All dots here request full f32.
_F32 = jax.lax.Precision.HIGHEST


def _mat3(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a @ b with forced f32 precision (... x 3) @ (3 x 3 or ...)."""
    return jnp.matmul(a, b, precision=_F32)


def camera_ray_from_pose_angles(elev_deg, azim_deg):
    """Unit view direction for pose angles (degrees). Shape (..., 3)."""
    e = jnp.deg2rad(jnp.asarray(elev_deg))
    a = jnp.deg2rad(jnp.asarray(azim_deg))
    return jnp.stack(
        [jnp.cos(e) * jnp.sin(a), jnp.sin(e), jnp.cos(e) * jnp.cos(a)], axis=-1
    )


def look_at_rotation(eye: jnp.ndarray, at: jnp.ndarray, up=(0.0, 1.0, 0.0)):
    """PyTorch3D-convention look-at rotation. eye/at: (..., 3) -> R (..., 3, 3).

    R columns are the camera axes expressed in world coordinates; world-to-view
    is ``X_view = (X_world - eye) @ R``.
    """
    eye = jnp.asarray(eye, jnp.float32)
    at = jnp.asarray(at, jnp.float32)
    up = jnp.broadcast_to(jnp.asarray(up, jnp.float32), eye.shape)

    def _norm(v):
        return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)

    z_axis = _norm(at - eye)
    # Exact PyTorch3D semantics (renderer/cameras.py look_at_rotation):
    # F.normalize(cross, eps=1e-5), then substitute only when the
    # NORMALIZED x has all components < 5e-3 — i.e. only when up is
    # essentially parallel to z (||cross|| < ~1e-7). A check on the
    # unnormalized cross norm would fire within ~0.3 deg of vertical and
    # snap the camera roll discontinuously. y is computed BEFORE the
    # substitution and not recomputed, matching the reference; the
    # replacement is normalize(cross(y, z)).
    x_raw = jnp.cross(up, z_axis)
    x_axis = x_raw / jnp.maximum(
        jnp.linalg.norm(x_raw, axis=-1, keepdims=True), 1e-5)
    y_axis = _norm(jnp.cross(z_axis, x_axis))
    is_close = jnp.all(jnp.abs(x_axis) < 5e-3, axis=-1, keepdims=True)
    replacement = _norm(jnp.cross(y_axis, z_axis))
    x_axis = jnp.where(is_close, replacement, x_axis)
    # Stack as rows then transpose -> columns are axes.
    return jnp.stack([x_axis, y_axis, z_axis], axis=-2).swapaxes(-1, -2)


def get_camera_RT(X_cam: jnp.ndarray, V_cam: jnp.ndarray):
    """R, T for camera centers X_cam (N,3) and (elev, azim) degrees V_cam (N,2).

    Reference: get_camera_RT (macarons_utils.py:940-957).
    """
    rays = camera_ray_from_pose_angles(V_cam[..., 0], V_cam[..., 1])
    R = look_at_rotation(X_cam, X_cam + rays)
    T = -jnp.einsum("...i,...ij->...j", X_cam, R, precision=_F32)
    return R, T


def ndc_tables(image_height: int, image_width: int):
    """The reference's per-pixel NDC coordinate tables (macarons_utils.py:2270-2279).

    Returns (ndc_x[H, W], ndc_y[H, W]).
    """
    m = min(image_height, image_width)
    jj = jnp.arange(image_width, dtype=jnp.float32)
    ii = jnp.arange(image_height, dtype=jnp.float32)
    ndc_x_row = image_width / m - (jj / (m - 1)) * 2.0
    ndc_y_col = image_height / m - (ii / (m - 1)) * 2.0
    ndc_x = jnp.broadcast_to(ndc_x_row[None, :], (image_height, image_width))
    ndc_y = jnp.broadcast_to(ndc_y_col[:, None], (image_height, image_width))
    return ndc_x, ndc_y


def ndc_bounds(image_height: int, image_width: int):
    """(min_x, max_x, min_y, max_y) of the NDC tables (corner pixel centers)."""
    m = min(image_height, image_width)
    max_x = image_width / m
    min_x = image_width / m - 2.0 * (image_width - 1) / (m - 1)
    max_y = image_height / m
    min_y = image_height / m - 2.0 * (image_height - 1) / (m - 1)
    return min_x, max_x, min_y, max_y


@dataclasses.dataclass(frozen=True)
class CameraIntrinsics:
    """Static intrinsics shared by every camera in a run."""

    image_height: int = 256
    image_width: int = 456
    fov_degrees: float = DEFAULT_FOV_DEGREES
    znear: float = 1.0  # PyTorch3D FoVPerspectiveCameras default
    zfar: float = 750.0

    @property
    def tan_half_fov(self) -> float:
        return math.tan(math.radians(self.fov_degrees) / 2.0)

    def pixel_ray_dirs_view(self) -> jnp.ndarray:
        """(H, W, 3) view-space ray directions with d_z == 1."""
        ndc_x, ndc_y = ndc_tables(self.image_height, self.image_width)
        t = self.tan_half_fov
        return jnp.stack([ndc_x * t, ndc_y * t, jnp.ones_like(ndc_x)], axis=-1)


def world_to_view(points: jnp.ndarray, R: jnp.ndarray, T: jnp.ndarray):
    """(N,3) world -> view. Row-vector convention: X@R + T."""
    return _mat3(points, R) + T


def view_to_world_dirs(dirs_view: jnp.ndarray, R: jnp.ndarray):
    """View-space directions -> world (rotation only): d @ R^T."""
    return _mat3(dirs_view, R.T)


def project_points(points: jnp.ndarray, R: jnp.ndarray, T: jnp.ndarray,
                   tan_half_fov: float):
    """World points -> (x_proj, y_proj, z_view). Perspective divide by z_view."""
    pv = world_to_view(points, R, T)
    z = pv[..., 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    x = pv[..., 0] / (tan_half_fov * safe_z)
    y = pv[..., 1] / (tan_half_fov * safe_z)
    return jnp.stack([x, y, z], axis=-1)


def unproject_depth(depth: jnp.ndarray, R: jnp.ndarray, T: jnp.ndarray,
                    intr: CameraIntrinsics):
    """Depth map (H, W) of view-space z -> world points (H*W, 3).

    Exact analog of Camera.project_depth_in_3D (macarons_utils.py:2788-2809).
    """
    eye = camera_center(R, T)
    d_view = intr.pixel_ray_dirs_view()  # (H, W, 3), z-component 1
    d_world = _mat3(d_view.reshape(-1, 3), R.T)
    return eye[None, :] + depth.reshape(-1, 1) * d_world


def points_in_fov_mask(points: jnp.ndarray, R: jnp.ndarray, T: jnp.ndarray,
                       intr: CameraIntrinsics,
                       fov_range: Optional[float] = None,
                       eye: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Boolean mask of points inside the camera frustum (and range).

    Analog of Camera.get_points_in_fov (macarons_utils.py:2849-2884):
    projection within the NDC table bounds and view z > 0; optionally
    ||p - eye|| < fov_range.
    """
    proj = project_points(points, R, T, intr.tan_half_fov)
    min_x, max_x, min_y, max_y = ndc_bounds(intr.image_height, intr.image_width)
    mask = (
        (proj[..., 0] >= min_x)
        & (proj[..., 0] <= max_x)
        & (proj[..., 1] >= min_y)
        & (proj[..., 1] <= max_y)
        & (proj[..., 2] > 0.0)
    )
    if fov_range is not None:
        if eye is None:
            eye = camera_center(R, T)
        mask = mask & (jnp.linalg.norm(points - eye, axis=-1) < fov_range)
    return mask


def camera_center(R: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    """Recover eye from (R, T): eye = -T @ R^T."""
    return _mat3(-T, R.T)
