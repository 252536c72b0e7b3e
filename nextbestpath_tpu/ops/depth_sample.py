"""Bilinear depth-map sampling and signed distances to depth surfaces.

Port of Camera.get_signed_distance_to_depth_maps
(macarons/utility/macarons_utils.py:2900-2949): project 3D points into the
camera, bilinearly sample the depth map at the projected (normalized) pixel
coordinates (torch.nn.functional.grid_sample semantics: align_corners=False,
padding_mode='border'), and return point_view_z - sampled_depth. Positive =
the point lies behind the observed surface (the space-carving signal).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..geometry.cameras import CameraIntrinsics, project_points, world_to_view


def grid_sample_bilinear(img: jnp.ndarray, gx: jnp.ndarray, gy: jnp.ndarray
                         ) -> jnp.ndarray:
    """torch.grid_sample(align_corners=False, padding_mode='border') on a
    single-channel image. img (H, W); gx/gy normalized coords in [-1, 1]
    (gx indexes width, gy height). Returns samples of gx/gy's shape."""
    H, W = img.shape
    u = ((gx + 1.0) * W - 1.0) / 2.0
    v = ((gy + 1.0) * H - 1.0) / 2.0
    u = jnp.clip(u, 0.0, W - 1.0)
    v = jnp.clip(v, 0.0, H - 1.0)
    u0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, W - 2)
    v0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, H - 2)
    du = u - u0
    dv = v - v0
    i00 = img[v0, u0]
    i01 = img[v0, u0 + 1]
    i10 = img[v0 + 1, u0]
    i11 = img[v0 + 1, u0 + 1]
    return (
        i00 * (1 - du) * (1 - dv)
        + i01 * du * (1 - dv)
        + i10 * (1 - du) * dv
        + i11 * du * dv
    )


@functools.partial(jax.jit, static_argnames=("intr",))
def signed_distance_to_depth(points: jnp.ndarray, zbuf: jnp.ndarray,
                             R: jnp.ndarray, T: jnp.ndarray,
                             intr: CameraIntrinsics) -> jnp.ndarray:
    """(N,) signed distance of each point to the depth surface.

    Masked (background) pixels are treated as depth 1.1 * zfar like the
    reference (:2927). The normalized sampling grid uses the reference's
    factor = -min(H, W): gx = factor/W * x_proj, gy = factor/H * y_proj.
    """
    H, W = intr.image_height, intr.image_width
    depth = jnp.where(zbuf > -1.0, zbuf, 1.1 * intr.zfar)
    pv = world_to_view(points, R, T)
    z = pv[..., 2]
    proj = project_points(points, R, T, intr.tan_half_fov)
    factor = -float(min(H, W))
    gx = factor / W * proj[..., 0]
    gy = factor / H * proj[..., 1]
    map_z = grid_sample_bilinear(depth, gx, gy)
    return z - map_z
