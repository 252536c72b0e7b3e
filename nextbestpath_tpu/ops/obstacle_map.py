"""Ground-truth 2D obstacle (layout) maps from mesh-plane sections.

Replaces the reference's get_binary_obstacle_array
(next_best_path/utility/utils.py:226-262), which renders
trimesh.intersections.mesh_plane segments through matplotlib -> PNG -> PIL
resize/flip/threshold. Here the plane section is computed analytically and
segments are rasterized with a vectorized DDA into the same 256^2 grid and
orientation:

    row = round((-(z - cz) - lo) * S / (hi - lo))
    col = round((-(x - cx) - lo) * S / (hi - lo))

which matches the matplotlib pipeline's final orientation (y-axis up plot ->
row 0 at max z; FLIP_LEFT_RIGHT -> col grows with -x) and the coordinate
convention of the other model input channels (scatter2d.img_coords).
Matplotlib draws ~2 px wide lines (1.5 pt at 100 dpi); we apply one 2x2
dilation to approximate the stroke width (documented delta: anti-aliased
edge pixels may differ).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

MAX_STEPS = 384  # max DDA steps per segment (grid diagonal is 362 at S=256)


def plane_section_segments(tris: jnp.ndarray, n_tris, y: jnp.ndarray
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Intersect triangles with the plane Y = y.

    Returns (segments (F, 2, 2) in (x, z), valid (F,)). Each triangle
    crossing the plane yields one segment between its two crossing edges.
    """
    F = tris.shape[0]
    a = tris[:, 0]
    b = tris[:, 1]
    c = tris[:, 2]

    def edge_cross(p, q):
        dy = q[:, 1] - p[:, 1]
        t = (y - p[:, 1]) / jnp.where(jnp.abs(dy) < 1e-12, 1e-12, dy)
        ok = (jnp.abs(dy) >= 1e-12) & (t >= 0.0) & (t <= 1.0)
        pt = p + t[:, None] * (q - p)
        return pt, ok

    p0, f0 = edge_cross(a, b)
    p1, f1 = edge_cross(b, c)
    p2, f2 = edge_cross(c, a)

    first = jnp.where(f0[:, None], p0, jnp.where(f1[:, None], p1, p2))
    second = jnp.where(
        (f0 & f2)[:, None], p2, jnp.where((f0 & f1)[:, None], p1, p2)
    )
    n_cross = f0.astype(jnp.int32) + f1.astype(jnp.int32) + f2.astype(jnp.int32)
    valid = (n_cross >= 2) & (jnp.arange(F) < n_tris)
    seg = jnp.stack(
        [
            jnp.stack([first[:, 0], first[:, 2]], axis=-1),
            jnp.stack([second[:, 0], second[:, 2]], axis=-1),
        ],
        axis=1,
    )
    return seg, valid


@functools.partial(jax.jit, static_argnames=("grid_size",))
def rasterize_segments(segments: jnp.ndarray, valid: jnp.ndarray,
                       cam_x: jnp.ndarray, cam_z: jnp.ndarray,
                       grid_size: int = 256,
                       grid_range: Tuple[float, float] = (-40.0, 40.0)
                       ) -> jnp.ndarray:
    """Rasterize world-space (x, z) segments into the egocentric layout grid.

    Returns a binary (S, S) f32 image.
    """
    lo, hi = grid_range
    scale = grid_size / (hi - lo)
    # World (x, z) -> continuous grid coords (row, col).
    r0 = (-(segments[:, 0, 1] - cam_z) - lo) * scale
    c0 = (-(segments[:, 0, 0] - cam_x) - lo) * scale
    r1 = (-(segments[:, 1, 1] - cam_z) - lo) * scale
    c1 = (-(segments[:, 1, 0] - cam_x) - lo) * scale

    dr = r1 - r0
    dc = c1 - c0
    steps = jnp.maximum(jnp.abs(dr), jnp.abs(dc))
    n_steps = jnp.clip(jnp.ceil(steps).astype(jnp.int32), 1, MAX_STEPS - 1)
    inv = 1.0 / jnp.maximum(n_steps.astype(jnp.float32), 1.0)

    k = jnp.arange(MAX_STEPS, dtype=jnp.float32)
    frac = k[None, :] * inv[:, None]  # (F, MAX_STEPS)
    rows = jnp.round(r0[:, None] + dr[:, None] * frac).astype(jnp.int32)
    cols = jnp.round(c0[:, None] + dc[:, None] * frac).astype(jnp.int32)
    step_ok = (
        valid[:, None]
        & (jnp.arange(MAX_STEPS)[None, :] <= n_steps[:, None])
        & (rows >= 0) & (rows < grid_size)
        & (cols >= 0) & (cols < grid_size)
    )
    rows = jnp.clip(rows, 0, grid_size - 1)
    cols = jnp.clip(cols, 0, grid_size - 1)
    img = jnp.zeros((grid_size, grid_size), jnp.float32)
    img = img.at[rows.reshape(-1), cols.reshape(-1)].max(
        step_ok.reshape(-1).astype(jnp.float32)
    )
    return img


def dilate2(img: jnp.ndarray) -> jnp.ndarray:
    """2x2 max dilation approximating matplotlib's ~2 px stroke width."""
    padded = jnp.pad(img, ((0, 1), (0, 1)))
    return jnp.maximum(
        jnp.maximum(padded[:-1, :-1], padded[1:, :-1]),
        jnp.maximum(padded[:-1, 1:], padded[1:, 1:]),
    )


def gt_obstacle_map(tris: jnp.ndarray, n_tris, cam_pose5: jnp.ndarray,
                    grid_size: int = 256,
                    grid_range: Tuple[float, float] = (-40.0, 40.0),
                    stroke_dilation: bool = True) -> jnp.ndarray:
    """GT binary layout map at the camera's height (utils.py:226-262)."""
    seg, valid = plane_section_segments(tris, n_tris, cam_pose5[1])
    img = rasterize_segments(seg, valid, cam_pose5[0], cam_pose5[2],
                             grid_size=grid_size, grid_range=grid_range)
    if stroke_dilation:
        img = dilate2(img)
    return img
