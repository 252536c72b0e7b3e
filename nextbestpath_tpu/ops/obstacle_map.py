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


def _section_from_abc(a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray,
                      n_tris, y: jnp.ndarray
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    F = a.shape[0]

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


def plane_section_segments(tris: jnp.ndarray, n_tris, y: jnp.ndarray
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Intersect (F, 3, 3) triangles with the plane Y = y.

    Returns (segments (F, 2, 2) in (x, z), valid (F,)). Each triangle
    crossing the plane yields one segment between its two crossing edges.
    """
    return _section_from_abc(tris[:, 0], tris[:, 1], tris[:, 2], n_tris, y)


def plane_section_segments_soa(tri_soa: jnp.ndarray, n_tris, y: jnp.ndarray
                               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """plane_section_segments on the (9, F) SoA (v0, e1, e2) the ray kernel
    and scan programs already hold — jitted scan bodies should use this
    instead of rebuilding the dense (F, 3, 3) form every pose (XLA does not
    hoist loop-invariant work out of scan bodies)."""
    v0 = tri_soa[0:3].T
    return _section_from_abc(v0, v0 + tri_soa[3:6].T, v0 + tri_soa[6:9].T,
                             n_tris, y)


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

    # Liang-Barsky clip to the grid box BEFORE computing the step count:
    # without clipping, a wall chord much longer than the visible window
    # still spends its MAX_STEPS budget on the off-screen extent, and the
    # on-screen part gets sample spacing > 1 px — a dotted line in a
    # training target. After clipping the visible extent is <= the grid
    # diagonal (362 px at S=256) < MAX_STEPS, so spacing stays <= 1 px.
    # Clip to the pixel CENTER range [0, S-1], not the half-pixel border:
    # border clipping lands every sample exactly on x.5 coordinates where
    # round-half-to-even merges neighbor pairs (every other column missed).
    lo_b, hi_b = 0.0, float(grid_size - 1)
    t0 = jnp.zeros_like(dr)
    t1 = jnp.ones_like(dr)
    reject = jnp.zeros_like(valid)
    for p_k, q_k in ((-dr, r0 - lo_b), (dr, hi_b - r0),
                     (-dc, c0 - lo_b), (dc, hi_b - c0)):
        ratio = q_k / jnp.where(jnp.abs(p_k) < 1e-12, 1e-12, p_k)
        t0 = jnp.where(p_k < -1e-12, jnp.maximum(t0, ratio), t0)
        t1 = jnp.where(p_k > 1e-12, jnp.minimum(t1, ratio), t1)
        reject = reject | ((jnp.abs(p_k) <= 1e-12) & (q_k < 0.0))
    valid = valid & (~reject) & (t0 <= t1)
    r0 = r0 + dr * t0
    c0 = c0 + dc * t0
    dr = dr * (t1 - t0)
    dc = dc * (t1 - t0)

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


def gt_obstacle_map_soa(tri_soa: jnp.ndarray, n_tris, cam_pose5: jnp.ndarray,
                        grid_size: int = 256,
                        grid_range: Tuple[float, float] = (-40.0, 40.0),
                        stroke_dilation: bool = True) -> jnp.ndarray:
    """gt_obstacle_map straight from the shared (9, F) SoA buffer."""
    seg, valid = plane_section_segments_soa(tri_soa, n_tris, cam_pose5[1])
    img = rasterize_segments(seg, valid, cam_pose5[0], cam_pose5[2],
                             grid_size=grid_size, grid_range=grid_range)
    if stroke_dilation:
        img = dilate2(img)
    return img
