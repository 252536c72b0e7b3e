"""Egocentric 2D projection ops for the NBP model inputs.

Replaces the reference's mapping ops (next_best_path/utility/utils.py):
- transform_points_to_n_pieces (:166-196): world -> egocentric frame
  (translation only; azimuth forced to 0 via no_rotation=True), 2D output
  coordinates (-dz, -dx),
- get_point_position_in_the_img (:160-164) and map_points_to_n_imgs
  (:198-223): round + scale into an image grid, scatter-accumulate counts,
- the y-axis height binning via torch.bucketize (nbp_planning.py:114-115).

All ops take fixed-capacity point buffers with validity masks.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# Chunk length for count-bounded scatters. Point buffers are append-only
# with a valid [0, count) prefix (sim/sensor.py PointBuffer), so scattering
# chunk-by-chunk up to ceil(count / chunk) skips the (often large) invalid
# tail: early in a rollout the 2M-capacity buffer is nearly empty and the
# every-pose projection pays only for what it holds.
_SCATTER_CHUNK = 131072


def _count_bounded_add(out: jnp.ndarray, idx_arrays, ok: jnp.ndarray,
                       count: jnp.ndarray, chunk: int = _SCATTER_CHUNK
                       ) -> jnp.ndarray:
    """out.at[idx_arrays].add(ok) over the first ceil(count/chunk) chunks."""
    n = ok.shape[0]
    if n <= chunk:
        return out.at[tuple(idx_arrays)].add(ok.astype(out.dtype))
    n_chunks = (n + chunk - 1) // chunk
    pad = n_chunks * chunk - n
    if pad:
        idx_arrays = [jnp.pad(a, (0, pad)) for a in idx_arrays]
        ok = jnp.pad(ok, (0, pad))  # padded slots: False -> adds 0
    needed = (jnp.minimum(count, n) + chunk - 1) // chunk

    def body(carry):
        img, i = carry
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, i * chunk, chunk)
        idxs = tuple(sl(a) for a in idx_arrays)
        img = img.at[idxs].add(sl(ok).astype(img.dtype))
        return img, i + 1

    out, _ = jax.lax.while_loop(lambda c: c[1] < needed, body,
                                (out, jnp.int32(0)))
    return out


def ego2d(points: jnp.ndarray, cam_xyz: jnp.ndarray) -> jnp.ndarray:
    """World points (N, 3) -> egocentric 2D (N, 2) = (-(z-zc), -(x-xc)).

    Reference transform_points_to_n_pieces with no_rotation=True
    (utils.py:166-196): R = I, cP = p - cam, output rows (-cP_z, -cP_x).
    """
    d = points - cam_xyz[None, :]
    return jnp.stack([-d[:, 2], -d[:, 0]], axis=-1)


def img_coords(points_2d: jnp.ndarray, grid_size: int,
               grid_range: Tuple[float, float]) -> jnp.ndarray:
    """2D coords -> integer pixel (row=x_mapped, col=y_mapped), int32 (N, 2).

    scale = grid_size / (hi - lo); index = round((p - lo) * scale)
    (utils.py:160-164, 198-223).
    """
    lo, hi = grid_range
    scale = grid_size / (hi - lo)
    return jnp.round((points_2d - lo) * scale).astype(jnp.int32)


def scatter_count_img(points_2d: jnp.ndarray, valid: jnp.ndarray,
                      grid_size: int, grid_range: Tuple[float, float],
                      count: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Scatter-accumulate point counts into a (grid_size, grid_size) image.

    Equivalent to map_points_to_n_imgs for a single batch (utils.py:198-223):
    out-of-range points are dropped. `count` (for prefix-compacted buffers)
    bounds the scatter to the valid prefix — exact, since slots past count
    are invalid anyway.
    """
    ij = img_coords(points_2d, grid_size, grid_range)
    ok = (
        valid
        & (ij[:, 0] >= 0) & (ij[:, 0] < grid_size)
        & (ij[:, 1] >= 0) & (ij[:, 1] < grid_size)
    )
    ij = jnp.clip(ij, 0, grid_size - 1)
    img = jnp.zeros((grid_size, grid_size), jnp.float32)
    if count is None:
        return img.at[ij[:, 0], ij[:, 1]].add(ok.astype(jnp.float32))
    return _count_bounded_add(img, [ij[:, 0], ij[:, 1]], ok, count)


def height_bins(verts_min_y: jnp.ndarray, verts_max_y: jnp.ndarray,
                n_pieces: int = 4) -> jnp.ndarray:
    """y_bins boundaries, (n_pieces + 1,).

    Reference (nbp_utils.py:506-513): min_y = verts.min+0.5,
    max_y = verts.max-0.5, bin_width = (max-min)/n, bins = arange(min, max+w, w).
    """
    min_y = verts_min_y + 0.5
    max_y = verts_max_y - 0.5
    w = (max_y - min_y) / n_pieces
    return min_y + w * jnp.arange(n_pieces + 1, dtype=jnp.float32)


def bucketize_bins(y: jnp.ndarray, y_bins: jnp.ndarray) -> jnp.ndarray:
    """torch.bucketize(y, y_bins[:-1]) - 1 (nbp_planning.py:114).

    torch.bucketize with right=False == searchsorted(side='left').
    Result -1 means 'below the first boundary' (dropped by the caller).
    """
    return jnp.searchsorted(y_bins[:-1], y, side="left").astype(jnp.int32) - 1


def binned_count_imgs(points: jnp.ndarray, valid: jnp.ndarray,
                      cam_xyz: jnp.ndarray, y_bins: jnp.ndarray,
                      n_pieces: int, grid_size: int,
                      grid_range: Tuple[float, float],
                      count: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """(n_pieces, S, S) count images of a point buffer split by height bin.

    Fuses the reference's per-bin Python loop (nbp_planning.py:113-125) into
    one scatter.
    """
    p2 = ego2d(points, cam_xyz)
    ij = img_coords(p2, grid_size, grid_range)
    b = bucketize_bins(points[:, 1], y_bins)
    ok = (
        valid
        & (b >= 0) & (b < n_pieces)
        & (ij[:, 0] >= 0) & (ij[:, 0] < grid_size)
        & (ij[:, 1] >= 0) & (ij[:, 1] < grid_size)
    )
    b = jnp.clip(b, 0, n_pieces - 1)
    ij = jnp.clip(ij, 0, grid_size - 1)
    out = jnp.zeros((n_pieces, grid_size, grid_size), jnp.float32)
    if count is None:
        return out.at[b, ij[:, 0], ij[:, 1]].add(ok.astype(jnp.float32))
    return _count_bounded_add(out, [b, ij[:, 0], ij[:, 1]], ok, count)


def count_img(points: jnp.ndarray, valid: jnp.ndarray, cam_xyz: jnp.ndarray,
              grid_size: int, grid_range: Tuple[float, float],
              count: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Single count image of a 3D point buffer (no height split)."""
    return scatter_count_img(ego2d(points, cam_xyz), valid, grid_size,
                             grid_range, count=count)


def plan_count_imgs(points: jnp.ndarray, valid: jnp.ndarray,
                    cam_xyz: jnp.ndarray, y_bins: jnp.ndarray,
                    band_center: jnp.ndarray, n_pieces: int, grid_size: int,
                    grid_range: Tuple[float, float],
                    count: Optional[jnp.ndarray] = None,
                    band_halfwidth: float = 0.1) -> jnp.ndarray:
    """All plan-phase count images of one point buffer in a single scatter.

    Returns (n_pieces + 2, S, S):
      [0:n_pieces]   height-binned count images (== binned_count_imgs),
      [n_pieces]     counts of valid in-image points whose height bin falls
                     OUTSIDE [0, n_pieces) — so that the full-pc projection
                     (fuse_layout's ``proj``) is the channel-sum over
                     [0:n_pieces+1],
      [n_pieces + 1] the current-height slice |y - band_center| < 0.1
                     (fuse_layout's ``filt``).

    The eval plan phase needs bins + proj + filt of the SAME buffer
    (nbp_planning.py:111-132,166-191); computing them as three scatters
    walks the (up to 2M-slot) buffer three times. Here each point carries
    two interleaved scatter entries (its bin-or-overflow channel and its
    height-band channel), one pass, exact count parity: counts are small
    integers in f32, so add order cannot change them.
    """
    p2 = ego2d(points, cam_xyz)
    ij = img_coords(p2, grid_size, grid_range)
    b = bucketize_bins(points[:, 1], y_bins)
    in_img = (
        valid
        & (ij[:, 0] >= 0) & (ij[:, 0] < grid_size)
        & (ij[:, 1] >= 0) & (ij[:, 1] < grid_size)
    )
    in_bin = (b >= 0) & (b < n_pieces)
    c1 = jnp.where(in_bin, jnp.clip(b, 0, n_pieces - 1), n_pieces)
    ok1 = in_img
    band = ((points[:, 1] < band_center + band_halfwidth)
            & (points[:, 1] > band_center - band_halfwidth))
    c2 = jnp.full_like(c1, n_pieces + 1)
    ok2 = in_img & band
    ij_c = jnp.clip(ij, 0, grid_size - 1)

    # Interleave the two entry sets point-by-point so a valid-prefix buffer
    # keeps a valid-prefix entry array (count-bounding works with 2*count).
    def weave(a1, a2):
        return jnp.stack([a1, a2], axis=1).reshape(-1)

    ch = weave(c1, c2)
    ii = weave(ij_c[:, 0], ij_c[:, 0])
    jj = weave(ij_c[:, 1], ij_c[:, 1])
    ok = weave(ok1, ok2)
    out = jnp.zeros((n_pieces + 2, grid_size, grid_size), jnp.float32)
    if count is None:
        return out.at[ch, ii, jj].add(ok.astype(jnp.float32))
    return _count_bounded_add(out, [ch, ii, jj], ok, 2 * count)


def scatter_mean_img(points_2d: jnp.ndarray, values: jnp.ndarray,
                     valid: jnp.ndarray, grid_size: int,
                     grid_range: Tuple[float, float]) -> jnp.ndarray:
    """Averaged-value scatter: each pixel holds the MEAN of the values of
    the points that land in it (zero where empty).

    Analog of the reference's averaged-occupancy projection
    (map_points_to_grid_optimized_poster, next_best_path/utility/utils.py
    :319-358: index_put_ accumulate of values and of ones, then divide where
    count > 0); its y-chunked companion batch_transform_points_optimized_poster
    (:266-317) is covered by ego2d + bucketize_bins. Used to project a proxy
    occupancy field into the planner's 2-D frame.
    """
    ij = img_coords(points_2d, grid_size, grid_range)
    ok = (
        valid
        & (ij[:, 0] >= 0) & (ij[:, 0] < grid_size)
        & (ij[:, 1] >= 0) & (ij[:, 1] < grid_size)
    )
    ij = jnp.clip(ij, 0, grid_size - 1)
    zeros = jnp.zeros((grid_size, grid_size), jnp.float32)
    acc = zeros.at[ij[:, 0], ij[:, 1]].add(
        jnp.where(ok, values.reshape(-1), 0.0))
    cnt = zeros.at[ij[:, 0], ij[:, 1]].add(ok.astype(jnp.float32))
    return jnp.where(cnt > 0, acc / jnp.maximum(cnt, 1.0), 0.0)
