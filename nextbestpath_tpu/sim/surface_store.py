"""Voxel-deduplicated surface store with coverage state.

Fixed-array analog of the reference's Scene/Cell spatial-hash point store
(macarons/utility/macarons_utils.py:2952-3243): points are deduplicated at a
spatial resolution and carry a per-point 'covered' feature used by
camera_coverage_gain (:3468-3510) and scene_coverage (:3512-3539).

Design delta (documented): the reference dedups by min-distance against the
points already in a cell and randomly evicts above a per-cell capacity; here
a point occupies a voxel of side `resolution` and at most one point is kept
per voxel (first write wins). Same point density scale, fully vectorized.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

_F32 = jax.lax.Precision.HIGHEST


class SurfaceStore(NamedTuple):
    points: jnp.ndarray    # (C, 3)
    covered: jnp.ndarray   # (C,) coverage-state feature
    occupied: jnp.ndarray  # (V,) voxel occupancy bitmap (flattened grid)
    count: jnp.ndarray     # scalar int32
    x_min: jnp.ndarray     # (3,)
    inv_res: jnp.ndarray   # scalar 1/resolution
    dims: jnp.ndarray      # (3,) voxel grid dims

    @staticmethod
    def create(capacity: int, x_min, x_max, resolution: float) -> "SurfaceStore":
        x_min = jnp.asarray(x_min, jnp.float32)
        x_max = jnp.asarray(x_max, jnp.float32)
        dims = jnp.ceil((x_max - x_min) / resolution).astype(jnp.int32) + 1
        n_vox = int(jnp.prod(dims))
        return SurfaceStore(
            points=jnp.zeros((capacity, 3), jnp.float32),
            covered=jnp.zeros((capacity,), jnp.float32),
            occupied=jnp.zeros((n_vox,), bool),
            count=jnp.zeros((), jnp.int32),
            x_min=x_min,
            inv_res=jnp.float32(1.0 / resolution),
            dims=dims,
        )

    def voxel_id(self, pts: jnp.ndarray) -> jnp.ndarray:
        ijk = jnp.clip(((pts - self.x_min) * self.inv_res).astype(jnp.int32),
                       0, self.dims - 1)
        return (ijk[:, 0] * self.dims[1] + ijk[:, 1]) * self.dims[2] + ijk[:, 2]

    def fill(self, pts: jnp.ndarray, valid: jnp.ndarray) -> "SurfaceStore":
        """Insert points whose voxel is still free (one point per voxel)."""
        vid = self.voxel_id(pts)
        n_vox = self.occupied.shape[0]
        free = ~self.occupied[vid]
        # Dedup within the batch: first VALID point per voxel wins. Invalid
        # slots hold real (stale) world coordinates, so ranking them too
        # would let an invalid point suppress a valid one sharing its voxel
        # — sort invalid entries behind a sentinel id instead.
        sort_key = jnp.where(valid, vid, n_vox)
        order = jnp.argsort(sort_key)
        vs = sort_key[order]
        first = jnp.concatenate(
            [jnp.ones((1,), bool), vs[1:] != vs[:-1]]
        )
        batch_first = jnp.zeros_like(valid).at[order].set(first)
        ok = valid & free & batch_first

        n_new = jnp.sum(ok)
        comp = jnp.argsort(~ok, stable=True)
        pts_c = pts[comp]
        vid_c = vid[comp]
        ok_c = jnp.arange(pts.shape[0]) < n_new
        cap = self.points.shape[0]
        slots = self.count + jnp.arange(pts.shape[0])
        stored = ok_c & (slots < cap)
        slots = jnp.where(stored, slots, cap)
        new_points = self.points.at[slots].set(pts_c, mode="drop")
        # A voxel is occupied only when its point was actually STORED:
        # marking capacity-dropped points would permanently block their
        # voxels with no representative, silently understating coverage
        # for everything observed after the store saturates.
        occupied = self.occupied.at[jnp.where(stored, vid_c, n_vox)
                                    ].set(True, mode="drop")
        return self._replace(
            points=new_points,
            occupied=occupied,
            count=jnp.minimum(self.count + n_new, cap),
        )

    def valid_mask(self) -> jnp.ndarray:
        return jnp.arange(self.points.shape[0]) < self.count


@functools.partial(jax.jit, static_argnames=("chunk",))
def _min_dists_chunked(a: jnp.ndarray, b: jnp.ndarray, b_valid: jnp.ndarray,
                       chunk: int = 2048) -> jnp.ndarray:
    center = jnp.mean(a, axis=0)
    ac = a - center
    bc = b - center
    a2 = jnp.sum(ac * ac, axis=-1)
    n_chunks = b.shape[0] // chunk

    def body(best, inp):
        pc, vc = inp
        p2 = jnp.sum(pc * pc, axis=-1)
        d2 = a2[:, None] + p2[None, :] - 2.0 * jnp.matmul(
            ac, pc.T, precision=_F32)
        d2 = jnp.where(vc[None, :], d2, 1e30)
        return jnp.minimum(best, jnp.min(d2, axis=-1)), None

    best, _ = jax.lax.scan(
        body, jnp.full(a.shape[0], 1e30),
        (bc.reshape(n_chunks, chunk, 3), b_valid.reshape(n_chunks, chunk)),
    )
    return jnp.sqrt(jnp.maximum(best, 0.0))


def _coarse_cell_id(store: SurfaceStore, pts: jnp.ndarray,
                    cell_factor: int) -> jnp.ndarray:
    """Coarse cell ids (cell side = cell_factor voxels) for the englobing-
    cell restriction; ids stay < n_vox so the (static-size) voxel bitmap
    can host the cell marks."""
    cd = (store.dims + cell_factor - 1) // cell_factor
    ijk = ((pts - store.x_min) * store.inv_res).astype(jnp.int32)
    ijk = jnp.clip(ijk // cell_factor, 0, cd - 1)
    return (ijk[:, 0] * cd[1] + ijk[:, 1]) * cd[2] + ijk[:, 2]


def camera_coverage_gain(store: SurfaceStore, part_pc: jnp.ndarray,
                         part_valid: jnp.ndarray,
                         epsilon: float,
                         cell_factor: int = 8
                         ) -> Tuple[jnp.ndarray, SurfaceStore]:
    """Number of newly covered surface points within epsilon of part_pc, and
    the store with its covered flags updated (camera_coverage_gain,
    macarons_utils.py:3468-3510).

    Like the reference (:3521-3535), a surface point is only scored when
    its ENGLOBING cell contains at least one part_pc point — otherwise
    points near cell borders would be counted that the reference skips,
    inflating the NBV reward. Cell side here = cell_factor voxels
    (documented delta: the reference's Scene cells come from the per-scene
    grid dims rather than a fixed multiple of the dedup resolution)."""
    cap = store.points.shape[0]
    pad = ((part_pc.shape[0] + 2047) // 2048) * 2048 - part_pc.shape[0]
    if pad:
        part_pc = jnp.pad(part_pc, ((0, pad), (0, 0)))
        part_valid = jnp.pad(part_valid, (0, pad))
    d = _min_dists_chunked(store.points, part_pc, part_valid)
    n_vox = store.occupied.shape[0]
    part_cells = _coarse_cell_id(store, part_pc, cell_factor)
    cell_hit = jnp.zeros((n_vox,), bool).at[
        jnp.where(part_valid, part_cells, n_vox)].set(True, mode="drop")
    store_cells = _coarse_cell_id(store, store.points, cell_factor)
    near = (d < epsilon) & store.valid_mask() & cell_hit[store_cells]
    gain = jnp.sum(near & (store.covered < 0.5))
    covered = jnp.where(near, 1.0, store.covered)
    return gain.astype(jnp.float32), store._replace(covered=covered)


def scene_coverage(gt_points: jnp.ndarray, gt_cells: jnp.ndarray,
                   rec_points: jnp.ndarray, rec_cells: jnp.ndarray,
                   rec_valid: jnp.ndarray, epsilon: float,
                   gt_valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Cell-restricted coverage (scene_coverage, macarons_utils.py:3512-3539):
    a GT point counts as covered iff a reconstructed point in the SAME grid
    cell lies within epsilon (the reference never compares across cells).

    gt_cells / rec_cells: integer cell ids per point. Pass gt_valid when the
    GT cloud carries sentinel padding rows — like ops/coverage.
    masked_min_dists, the centering mean must exclude them or the bf16
    matmul loses the epsilon threshold.
    """
    if gt_valid is None:
        center = jnp.mean(gt_points, axis=0)
    else:
        w = gt_valid.astype(gt_points.dtype)[:, None]
        center = jnp.sum(gt_points * w, axis=0) / jnp.maximum(
            jnp.sum(w), 1.0)
    g = gt_points - center
    r = rec_points - center
    g2 = jnp.sum(g * g, axis=-1)
    r2 = jnp.sum(r * r, axis=-1)
    chunk = 2048
    pad = ((r.shape[0] + chunk - 1) // chunk) * chunk - r.shape[0]
    if pad:
        r = jnp.pad(r, ((0, pad), (0, 0)))
        r2 = jnp.pad(r2, (0, pad))
        rec_cells = jnp.pad(rec_cells, (0, pad), constant_values=-1)
        rec_valid = jnp.pad(rec_valid, (0, pad))
    n_chunks = r.shape[0] // chunk

    def body(best, inp):
        rc, rc2, cells, vc = inp
        d2 = g2[:, None] + rc2[None, :] - 2.0 * jnp.matmul(
            g, rc.T, precision=_F32)
        same_cell = gt_cells[:, None] == cells[None, :]
        d2 = jnp.where(same_cell & vc[None, :], d2, 1e30)
        return jnp.minimum(best, jnp.min(d2, axis=-1)), None

    best, _ = jax.lax.scan(
        body, jnp.full(g.shape[0], 1e30),
        (r.reshape(n_chunks, chunk, 3), r2.reshape(n_chunks, chunk),
         rec_cells.reshape(n_chunks, chunk), rec_valid.reshape(n_chunks, chunk)),
    )
    covered = jnp.sqrt(jnp.maximum(best, 0.0)) < epsilon
    if gt_valid is not None:
        return jnp.sum(covered & gt_valid) / jnp.maximum(
            jnp.sum(gt_valid), 1).astype(jnp.float32)
    return jnp.mean(covered.astype(jnp.float32))
