"""Ray-triangle geometry core (Pallas TPU kernel + pure-JAX reference).

One kernel replaces three native dependencies of the reference:

1. the PyTorch3D mesh rasterizer (``MeshRasterizer`` + ``capture_image``,
   macarons/utility/macarons_utils.py:875-937,2743-2786) — depth rendering,
2. trimesh segment-vs-mesh collision (``line_segment_mesh_intersection``,
   macarons_utils.py:120-151),
3. trimesh odd-parity inside tests (``check_camera_in_mesh``,
   next_best_path/utility/long_term_utils.py:158-170).

Semantics: Möller–Trumbore, double-sided (the reference neither culls
backfaces nor does trimesh), intersection parameter *t* measured along the
**unnormalized** ray direction. For depth rendering, rays are built in view
space with d_z == 1 so *t* is the view-space z — exactly the meaning of
PyTorch3D's ``fragments.zbuf`` (MeshRasterizer replaces NDC z with view z).
Background pixels get zbuf = -1 like PyTorch3D.

Layout: triangles as a (9, F) SoA array (v0, e1, e2 components along lanes);
the kernel tiles rays into blocks of ``RAY_BLOCK`` sublanes and loops over
triangle chunks of ``TRI_CHUNK`` lanes with a dynamic trip count, so frustum
culling shrinks work without changing shapes.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..geometry.cameras import CameraIntrinsics, camera_center

import os as _os

# Tunable tile sizes (env overrides for experimentation; defaults measured
# on v5e). RAY_BLOCK x TRI_CHUNK f32 intermediates must fit VMEM alongside
# the SoA (~6 temps in flight for the general kernel).
RAY_BLOCK = int(_os.environ.get("NBP_RAY_BLOCK", "512"))
TRI_CHUNK = int(_os.environ.get("NBP_TRI_CHUNK", "512"))
_DET_EPS = 1e-10
_INF = 3.4e38  # plain float: jnp scalars would be captured as kernel consts


def tris_to_soa(tris: jnp.ndarray) -> jnp.ndarray:
    """(F, 3, 3) triangles -> (9, F) SoA of (v0, e1=v1-v0, e2=v2-v0)."""
    v0 = tris[:, 0]
    e1 = tris[:, 1] - tris[:, 0]
    e2 = tris[:, 2] - tris[:, 0]
    return jnp.concatenate([v0.T, e1.T, e2.T], axis=0).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Pure-JAX reference implementation (golden model for the kernel; also the
# CPU fallback used in tests).
# ---------------------------------------------------------------------------


def _moller_trumbore(o, d, v0, e1, e2):
    """Batched intersection. o/d: (N, 1, 3); v0/e1/e2: (1, F, 3).

    Returns (t, hit) of shape (N, F): t along unnormalized d; hit boolean
    for u, v in the triangle and t > 0 handled by the caller.
    """
    p = jnp.cross(d, e2)  # (N, F, 3)
    det = jnp.sum(e1 * p, axis=-1)  # (N, F)
    s = o - v0
    u = jnp.sum(s * p, axis=-1)
    q = jnp.cross(s, e1)
    v = jnp.sum(d * q, axis=-1)
    t_scaled = jnp.sum(e2 * q, axis=-1)
    sign = jnp.sign(det)
    abs_det = jnp.abs(det)
    valid = abs_det > _DET_EPS
    u_s = u * sign
    v_s = v * sign
    inside = (u_s >= 0) & (v_s >= 0) & (u_s + v_s <= abs_det)
    t = t_scaled / jnp.where(valid, det, 1.0)
    return t, valid & inside


def ray_hits_ref(origins: jnp.ndarray, dirs: jnp.ndarray, tris: jnp.ndarray,
                 t_min: float = 1e-4, t_max: float = float(_INF)
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reference implementation over dense (F, 3, 3) triangles.

    Returns (t_nearest (N,), n_hits (N,)); t_nearest = +inf when no hit in
    (t_min, t_max).
    """
    o = origins[:, None, :]
    d = dirs[:, None, :]
    v0 = tris[None, :, 0, :]
    e1 = (tris[:, 1] - tris[:, 0])[None]
    e2 = (tris[:, 2] - tris[:, 0])[None]
    t, hit = _moller_trumbore(o, d, v0, e1, e2)
    in_range = hit & (t > t_min) & (t < t_max)
    t_near = jnp.min(jnp.where(in_range, t, _INF), axis=-1)
    n_hits = jnp.sum(in_range, axis=-1).astype(jnp.int32)
    return t_near, n_hits


def ray_hits_idx_ref(origins: jnp.ndarray, dirs: jnp.ndarray,
                     tris: jnp.ndarray, t_min: float = 1e-4,
                     t_max: float = float(_INF)):
    """Reference nearest-hit triangle index (-1 when no hit)."""
    o = origins[:, None, :]
    d = dirs[:, None, :]
    v0 = tris[None, :, 0, :]
    e1 = (tris[:, 1] - tris[:, 0])[None]
    e2 = (tris[:, 2] - tris[:, 0])[None]
    t, hit = _moller_trumbore(o, d, v0, e1, e2)
    in_range = hit & (t > t_min) & (t < t_max)
    t_masked = jnp.where(in_range, t, _INF)
    idx = jnp.argmin(t_masked, axis=-1).astype(jnp.int32)
    t_near = jnp.min(t_masked, axis=-1)
    return t_near, jnp.where(t_near < _INF, idx, -1)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _ray_kernel(n_chunks_ref, o_ref, d_ref, tri_ref, tmin_ref, tmax_ref,
                t_out_ref, cnt_out_ref, idx_out_ref):
    """One program handles RAY_BLOCK rays vs all triangle chunks."""
    ox = o_ref[:, 0:1]
    oy = o_ref[:, 1:2]
    oz = o_ref[:, 2:3]
    dx = d_ref[:, 0:1]
    dy = d_ref[:, 1:2]
    dz = d_ref[:, 2:3]
    t_min = tmin_ref[0]
    t_max = tmax_ref[0]

    def body(c, carry):
        t_best, n_hits, best_idx = carry
        base = c * TRI_CHUNK
        v0x = tri_ref[0:1, pl.ds(base, TRI_CHUNK)]
        v0y = tri_ref[1:2, pl.ds(base, TRI_CHUNK)]
        v0z = tri_ref[2:3, pl.ds(base, TRI_CHUNK)]
        e1x = tri_ref[3:4, pl.ds(base, TRI_CHUNK)]
        e1y = tri_ref[4:5, pl.ds(base, TRI_CHUNK)]
        e1z = tri_ref[5:6, pl.ds(base, TRI_CHUNK)]
        e2x = tri_ref[6:7, pl.ds(base, TRI_CHUNK)]
        e2y = tri_ref[7:8, pl.ds(base, TRI_CHUNK)]
        e2z = tri_ref[8:9, pl.ds(base, TRI_CHUNK)]

        # p = cross(d, e2): (R, C)
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        sx = ox - v0x
        sy = oy - v0y
        sz = oz - v0z
        u = sx * px + sy * py + sz * pz
        # q = cross(s, e1)
        qx = sy * e1z - sz * e1y
        qy = sz * e1x - sx * e1z
        qz = sx * e1y - sy * e1x
        v = dx * qx + dy * qy + dz * qz
        t_scaled = e2x * qx + e2y * qy + e2z * qz

        sign = jnp.sign(det)
        abs_det = jnp.abs(det)
        u_s = u * sign
        v_s = v * sign
        inside = (abs_det > _DET_EPS) & (u_s >= 0) & (v_s >= 0) & (u_s + v_s <= abs_det)
        t = t_scaled / jnp.where(abs_det > _DET_EPS, det, 1.0)
        ok = inside & (t > t_min) & (t < t_max)
        t_chunk = jnp.where(ok, t, _INF)
        t_min_c = jnp.min(t_chunk, axis=1, keepdims=True)
        lane = jax.lax.broadcasted_iota(jnp.int32, t_chunk.shape, 1)
        idx_c = jnp.min(jnp.where(t_chunk <= t_min_c, lane, 2**30),
                        axis=1, keepdims=True) + base
        better = t_min_c < t_best
        best_idx = jnp.where(better, idx_c, best_idx)
        t_best = jnp.minimum(t_best, t_min_c)
        n_hits = n_hits + jnp.sum(ok.astype(jnp.int32), axis=1, keepdims=True)
        return t_best, n_hits, best_idx

    t0 = jnp.full((RAY_BLOCK, 1), _INF, jnp.float32)
    c0 = jnp.zeros((RAY_BLOCK, 1), jnp.int32)
    i0 = jnp.full((RAY_BLOCK, 1), -1, jnp.int32)
    t_best, n_hits, best_idx = jax.lax.fori_loop(0, n_chunks_ref[0], body,
                                                 (t0, c0, i0))
    t_out_ref[:, :] = t_best
    cnt_out_ref[:, :] = n_hits
    idx_out_ref[:, :] = best_idx


# ---------------------------------------------------------------------------
# Pinhole specialization: all rays of a frame share one origin, which makes
# most of Möller–Trumbore per-TRIANGLE instead of per-pair. With s = o - v0:
#   det[r,t] = e1.(d x e2) = -d . n,        n  = e1 x e2   (origin-free)
#   u_num[r,t] = s.(d x e2) = -d . m2,      m2 = s x e2
#   v_num[r,t] = d.(s x e1) =  d . m1,      m1 = s x e1
#   t_num[t]   = e2.(s x e1) = e2 . m1      (ray-INDEPENDENT)
# so the per-pair work collapses to three K=3 contractions (MXU) plus the
# sign/inside/divide logic (~10 VPU ops vs ~35 for the general kernel).
# Measured on v5e at 256x456 x 512 tris: 2.48 -> ~1 ms per frame.
# ---------------------------------------------------------------------------


def pinhole_tri_soa(tri_soa: jnp.ndarray, origin: jnp.ndarray) -> jnp.ndarray:
    """(9, F) general SoA + shared origin -> (10, F) pinhole SoA.

    Rows: n (3), m2 (3), m1 (3), t_num (1). Exact f32 elementwise math,
    computed once per frame outside the kernel.
    """
    v0 = tri_soa[0:3]
    e1 = tri_soa[3:6]
    e2 = tri_soa[6:9]
    s = origin[:, None] - v0

    def cross(a, b):
        return jnp.stack([
            a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0],
        ])

    n = cross(e1, e2)
    m2 = cross(s, e2)
    m1 = cross(s, e1)
    t_num = jnp.sum(e2 * m1, axis=0, keepdims=True)
    return jnp.concatenate([n, m2, m1, t_num], axis=0).astype(jnp.float32)


def _ray_pinhole_kernel(n_chunks_ref, d_ref, tri_ref, tmin_ref, tmax_ref,
                        t_out_ref, cnt_out_ref, idx_out_ref):
    """One program: RAY_BLOCK shared-origin rays vs all triangle chunks."""
    d = d_ref[:, :]  # (R, 3)
    t_min = tmin_ref[0]
    t_max = tmax_ref[0]
    prec = jax.lax.Precision.HIGHEST

    def body(c, carry):
        t_best, n_hits, best_idx = carry
        base = c * TRI_CHUNK
        n_m = tri_ref[0:3, pl.ds(base, TRI_CHUNK)]    # (3, C)
        m2 = tri_ref[3:6, pl.ds(base, TRI_CHUNK)]
        m1 = tri_ref[6:9, pl.ds(base, TRI_CHUNK)]
        t_num = tri_ref[9:10, pl.ds(base, TRI_CHUNK)]  # (1, C)
        det = -jax.lax.dot_general(d, n_m, (((1,), (0,)), ((), ())),
                                   precision=prec,
                                   preferred_element_type=jnp.float32)
        u = -jax.lax.dot_general(d, m2, (((1,), (0,)), ((), ())),
                                 precision=prec,
                                 preferred_element_type=jnp.float32)
        v = jax.lax.dot_general(d, m1, (((1,), (0,)), ((), ())),
                                precision=prec,
                                preferred_element_type=jnp.float32)
        sign = jnp.sign(det)
        abs_det = jnp.abs(det)
        u_s = u * sign
        v_s = v * sign
        inside = ((abs_det > _DET_EPS) & (u_s >= 0) & (v_s >= 0)
                  & (u_s + v_s <= abs_det))
        t = t_num / jnp.where(abs_det > _DET_EPS, det, 1.0)
        ok = inside & (t > t_min) & (t < t_max)
        t_chunk = jnp.where(ok, t, _INF)
        t_min_c = jnp.min(t_chunk, axis=1, keepdims=True)
        lane = jax.lax.broadcasted_iota(jnp.int32, t_chunk.shape, 1)
        idx_c = jnp.min(jnp.where(t_chunk <= t_min_c, lane, 2**30),
                        axis=1, keepdims=True) + base
        better = t_min_c < t_best
        best_idx = jnp.where(better, idx_c, best_idx)
        t_best = jnp.minimum(t_best, t_min_c)
        n_hits = n_hits + jnp.sum(ok.astype(jnp.int32), axis=1, keepdims=True)
        return t_best, n_hits, best_idx

    t0 = jnp.full((RAY_BLOCK, 1), _INF, jnp.float32)
    c0 = jnp.zeros((RAY_BLOCK, 1), jnp.int32)
    i0 = jnp.full((RAY_BLOCK, 1), -1, jnp.int32)
    t_best, n_hits, best_idx = jax.lax.fori_loop(0, n_chunks_ref[0], body,
                                                 (t0, c0, i0))
    t_out_ref[:, :] = t_best
    cnt_out_ref[:, :] = n_hits
    idx_out_ref[:, :] = best_idx


@functools.partial(jax.jit, static_argnames=("interpret",))
def _ray_hits_pinhole_pallas(origin, dirs, tri_soa, n_tris, t_min, t_max,
                             interpret: bool):
    n_rays = dirs.shape[0]
    n_blocks = pl.cdiv(n_rays, RAY_BLOCK)
    pad = n_blocks * RAY_BLOCK - n_rays
    if pad:
        dirs = jnp.pad(dirs, ((0, pad), (0, 0)), constant_values=1.0)
    ph_soa = pinhole_tri_soa(tri_soa, origin.astype(jnp.float32))
    f = ph_soa.shape[1]
    f_pad = pl.cdiv(f, TRI_CHUNK) * TRI_CHUNK - f
    if f_pad:
        ph_soa = jnp.pad(ph_soa, ((0, 0), (0, f_pad)))
    n_chunks = jnp.asarray([pl.cdiv(n_tris, TRI_CHUNK)], jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((RAY_BLOCK, 3), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full (10, F) SoA
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((RAY_BLOCK, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    t_out, cnt, idx = pl.pallas_call(
        _ray_pinhole_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks * RAY_BLOCK, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks * RAY_BLOCK, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_blocks * RAY_BLOCK, 1), jnp.int32),
        ],
        interpret=interpret,
    )(n_chunks, dirs.astype(jnp.float32), ph_soa,
      jnp.asarray([t_min], jnp.float32), jnp.asarray([t_max], jnp.float32))
    return t_out[:n_rays, 0], cnt[:n_rays, 0], idx[:n_rays, 0]


def ray_hits_pinhole(origin: jnp.ndarray, dirs: jnp.ndarray,
                     tri_soa: jnp.ndarray, n_tris, t_min: float = 1e-4,
                     t_max: float = float(_INF),
                     interpret: Optional[bool] = None):
    """ray_hits_full for rays sharing one origin (a camera frame).

    origin: (3,); dirs: (N, 3). Returns (t, n_hits, idx). The contraction
    runs at HIGHEST precision (6-pass bf16, ~1e-7 relative); hit/miss can
    differ from the general kernel only for rays grazing a triangle edge
    within that error.
    """
    if interpret is None:
        interpret = _use_interpret()
    return _ray_hits_pinhole_pallas(
        origin, dirs, tri_soa, jnp.asarray(n_tris, jnp.int32),
        jnp.float32(t_min), jnp.float32(t_max), interpret)


def _use_interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


@functools.partial(jax.jit, static_argnames=("interpret",))
def _ray_hits_pallas(origins, dirs, tri_soa, n_tris, t_min, t_max,
                     interpret: bool):
    n_rays = origins.shape[0]
    n_blocks = pl.cdiv(n_rays, RAY_BLOCK)
    pad = n_blocks * RAY_BLOCK - n_rays
    if pad:
        origins = jnp.pad(origins, ((0, pad), (0, 0)))
        dirs = jnp.pad(dirs, ((0, pad), (0, 0)), constant_values=1.0)
    f = tri_soa.shape[1]
    f_pad = pl.cdiv(f, TRI_CHUNK) * TRI_CHUNK - f
    if f_pad:
        tri_soa = jnp.pad(tri_soa, ((0, 0), (0, f_pad)))
    n_chunks = jnp.asarray([pl.cdiv(n_tris, TRI_CHUNK)], jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((RAY_BLOCK, 3), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK, 3), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full tri_soa
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((RAY_BLOCK, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    t_out, cnt, idx = pl.pallas_call(
        _ray_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks * RAY_BLOCK, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks * RAY_BLOCK, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_blocks * RAY_BLOCK, 1), jnp.int32),
        ],
        interpret=interpret,
    )(n_chunks, origins.astype(jnp.float32), dirs.astype(jnp.float32),
      tri_soa, jnp.asarray([t_min], jnp.float32), jnp.asarray([t_max], jnp.float32))
    return t_out[:n_rays, 0], cnt[:n_rays, 0], idx[:n_rays, 0]


def ray_hits(origins: jnp.ndarray, dirs: jnp.ndarray, tri_soa: jnp.ndarray,
             n_tris, t_min: float = 1e-4, t_max: float = float(_INF),
             interpret: Optional[bool] = None):
    """Nearest-hit t (+inf if none) and hit count per ray.

    origins/dirs: (N, 3); tri_soa: (9, F) from tris_to_soa; n_tris: valid
    triangle count (traced or static).
    """
    if interpret is None:
        interpret = _use_interpret()
    t, cnt, _ = _ray_hits_pallas(
        origins, dirs, tri_soa,
        jnp.asarray(n_tris, jnp.int32),
        jnp.float32(t_min), jnp.float32(t_max), interpret,
    )
    return t, cnt


def ray_hits_full(origins: jnp.ndarray, dirs: jnp.ndarray,
                  tri_soa: jnp.ndarray, n_tris, t_min: float = 1e-4,
                  t_max: float = float(_INF),
                  interpret: Optional[bool] = None):
    """Like ray_hits, plus the nearest-hit triangle index (-1 when no hit).

    The index feeds the RGB shader (render_rgbd): normal = hit triangle's
    e1 x e2 from the SoA buffer."""
    if interpret is None:
        interpret = _use_interpret()
    t, cnt, idx = _ray_hits_pallas(
        origins, dirs, tri_soa,
        jnp.asarray(n_tris, jnp.int32),
        jnp.float32(t_min), jnp.float32(t_max), interpret,
    )
    # The kernel already returns idx == -1 for no-hit rays (best_idx is
    # initialized to -1 and only written on t_min_c < t_best).
    return t, cnt, idx


# ---------------------------------------------------------------------------
# Entry points
# ---------------------------------------------------------------------------


def render_depth(tri_soa: jnp.ndarray, n_tris, R: jnp.ndarray, T: jnp.ndarray,
                 intr: CameraIntrinsics,
                 interpret: Optional[bool] = None) -> jnp.ndarray:
    """Depth frame (H, W) of view-space z; background = -1.

    Equivalent of PyTorch3D rasterization in Camera.capture_image
    (macarons_utils.py:2743-2786): faces_per_pixel=1, zbuf = nearest view z,
    no hit -> -1. Hits closer than intr.znear or beyond intr.zfar are
    ignored (PyTorch3D clips faces at znear).
    """
    eye = camera_center(R, T)
    d_view = intr.pixel_ray_dirs_view().reshape(-1, 3)
    d_world = jnp.matmul(d_view, R.T, precision=jax.lax.Precision.HIGHEST)
    t, _, _ = ray_hits_pinhole(eye, d_world, tri_soa, n_tris,
                               t_min=float(intr.znear),
                               t_max=float(intr.zfar), interpret=interpret)
    zbuf = jnp.where(t < _INF, t, -1.0)
    return zbuf.reshape(intr.image_height, intr.image_width)


def render_depth_batch(tri_soa: jnp.ndarray, n_tris, Rs: jnp.ndarray,
                       Ts: jnp.ndarray, intr: CameraIntrinsics,
                       interpret: Optional[bool] = None) -> jnp.ndarray:
    """Depth frames (B, H, W) for B cameras (B static, unrolled).

    Bit-identical to stacking render_depth per camera BY CONSTRUCTION: each
    camera routes through the same ray_hits_pinhole MXU kernel with the same
    per-camera matmul shapes, so every intermediate is the identical program.
    (A previous revision batched all B*H*W rays through the general
    elementwise kernel in one call; that kernel's hit math differs from the
    pinhole factorization at ~1e-7 relative, which broke the identity.)
    """
    B = Rs.shape[0]
    frames = [render_depth(tri_soa, n_tris, Rs[b], Ts[b], intr,
                           interpret=interpret) for b in range(B)]
    return jnp.stack(frames, axis=0)


def render_rgbd(tri_soa: jnp.ndarray, n_tris, R: jnp.ndarray, T: jnp.ndarray,
                intr: CameraIntrinsics, tri_colors: Optional[jnp.ndarray] = None,
                ambient: float = 0.85, base_gray: float = 0.8,
                interpret: Optional[bool] = None
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(rgb (H, W, 3), zbuf (H, W)): depth frame + shaded color frame.

    The reference's RGB renderer is SoftPhongShader + AmbientLights over a
    uniform gray vertex texture (get_rgb_renderer, macarons_utils.py:905-937;
    load_scene_with_texture :574-609) — ambient-only lighting makes every
    lit pixel the same flat gray, which carries zero photometric gradient.
    The TPU shader keeps the gray palette but modulates it with a headlight
    Lambert term, shade = ambient + (1-ambient) * |n . view|, so wall
    orientation structures the image and the self-supervised photometric
    loss (macarons_utils.py:1292-1388) has signal. Documented delta.
    """
    eye = camera_center(R, T)
    d_view = intr.pixel_ray_dirs_view().reshape(-1, 3)
    d_world = jnp.matmul(d_view, R.T, precision=jax.lax.Precision.HIGHEST)
    t, _, idx = ray_hits_pinhole(eye, d_world, tri_soa, n_tris,
                                 t_min=float(intr.znear),
                                 t_max=float(intr.zfar), interpret=interpret)
    hit = t < _INF
    idx_c = jnp.clip(idx, 0, tri_soa.shape[1] - 1)
    e1 = tri_soa[3:6, idx_c].T  # (N, 3)
    e2 = tri_soa[6:9, idx_c].T
    n = jnp.cross(e1, e2)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    d_n = d_world / jnp.maximum(
        jnp.linalg.norm(d_world, axis=-1, keepdims=True), 1e-12)
    lambert = jnp.abs(jnp.sum(n * d_n, axis=-1))
    shade = ambient + (1.0 - ambient) * lambert
    if tri_colors is not None:
        color = tri_colors[idx_c]
    else:
        color = jnp.full((idx_c.shape[0], 3), base_gray, jnp.float32)
    rgb = jnp.where(hit[:, None], color * shade[:, None], 0.0)
    H, W = intr.image_height, intr.image_width
    zbuf = jnp.where(hit, t, -1.0)
    return rgb.reshape(H, W, 3), zbuf.reshape(H, W)


def segments_hit_mesh(starts: jnp.ndarray, ends: jnp.ndarray,
                      tri_soa: jnp.ndarray, n_tris,
                      interpret: Optional[bool] = None) -> jnp.ndarray:
    """True where the open segment (start, end) intersects the mesh.

    Matches line_segment_mesh_intersection (macarons_utils.py:120-151):
    any intersection strictly closer than the segment length.
    """
    d = ends - starts
    t, _ = ray_hits(starts, d, tri_soa, n_tris, t_min=1e-6, t_max=1.0,
                    interpret=interpret)
    return t < 1.0


def points_inside_mesh(points: jnp.ndarray, tri_soa: jnp.ndarray, n_tris,
                       interpret: Optional[bool] = None) -> jnp.ndarray:
    """Odd-parity inside test along +y, +x and +z.

    Matches check_camera_in_mesh (long_term_utils.py:158-170): the point is
    'inside' iff the hit count is odd along all three axis rays. The rays are
    tilted by a tiny fixed jitter so that axis-aligned scene edges (ubiquitous
    in Doom-style meshes) are not hit exactly on a shared triangle edge,
    which would double-count and flip the parity.
    """
    n = points.shape[0]
    axes = jnp.asarray(
        [[3e-4, 1.0, 7e-4], [1.0, 3e-4, 7e-4], [7e-4, 3e-4, 1.0]],
        jnp.float32,
    )
    origins = jnp.tile(points, (3, 1))
    dirs = jnp.repeat(axes, n, axis=0)
    _, cnt = ray_hits(origins, dirs, tri_soa, n_tris, t_min=1e-6,
                      interpret=interpret)
    odd = (cnt % 2) == 1
    return odd[:n] & odd[n:2 * n] & odd[2 * n:]
