import jax.numpy as jnp
import numpy as np
import pytest

from nextbestpath_tpu.assets import generate_scene, pack_generated_scene
from nextbestpath_tpu.geometry import CameraIntrinsics, get_camera_RT, unproject_depth
from nextbestpath_tpu.ops.raytrace import (
    points_inside_mesh,
    ray_hits,
    ray_hits_ref,
    render_depth,
    segments_hit_mesh,
    tris_to_soa,
)


def _unit_box():
    """Closed box [0,10]^3 with inward normals (air volume boundary)."""
    v = np.array(
        [[x, y, z] for x in (0.0, 10.0) for y in (0.0, 10.0) for z in (0.0, 10.0)],
        dtype=np.float32,
    )
    quads = [
        (0, 1, 3, 2),  # x=0
        (4, 6, 7, 5),  # x=10
        (0, 4, 5, 1),  # y=0
        (2, 3, 7, 6),  # y=10
        (0, 2, 6, 4),  # z=0
        (1, 5, 7, 3),  # z=10
    ]
    faces = []
    for a, b, c, d in quads:
        faces.append((a, b, c))
        faces.append((a, c, d))
    return jnp.asarray(v), jnp.asarray(np.array(faces, np.int32))


def test_ray_hits_analytic_box():
    v, f = _unit_box()
    tris = v[f]
    # NB: avoid x == y, which hits exactly on the quads' shared diagonal and
    # legitimately counts both triangles.
    o = jnp.asarray([[5.0, 4.0, 5.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    t, n = ray_hits_ref(o, d, tris)
    assert abs(float(t[0]) - 5.0) < 1e-5  # hits z=10 wall at t=5
    assert int(n[0]) == 1
    # Kernel agrees
    t2, n2 = ray_hits(o, d, tris_to_soa(tris), len(tris))
    assert abs(float(t2[0]) - 5.0) < 1e-4
    assert int(n2[0]) == 1


def test_pallas_matches_reference_random():
    rng = np.random.default_rng(0)
    tris = jnp.asarray(rng.normal(scale=5.0, size=(64, 3, 3)).astype(np.float32))
    o = jnp.asarray(rng.normal(scale=2.0, size=(200, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(200, 3)).astype(np.float32))
    t_ref, n_ref = ray_hits_ref(o, d, tris)
    t_ker, n_ker = ray_hits(o, d, tris_to_soa(tris), 64)
    np.testing.assert_allclose(np.asarray(t_ker), np.asarray(t_ref), rtol=2e-4)
    np.testing.assert_array_equal(np.asarray(n_ker), np.asarray(n_ref))


def test_inside_mesh_parity():
    scn = generate_scene("simple", seed=1)
    assets = pack_generated_scene(scn)
    soa = tris_to_soa(jnp.asarray(assets.tris))
    # Point in the middle of the first maze cell -> inside the air volume.
    inside_pt = np.array([[7.5, 3.3, 7.5]], np.float32)
    # Point far outside the scene bbox.
    outside_pt = np.array([[-50.0, 3.3, -50.0]], np.float32)
    res = np.asarray(
        points_inside_mesh(jnp.asarray(np.vstack([inside_pt, outside_pt])), soa,
                           assets.n_tris)
    )
    assert res.tolist() == [True, False]


def test_segment_hits():
    v, f = _unit_box()
    soa = tris_to_soa(v[f])
    starts = jnp.asarray([[5.0, 5.0, 5.0], [2.0, 5.0, 5.0]])
    ends = jnp.asarray([[5.0, 5.0, 15.0], [8.0, 5.0, 5.0]])
    hit = np.asarray(segments_hit_mesh(starts, ends, soa, len(f)))
    assert hit.tolist() == [True, False]


def test_render_depth_box():
    """Camera at box center looking +z must see the z=10 wall at depth 5 in
    the image center, with NO background pixels (closed box)."""
    v, f = _unit_box()
    soa = tris_to_soa(v[f])
    intr = CameraIntrinsics(image_height=32, image_width=56, znear=0.5, zfar=100.0)
    R, T = get_camera_RT(jnp.asarray([[5.0, 5.0, 5.0]]), jnp.asarray([[0.0, 0.0]]))
    zbuf = np.asarray(render_depth(soa, len(f), R[0], T[0], intr))
    assert zbuf.shape == (32, 56)
    assert (zbuf > 0).all()  # closed box: every ray hits something
    center = zbuf[16, 28]
    assert abs(center - 5.0) < 0.05
    # Corners see walls obliquely -> strictly larger view z than center ray?
    # (View z of side walls varies; just check depth stays within the box.)
    assert zbuf.max() < 10.1 + 1e-3


def test_render_unproject_consistency():
    """Rendered depth unprojected back to world must land on the mesh
    surfaces (closed axis-aligned box -> a coordinate equals 0 or 10)."""
    v, f = _unit_box()
    soa = tris_to_soa(v[f])
    intr = CameraIntrinsics(image_height=24, image_width=40, znear=0.5, zfar=100.0)
    R, T = get_camera_RT(jnp.asarray([[5.0, 4.0, 5.0]]), jnp.asarray([[0.0, 45.0]]))
    zbuf = render_depth(soa, len(f), R[0], T[0], intr)
    world = np.asarray(unproject_depth(zbuf, R[0], T[0], intr))
    dist_to_wall = np.minimum(np.abs(world), np.abs(world - 10.0)).min(axis=-1)
    assert dist_to_wall.max() < 5e-3


def test_pinhole_kernel_matches_reference_random():
    """Shared-origin specialization vs the dense reference: same hits, same
    nearest t (HIGHEST-precision contraction: ~1e-6 relative on t)."""
    from nextbestpath_tpu.ops.raytrace import ray_hits_pinhole

    rng = np.random.default_rng(1)
    tris = jnp.asarray(rng.normal(scale=5.0, size=(300, 3, 3)).astype(np.float32))
    origin = jnp.asarray([0.3, -0.2, 0.1], jnp.float32)
    d = jnp.asarray(rng.normal(size=(700, 3)).astype(np.float32))
    o = jnp.broadcast_to(origin, d.shape)
    t_ref, n_ref = ray_hits_ref(o, d, tris)
    t_ker, n_ker, idx = ray_hits_pinhole(origin, d, tris_to_soa(tris), 300)
    hit_ref = np.asarray(t_ref) < 1e30
    hit_ker = np.asarray(t_ker) < 1e30
    # Edge-grazing rays may flip within the contraction error; on random
    # triangles they are measure-zero.
    np.testing.assert_array_equal(hit_ker, hit_ref)
    np.testing.assert_array_equal(np.asarray(n_ker), np.asarray(n_ref))
    np.testing.assert_allclose(np.asarray(t_ker)[hit_ref],
                               np.asarray(t_ref)[hit_ref],
                               rtol=1e-5, atol=1e-5)


def test_pinhole_kernel_box_and_counts():
    from nextbestpath_tpu.ops.raytrace import ray_hits_pinhole

    v, f = _unit_box()
    tris = v[f]
    origin = jnp.asarray([5.0, 4.0, 5.0], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0], [1.0, 0.0, 0.0]],
                    jnp.float32)
    t, n, idx = ray_hits_pinhole(origin, d, tris_to_soa(tris), len(tris))
    np.testing.assert_allclose(np.asarray(t), [5.0, 5.0, 5.0], atol=1e-4)
    assert list(np.asarray(n)) == [1, 1, 1]
    assert (np.asarray(idx) >= 0).all()


def test_render_depth_pinhole_matches_general_kernel():
    """The rollout's depth frames after the pinhole switch vs the general
    kernel on a real procgen scene: identical hit masks, t within 1e-4."""
    from nextbestpath_tpu.config import default_params
    from nextbestpath_tpu.geometry.cameras import camera_center
    from nextbestpath_tpu.ops.raytrace import ray_hits

    p = default_params(image_height=64, image_width=114,
                       points_per_frame=512, full_pc_capacity=16384,
                       n_gt_surface_points=1024)
    assets = pack_generated_scene(generate_scene("simple", seed=8), params=p)
    soa = tris_to_soa(jnp.asarray(assets.tris))
    nt = jnp.asarray(assets.n_tris, jnp.int32)
    intr = CameraIntrinsics(64, 114, 60.0, 1.0, 750.0)
    pose = jnp.asarray([[7.0, 3.3, 7.0]]), jnp.asarray([[0.0, 45.0]])
    R, T = get_camera_RT(*pose)
    zbuf = render_depth(soa, nt, R[0], T[0], intr)  # pinhole path
    import jax as _jax

    eye = camera_center(R[0], T[0])
    d_view = intr.pixel_ray_dirs_view().reshape(-1, 3)
    d_world = jnp.matmul(d_view, R[0].T, precision=_jax.lax.Precision.HIGHEST)
    o = jnp.broadcast_to(eye, d_world.shape)
    t_gen, _ = ray_hits(o, d_world, soa, nt, t_min=1.0, t_max=750.0)
    z_gen = jnp.where(t_gen < 1e30, t_gen, -1.0).reshape(64, 114)
    mask_p = np.asarray(zbuf) > -1
    mask_g = np.asarray(z_gen) > -1
    # Hit masks may differ only on edge-grazing pixels (contraction error).
    assert (mask_p != mask_g).mean() < 5e-3
    both = mask_p & mask_g
    np.testing.assert_allclose(np.asarray(zbuf)[both], np.asarray(z_gen)[both],
                               rtol=1e-4, atol=1e-3)
