import jax.numpy as jnp
import numpy as np
import pytest

from nextbestpath_tpu.geometry import (
    CameraIntrinsics,
    camera_center,
    camera_ray_from_pose_angles,
    get_camera_RT,
    get_cartesian_coords,
    get_spherical_coords,
    look_at_rotation,
    ndc_bounds,
    ndc_tables,
    points_in_fov_mask,
    project_points,
    unproject_depth,
    world_to_view,
)


def test_cartesian_convention():
    # azim=0 -> +z; azim=90 -> +x; elev=90 -> +y
    p = np.asarray(get_cartesian_coords(jnp.ones(3), jnp.array([0.0, 0.0, 90.0]),
                                        jnp.array([0.0, 90.0, 0.0]), in_degrees=True))
    np.testing.assert_allclose(p[0], [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(p[1], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(p[2], [0, 1, 0], atol=1e-6)


def test_spherical_roundtrip():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(128, 3)).astype(np.float32)
    r, e, a = get_spherical_coords(jnp.asarray(pts))
    back = np.asarray(get_cartesian_coords(r, e, a))
    np.testing.assert_allclose(back, pts, atol=1e-4)


def test_camera_ray_matches_reference_formula():
    """The reference computes -cartesian(1, -elev, 180+azim); we use the
    simplified closed form. They must agree (macarons_utils.py:948-951)."""
    rng = np.random.default_rng(1)
    elev = rng.uniform(-80, 80, size=32).astype(np.float32)
    azim = rng.uniform(0, 360, size=32).astype(np.float32)
    ours = np.asarray(camera_ray_from_pose_angles(elev, azim))
    ref = -np.asarray(
        get_cartesian_coords(jnp.ones(32), jnp.asarray(-elev), jnp.asarray(180.0 + azim),
                             in_degrees=True)
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_look_at_view_transform_properties():
    eye = jnp.array([3.0, 2.0, -5.0])
    at = jnp.array([0.0, 0.0, 0.0])
    R = look_at_rotation(eye, at)
    T = -eye @ R
    # The eye maps to the view-space origin.
    np.testing.assert_allclose(np.asarray(world_to_view(eye, R, T)), 0.0, atol=1e-5)
    # 'at' maps onto the +z view axis.
    at_v = np.asarray(world_to_view(at, R, T))
    np.testing.assert_allclose(at_v[:2], 0.0, atol=1e-5)
    assert at_v[2] > 0
    # A point above the eye maps to +y in view space (y-up).
    up_v = np.asarray(world_to_view(eye + jnp.array([0.0, 1.0, 0.0]), R, T))
    assert up_v[1] > 0.9
    # R is a rotation.
    np.testing.assert_allclose(np.asarray(R @ R.T), np.eye(3), atol=1e-5)
    # camera_center inverts it.
    np.testing.assert_allclose(np.asarray(camera_center(R, T)), np.asarray(eye), atol=1e-4)


def test_plus_x_is_left():
    """PyTorch3D convention: with y-up, +x in view space points LEFT of the
    viewing direction. Camera at origin looking +z: world -x is on the right,
    world +x on the left -> view x positive for world +x."""
    R, T = get_camera_RT(jnp.zeros((1, 3)), jnp.array([[0.0, 0.0]]))
    v = world_to_view(jnp.array([[1.0, 0.0, 5.0]]), R[0], T[0])
    assert float(v[0, 0]) > 0  # world +x (viewer's left) -> +x view


def test_ndc_tables_match_reference_values():
    H, W = 256, 456
    ndc_x, ndc_y = ndc_tables(H, W)
    m = min(H, W)
    # Reference: ndc_x = W/m - (j/(m-1))*2 ; ndc_y = H/m - (i/(m-1))*2
    assert abs(float(ndc_x[0, 0]) - W / m) < 1e-6
    assert abs(float(ndc_y[0, 0]) - H / m) < 1e-6
    assert abs(float(ndc_x[0, W - 1]) - (W / m - 2 * (W - 1) / (m - 1))) < 1e-5
    assert abs(float(ndc_y[H - 1, 0]) - (H / m - 2 * (H - 1) / (m - 1))) < 1e-5
    min_x, max_x, min_y, max_y = ndc_bounds(H, W)
    assert abs(min_y - (-1.0)) < 1e-6 and abs(max_y - 1.0) < 1e-6


def test_project_unproject_roundtrip():
    intr = CameraIntrinsics(image_height=64, image_width=96)
    X = jnp.array([10.0, 3.3, 20.0])
    V = jnp.array([0.0, 135.0])
    R, T = get_camera_RT(X[None], V[None])
    R, T = R[0], T[0]
    # Build a synthetic depth map, unproject, re-project: pixels must land on
    # their own ndc coordinates and the view z must equal the depth.
    rng = np.random.default_rng(2)
    depth = jnp.asarray(rng.uniform(2.0, 30.0, size=(64, 96)).astype(np.float32))
    world = unproject_depth(depth, R, T, intr)
    proj = project_points(world, R, T, intr.tan_half_fov)
    ndc_x, ndc_y = ndc_tables(64, 96)
    np.testing.assert_allclose(np.asarray(proj[:, 0]), np.asarray(ndc_x).ravel(), atol=1e-3)
    np.testing.assert_allclose(np.asarray(proj[:, 1]), np.asarray(ndc_y).ravel(), atol=1e-3)
    np.testing.assert_allclose(np.asarray(proj[:, 2]), np.asarray(depth).ravel(), rtol=1e-4)


def test_fov_mask():
    intr = CameraIntrinsics(image_height=64, image_width=96)
    X = jnp.zeros(3)
    V = jnp.array([0.0, 0.0])  # looking +z
    R, T = get_camera_RT(X[None], V[None])
    pts = jnp.array(
        [
            [0.0, 0.0, 10.0],   # dead center -> in
            [0.0, 0.0, -10.0],  # behind -> out
            [100.0, 0.0, 10.0],  # far off axis -> out
            [0.0, 0.0, 200.0],  # in frustum, beyond range
        ]
    )
    mask = np.asarray(points_in_fov_mask(pts, R[0], T[0], intr, fov_range=70.0))
    assert mask.tolist() == [True, False, False, False]
    mask_norange = np.asarray(points_in_fov_mask(pts, R[0], T[0], intr))
    assert mask_norange.tolist() == [True, False, False, True]
