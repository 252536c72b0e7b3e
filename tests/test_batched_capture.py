"""Bit-parity of batched capture helpers vs the rolled per-frame loop.

render_depth_batch must equal stacking render_depth per camera exactly
(both route through the pinhole MXU kernel). move_and_capture itself keeps
the rolled lax.scan path (the fully-batched variant measured slower,
sim/rollout.py); the second test validates its prefix_valid append refactor
against a hand-rolled reference of the same per-substep sequence."""
import jax
import jax.numpy as jnp
import numpy as np

from nextbestpath_tpu.assets import generate_scene, pack_generated_scene
from nextbestpath_tpu.config import default_params
from nextbestpath_tpu.geometry.cameras import CameraIntrinsics, get_camera_RT
from nextbestpath_tpu.ops.raytrace import (
    render_depth,
    render_depth_batch,
    tris_to_soa,
)
from nextbestpath_tpu.sim.rollout import interpolate_pose, move_and_capture
from nextbestpath_tpu.sim.sensor import (
    PointBuffer,
    backproject_sample,
    capture_depth,
)
from nextbestpath_tpu.sim.rollout import TrajectoryBuffer


def _scene():
    p = default_params(image_height=64, image_width=114,
                       points_per_frame=512, full_pc_capacity=16384,
                       n_gt_surface_points=1024)
    assets = pack_generated_scene(generate_scene("simple", seed=8), params=p)
    soa = tris_to_soa(jnp.asarray(assets.tris))
    nt = jnp.asarray(assets.n_tris, jnp.int32)
    intr = CameraIntrinsics(64, 114, 60.0, 1.0, 750.0)
    return p, soa, nt, intr


def test_render_depth_batch_equals_loop():
    _, soa, nt, intr = _scene()
    poses = jnp.asarray([
        [7.0, 3.3, 7.0, 0.0, 0.0],
        [8.5, 3.3, 7.0, 0.0, 45.0],
        [10.0, 3.3, 7.0, 0.0, 90.0],
    ], jnp.float32)
    R, T = get_camera_RT(poses[:, :3], poses[:, 3:])
    zb = render_depth_batch(soa, nt, R, T, intr)
    for i in range(3):
        zi = render_depth(soa, nt, R[i], T[i], intr)
        np.testing.assert_array_equal(np.asarray(zb[i]), np.asarray(zi))


def test_move_and_capture_matches_rolled_reference():
    p, soa, nt, intr = _scene()
    old = jnp.asarray([7.0, 3.3, 7.0, 0.0, 0.0], jnp.float32)
    new = jnp.asarray([10.0, 3.3, 7.0, 0.0, 315.0], jnp.float32)
    key = jax.random.PRNGKey(42)
    n_steps, n_azim, n_slots = 4, 8, 512

    pc0 = PointBuffer.create(16384)
    traj0 = TrajectoryBuffer.create(64)
    pc, traj, zlast = move_and_capture(
        soa, nt, old, new, pc0, traj0, key, intr, n_steps=n_steps,
        n_azim=n_azim, n_slots=n_slots, stratified=True)

    # Rolled reference: the original per-substep sequence.
    pc_r, traj_r = pc0, traj0
    for s in range(1, n_steps + 1):
        pose = interpolate_pose(old, new, jnp.int32(s), n_steps, n_azim)
        zbuf, R, T = capture_depth(soa, nt, pose, intr)
        sub = jax.random.fold_in(key, jnp.int32(s))
        batch = backproject_sample(zbuf, R, T, intr, sub, n_slots,
                                   stratified=True)
        pc_r = pc_r.append(batch, prefix_valid=True)
        traj_r = traj_r.append(pose[:3])

    assert int(pc.count) == int(pc_r.count) > 0
    np.testing.assert_allclose(np.asarray(pc.points), np.asarray(pc_r.points),
                               rtol=0, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(traj.xyz), np.asarray(traj_r.xyz))
    # zlast vs a FRESH unbatched capture: get_camera_RT at batch 4 vs
    # batch 1 rounds the look-at matmul differently (last-ulp), so this
    # comparison is close, not exact.
    np.testing.assert_allclose(np.asarray(zlast),
                               np.asarray(capture_depth(soa, nt, new,
                                                        intr)[0]),
                               rtol=1e-5, atol=1e-4)
