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


def test_move_and_capture_batched_path_equivalent():
    """batched=True (fused append, no scan carry) vs the default scan path:
    identical pixel SELECTION (same RNG, same counts, same buffer layout)
    and world points equal to one ulp. Exact bit-identity across the two
    program structures is not achievable — XLA fuses the unrolled graph
    differently from the scan body, so the unproject FMA rounds ~0.6% of
    coordinates one ulp apart (measured max 4e-6 abs). The mode is
    therefore opt-in for measured benchmarks (params.batched_capture), not
    a default, and never a gate mode (cf. the deprecated vmap rollout)."""
    p, soa, nt, intr = _scene()
    old = jnp.asarray([7.0, 3.3, 7.0, 0.0, 0.0], jnp.float32)
    new = jnp.asarray([10.0, 3.3, 7.0, 0.0, 315.0], jnp.float32)
    key = jax.random.PRNGKey(42)
    for stratified in (True, False):
        pc0 = PointBuffer.create(16384)
        traj0 = TrajectoryBuffer.create(64)
        a = move_and_capture(soa, nt, old, new, pc0, traj0, key, intr,
                             n_steps=4, n_azim=8, n_slots=512,
                             stratified=stratified)
        b = move_and_capture(soa, nt, old, new, pc0, traj0, key, intr,
                             n_steps=4, n_azim=8, n_slots=512,
                             stratified=stratified, batched=True)
        assert int(a[0].count) == int(b[0].count) > 0
        np.testing.assert_allclose(np.asarray(a[0].points),
                                   np.asarray(b[0].points),
                                   rtol=0, atol=1e-5)
        # Selection parity: the same buffer rows are populated (zeros
        # elsewhere), so a row-is-zero mask must match exactly.
        np.testing.assert_array_equal(
            np.all(np.asarray(a[0].points) == 0, axis=-1),
            np.all(np.asarray(b[0].points) == 0, axis=-1))
        np.testing.assert_allclose(np.asarray(a[1].xyz),
                                   np.asarray(b[1].xyz), rtol=0, atol=1e-6)
        assert int(a[1].count) == int(b[1].count)
        np.testing.assert_allclose(np.asarray(a[2]), np.asarray(b[2]),
                                   rtol=0, atol=1e-5)


def test_append_batches_saturation_matches_sequential():
    """append_batches near capacity must drop exactly like sequential
    appends; TrajectoryBuffer.append_many must keep last-write-wins at the
    final slot."""
    pts = jnp.arange(4 * 8 * 3, dtype=jnp.float32).reshape(4, 8, 3)
    valid = jnp.ones((4, 8), bool).at[1, 5:].set(False)  # batch 1: 5 valid
    pb_seq = PointBuffer.create(20)
    for b in range(4):
        from nextbestpath_tpu.sim.sensor import FramePoints
        pb_seq = pb_seq.append(FramePoints(pts[b], valid[b]),
                               prefix_valid=True)
    pb_bat = PointBuffer.create(20).append_batches(pts, valid)
    assert int(pb_seq.count) == int(pb_bat.count) == 20
    np.testing.assert_array_equal(np.asarray(pb_seq.points),
                                  np.asarray(pb_bat.points))

    xyz = jnp.arange(5 * 3, dtype=jnp.float32).reshape(5, 3)
    tr_seq = TrajectoryBuffer.create(3)
    for b in range(5):
        tr_seq = tr_seq.append(xyz[b])
    tr_bat = TrajectoryBuffer.create(3).append_many(xyz)
    assert int(tr_seq.count) == int(tr_bat.count)
    np.testing.assert_array_equal(np.asarray(tr_seq.xyz),
                                  np.asarray(tr_bat.xyz))
