"""Parity of the fused plan-phase projections vs the original three-scatter
path (build_model_input + fuse_layout). Counts are small integers in f32,
so the fused single-pass scatter must match BIT-FOR-BIT."""
import jax
import jax.numpy as jnp
import numpy as np

from nextbestpath_tpu.eval.nbp_planning import (
    build_model_input,
    build_plan_projections,
    fuse_layout,
    fuse_layout_from_projections,
)
from nextbestpath_tpu.ops.scatter2d import height_bins
from nextbestpath_tpu.sim.rollout import TrajectoryBuffer
from nextbestpath_tpu.sim.sensor import PointBuffer


def _filled_buffers(key, n_pts=5000, capacity=8192):
    kp, kt = jax.random.split(key)
    pts = jax.random.uniform(kp, (capacity, 3), minval=-30.0, maxval=30.0)
    # Heights spanning below/inside/above the bin range so the overflow
    # channel is exercised.
    pts = pts.at[:, 1].set(jax.random.uniform(kp, (capacity,), minval=-2.0,
                                              maxval=12.0))
    pc = PointBuffer(points=pts, count=jnp.int32(n_pts))
    txyz = jax.random.uniform(kt, (64, 3), minval=-30.0, maxval=30.0)
    traj = TrajectoryBuffer(xyz=txyz, count=jnp.int32(40))
    return pc, traj


def test_fused_matches_three_scatter_path():
    pc, traj = _filled_buffers(jax.random.PRNGKey(0))
    y_bins = height_bins(jnp.float32(0.0), jnp.float32(9.0), 4)
    cam_pose5 = jnp.asarray([3.0, 3.3, -4.0, 0.0, 90.0], jnp.float32)
    pred = jax.random.uniform(jax.random.PRNGKey(2), (256, 256))

    mi_ref, ti_ref = build_model_input(pc, traj, cam_pose5[:3], y_bins)
    lay_ref, proj_ref = fuse_layout(pred, pc, ti_ref, cam_pose5)

    mi, ti, proj, filt = build_plan_projections(pc, traj, cam_pose5, y_bins)
    lay, proj2 = fuse_layout_from_projections(pred, proj, filt, ti)

    np.testing.assert_array_equal(np.asarray(mi), np.asarray(mi_ref))
    np.testing.assert_array_equal(np.asarray(ti), np.asarray(ti_ref))
    np.testing.assert_array_equal(np.asarray(proj), np.asarray(proj_ref))
    np.testing.assert_array_equal(np.asarray(proj2), np.asarray(proj_ref))
    np.testing.assert_array_equal(np.asarray(lay), np.asarray(lay_ref))


def test_fused_matches_with_empty_and_full_counts():
    y_bins = height_bins(jnp.float32(0.0), jnp.float32(9.0), 4)
    cam_pose5 = jnp.asarray([0.0, 3.3, 0.0, 0.0, 0.0], jnp.float32)
    pred = jnp.zeros((256, 256))
    for n_pts in (0, 1, 8192):
        pc, traj = _filled_buffers(jax.random.PRNGKey(7), n_pts=n_pts)
        mi_ref, ti_ref = build_model_input(pc, traj, cam_pose5[:3], y_bins)
        lay_ref, proj_ref = fuse_layout(pred, pc, ti_ref, cam_pose5)
        mi, ti, proj, filt = build_plan_projections(pc, traj, cam_pose5,
                                                    y_bins)
        lay, _ = fuse_layout_from_projections(pred, proj, filt, ti)
        np.testing.assert_array_equal(np.asarray(mi), np.asarray(mi_ref))
        np.testing.assert_array_equal(np.asarray(proj), np.asarray(proj_ref))
        np.testing.assert_array_equal(np.asarray(lay), np.asarray(lay_ref))
