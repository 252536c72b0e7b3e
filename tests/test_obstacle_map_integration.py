"""GT obstacle map must align with independently observed geometry: points
backprojected from rendered depth at the camera's height slice must land on
(or adjacent to) obstacle-map pixels. This cross-validates the plane-section
rasterizer against the renderer + unprojection + scatter pipeline, which only
share the triangle buffer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nextbestpath_tpu.assets import generate_scene, pack_generated_scene
from nextbestpath_tpu.geometry import CameraIntrinsics
from nextbestpath_tpu.ops import count_img, gt_obstacle_map
from nextbestpath_tpu.ops.raytrace import tris_to_soa
from nextbestpath_tpu.sim import PointBuffer, TrajectoryBuffer, move_and_capture


@pytest.mark.slow
def test_obstacle_map_matches_observed_walls():
    scn = generate_scene("simple", seed=7)
    assets = pack_generated_scene(scn)
    soa = tris_to_soa(jnp.asarray(assets.tris))
    n_tris = jnp.asarray(assets.n_tris, jnp.int32)
    tris = jnp.asarray(assets.tris)
    intr = CameraIntrinsics(image_height=64, image_width=114)

    pose_np = assets.pose_from_idx(assets.start_cam_idx)
    cam = jnp.asarray(pose_np, jnp.float32)

    # Observe from 8 rotations at the start pose.
    pc = PointBuffer.create(131072)
    traj = TrajectoryBuffer.create(64)
    for rot in range(8):
        pose = cam.at[4].set(45.0 * rot)
        pc, traj, _ = move_and_capture(
            soa, n_tris, pose, pose, pc, traj, jax.random.PRNGKey(rot), intr,
            n_steps=1, n_azim=8, n_slots=4096, gathering_factor=0.5,
            sensor_range=70.0,
        )

    # Observed height-slice projection (the walls the camera saw at its own
    # height) vs the analytic GT obstacle map.
    pts = pc.points
    valid = pc.valid_mask()
    cam_y = cam[1]
    height_slice = valid & (pts[:, 1] < cam_y + 0.1) & (pts[:, 1] > cam_y - 0.1)
    obs = np.asarray(count_img(pts, height_slice, cam[:3], 256,
                               (-40.0, 40.0))) > 0
    gt_map = np.asarray(gt_obstacle_map(tris, n_tris, cam)) > 0

    assert gt_map.sum() > 100  # the map is non-trivial
    # Every observed wall pixel should be on or next to a GT obstacle pixel.
    grown = gt_map.copy()
    for s in (1, -1):
        grown |= np.roll(gt_map, s, axis=0) | np.roll(gt_map, s, axis=1)
    hit_rate = (obs & grown).sum() / max(obs.sum(), 1)
    assert hit_rate > 0.85, hit_rate
