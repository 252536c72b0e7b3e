"""Probe the planning-path stages not covered by probe_rollout_stages."""
import os
import time

import sys

sys.path.insert(0, "/root/repo")
from nextbestpath_tpu.utils.jaxcache import enable_cache  # noqa: E402

enable_cache()
import jax
import jax.numpy as jnp
import numpy as np

print("backend:", jax.default_backend(), flush=True)
from nextbestpath_tpu.assets import generate_scene, pack_generated_scene
from nextbestpath_tpu.config import default_params
from nextbestpath_tpu.geometry.cameras import CameraIntrinsics
from nextbestpath_tpu.ops.raytrace import tris_to_soa
from nextbestpath_tpu.sim import (PointBuffer, TrajectoryBuffer,
                                  move_and_capture, observe_current,
                                  build_scene_tables)
from nextbestpath_tpu.eval.nbp_planning import build_model_input, fuse_layout
from nextbestpath_tpu.planning.candidates import score_candidates_test
from nextbestpath_tpu.planning.grid_paths import pick_orientations
from nextbestpath_tpu.ops.scatter2d import height_bins

p = default_params(image_height=64, image_width=114, points_per_frame=1024,
                   full_pc_capacity=262144, n_gt_surface_points=4096)
scn = generate_scene("simple", seed=8)
assets = pack_generated_scene(scn, params=p)
soa = tris_to_soa(jnp.asarray(assets.tris))
nt = jnp.asarray(assets.n_tris, jnp.int32)
intr = CameraIntrinsics(64, 114, 60.0, 1.0, 750.0)
tables = build_scene_tables(soa, nt, jnp.asarray(assets.pose_origin),
                            assets.pose_l, assets.pose_h)
pc = PointBuffer.create(262144)
traj = TrajectoryBuffer.create(48)  # the warmup-size capacity bench uses
pose = jnp.asarray([7.0, 3.3, 7.0, 0.0, 0.0], jnp.float32)
t0 = time.time()
pc, traj, zb = move_and_capture(soa, nt, pose, pose, pc, traj,
                                jax.random.PRNGKey(0), intr, n_slots=1024)
zb.block_until_ready()
print("move cap48 compile+run:", time.time() - t0, flush=True)
t0 = time.time()
pc = observe_current(soa, nt, pose, pc, jax.random.PRNGKey(1), intr,
                     n_slots=1024)
pc.count.block_until_ready()
print("observe compile+run:", time.time() - t0, flush=True)
yb = height_bins(jnp.float32(0.0), jnp.float32(9.0), 4)
t0 = time.time()
mi, ti = build_model_input(pc, traj, pose[:3], yb)
mi.block_until_ready()
print("model_input cap48:", time.time() - t0, flush=True)
t0 = time.time()
layout, proj = fuse_layout(jnp.zeros((256, 256)), pc, ti, pose)
layout.block_until_ready()
print("fuse_layout compile+run:", time.time() - t0, flush=True)
t0 = time.time()
scores = score_candidates_test(tables.positions, pose[:3],
                               jnp.zeros((64, 64, 8)), proj,
                               jnp.zeros((assets.pose_l, assets.pose_h), bool))
scores.block_until_ready()
print("score_candidates compile+run:", time.time() - t0, flush=True)
t0 = time.time()
rots = pick_orientations(
    jnp.zeros((96, 2), jnp.int32), jnp.ones(96, bool),
    jnp.zeros((64, 64, 8)), tables.positions, pose[:3],
    jnp.zeros((assets.pose_l, assets.pose_h, 8), bool),
    jax.random.PRNGKey(0))
rots.block_until_ready()
print("pick_orientations compile+run:", time.time() - t0, flush=True)
print("PLAN STAGES OK", flush=True)
