"""Bisect rollout stages on the current JAX backend (debug utility)."""
import os, time
import sys; sys.path.insert(0, "/root/repo")
from nextbestpath_tpu.utils.jaxcache import enable_cache  # noqa: E402

enable_cache()
import jax, jax.numpy as jnp, numpy as np
print("backend:", jax.default_backend(), flush=True)
from nextbestpath_tpu.assets import generate_scene, pack_generated_scene
from nextbestpath_tpu.config import default_params
from nextbestpath_tpu.geometry.cameras import CameraIntrinsics
from nextbestpath_tpu.ops.raytrace import tris_to_soa
from nextbestpath_tpu.sim import PointBuffer, TrajectoryBuffer, move_and_capture, build_scene_tables
p = default_params(image_height=64, image_width=114, points_per_frame=1024, full_pc_capacity=262144, n_gt_surface_points=4096)
scn = generate_scene("simple", seed=8); assets = pack_generated_scene(scn, params=p)
soa = tris_to_soa(jnp.asarray(assets.tris)); nt = jnp.asarray(assets.n_tris, jnp.int32)
intr = CameraIntrinsics(64, 114, 60.0, 1.0, 750.0)
t0=time.time()
tables = build_scene_tables(soa, nt, jnp.asarray(assets.pose_origin), assets.pose_l, assets.pose_h)
tables.inside.block_until_ready(); print("tables", time.time()-t0, flush=True)
pc = PointBuffer.create(262144); traj = TrajectoryBuffer.create(64)
pose = jnp.asarray([7.,3.3,7.,0.,0.], jnp.float32)
t0=time.time()
pc, traj, zb = move_and_capture(soa, nt, pose, pose, pc, traj, jax.random.PRNGKey(0), intr, n_slots=1024)
zb.block_until_ready(); print("move_and_capture compile+run", time.time()-t0, "count", int(pc.count), flush=True)
t0=time.time()
for i in range(5):
    pc, traj, zb = move_and_capture(soa, nt, pose, pose, pc, traj, jax.random.PRNGKey(i), intr, n_slots=1024)
zb.block_until_ready(); print("move x5", time.time()-t0, flush=True)
from nextbestpath_tpu.ops.coverage import coverage_percentage
gt = jnp.asarray(assets.gt_surface)
t0=time.time(); c = coverage_percentage(gt, pc.points, pc.count, jax.random.PRNGKey(0)); c.block_until_ready(); print("coverage compile+run", time.time()-t0, float(c), flush=True)
t0=time.time(); c = coverage_percentage(gt, pc.points, pc.count, jax.random.PRNGKey(1)); c.block_until_ready(); print("coverage run", time.time()-t0, float(c), flush=True)
from nextbestpath_tpu.eval.nbp_planning import build_model_input
from nextbestpath_tpu.ops.scatter2d import height_bins
yb = height_bins(jnp.float32(0.0), jnp.float32(9.0), 4)
t0=time.time(); mi, ti = build_model_input(pc, traj, pose[:3], yb); mi.block_until_ready(); print("model_input compile+run", time.time()-t0, flush=True)
from nextbestpath_tpu.models import NBP
model = NBP()
t0=time.time(); variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1,256,256,5)), train=False); print("nbp init", time.time()-t0, flush=True)
fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
t0=time.time(); vm, om = fwd(variables, mi); om.block_until_ready(); print("nbp forward compile+run", time.time()-t0, flush=True)
t0=time.time(); vm, om = fwd(variables, mi); om.block_until_ready(); print("nbp forward run", time.time()-t0, flush=True)
from nextbestpath_tpu.planning.grid_paths import layout_edge_blocked, bfs_distance_field, extract_path
t0=time.time(); lb = layout_edge_blocked(tables.positions, pose[:3], om[0,:,:,0], assets.pose_l, assets.pose_h); lb.block_until_ready(); print("layout_edges compile+run", time.time()-t0, flush=True)
t0=time.time(); dist = bfs_distance_field(lb, jnp.asarray([1,1]), assets.pose_l, assets.pose_h); dist.block_until_ready(); print("bfs compile+run", time.time()-t0, flush=True)
t0=time.time(); path, plen, reach = extract_path(dist, lb, jnp.asarray([5,5]), assets.pose_l, assets.pose_h, max_len=96); path.block_until_ready(); print("extract compile+run", time.time()-t0, flush=True)
print("ALL STAGES OK", flush=True)
