"""Training rollout collection (the reference's trajectory_collection,
next_best_path/utility/nbp_utils.py:470-855).

Per scene and epoch: roll the agent with Boltzmann exploration over
NBP-predicted candidate values, follow ground-truth-edge Dijkstra paths, and
mine *path-suffix* training labels — every later pose on the executed path
becomes a (value-map pixel, coverage-gain) target for every earlier state
(:654-683). Experiences stream into the host ReplayDB.

TPU-native deltas (behavior-preserving):
- goal validity (inside air volume) and path edges (segment-vs-mesh) come
  from the per-scene static tables instead of per-call trimesh queries,
- the per-candidate Dijkstra loop is one distance field + masked selection,
- the GT obstacle map is the analytic plane-section rasterizer.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..assets.scene_assets import SceneAssets
from ..config import Params, default_params
from ..geometry.cameras import CameraIntrinsics
from ..ops.coverage import coverage_percentage
from ..ops.obstacle_map import gt_obstacle_map
from ..ops.raytrace import tris_to_soa
from ..ops.scatter2d import height_bins
from ..planning.candidates import boltzmann_first, score_candidates_train
from ..planning.grid_paths import (
    INF,
    bfs_distance_field,
    extract_path,
    pick_orientations,
)
from ..sim.rollout import TrajectoryBuffer, move_and_capture, observe_current
from ..sim.sensor import PointBuffer
from ..sim.tables import build_scene_tables
from ..eval.nbp_planning import build_model_input
from .replay import ReplayDB


def _suffix_labels(experiences: List[dict], value_map_size: int,
                   grid_range: Tuple[float, float]):
    """Path-suffix label mining (nbp_utils.py:654-683).

    experiences[i] = dict(coverage, model_input, gt_obs, cam_pose5 (np (5,)),
    rot (int)). For every pair i < j: project pose_j's position into pose_i's
    egocentric value-map frame; if in bounds, add pixel (rot_j, row, col)
    with gain max(0, (cov_j - cov_i) * 100).
    """
    out = []
    lo, hi = grid_range
    scale = value_map_size / (hi - lo)
    for i, ex in enumerate(experiences):
        pixels, gains = [], []
        cam = ex["cam_pose5"]
        for j in range(i + 1, len(experiences)):
            nxt = experiences[j]
            dx = nxt["cam_pose5"][0] - cam[0]
            dz = nxt["cam_pose5"][2] - cam[2]
            row = int(round((-dz - lo) * scale))
            col = int(round((-dx - lo) * scale))
            if 0 <= row < value_map_size and 0 <= col < value_map_size:
                gain = (nxt["coverage"] - ex["coverage"]) * 100.0
                pixels.append((int(nxt["rot"]), row, col))
                gains.append(max(gain, 0.0))
        if pixels:
            out.append((ex, np.asarray(pixels, np.int32),
                        np.asarray(gains, np.float32)))
    return out


def collect_trajectory(
    assets: SceneAssets,
    nbp_model,
    nbp_variables,
    db: ReplayDB,
    params: Optional[Params] = None,
    seed: int = 0,
    n_poses: int = 100,
    interpret: Optional[bool] = None,
    verbose: bool = False,
) -> List[float]:
    """One training rollout on one scene; experiences appended to db.

    Returns the coverage evolution.
    """
    p = params or default_params()
    key = jax.random.PRNGKey(seed)

    def next_key():
        nonlocal key
        key, k = jax.random.split(key)
        return k

    intr = CameraIntrinsics(
        image_height=int(p.image_height), image_width=int(p.image_width),
        fov_degrees=float(p.fov_degrees), znear=float(p.camera_znear),
        zfar=float(p.zfar),
    )
    tri_soa = tris_to_soa(jnp.asarray(assets.tris))
    n_tris = jnp.asarray(assets.n_tris, jnp.int32)
    tris_dev = jnp.asarray(assets.tris)
    gt = jnp.asarray(assets.gt_surface)
    L, H, n_azim = assets.pose_l, assets.pose_h, assets.n_azim
    tables = build_scene_tables(tri_soa, n_tris,
                                jnp.asarray(assets.pose_origin), L, H,
                                interpret=interpret)
    verts_y = assets.tris[: assets.n_tris, :, 1]
    y_bins = height_bins(jnp.float32(verts_y.min()), jnp.float32(verts_y.max()),
                         int(p.n_pieces))
    grid_range = tuple(p.prediction_range)
    vms = int(p.value_map_size[0])

    forward = jax.jit(lambda v, x: nbp_model.apply(v, x, train=False))

    pc = PointBuffer.create(int(p.full_pc_capacity))
    traj = TrajectoryBuffer.create(8 * (n_poses + 4))
    visited_rot = jnp.zeros((L, H, n_azim), bool)
    unreachable = np.zeros((L, H), bool)
    start = assets.start_cam_idx
    cur = (int(start[0]), int(start[2]), int(start[4]))
    visited_rot = visited_rot.at[cur[0], cur[1], cur[2]].set(True)

    positions_np = np.asarray(tables.positions)

    def pose5(idx):
        i_l, i_h, rot = idx
        pos = positions_np[i_l, i_h]
        return jnp.asarray(
            [pos[0], pos[1], pos[2], assets.elevations_deg[2],
             assets.azimuths_deg[rot]], jnp.float32)

    # Initial captures (setup_training_camera mirrors setup_test_camera).
    pose0 = pose5(cur)
    pc, traj, _ = move_and_capture(
        tri_soa, n_tris, pose0, pose0, pc, traj, next_key(), intr,
        n_steps=int(p.n_interpolation_steps), n_azim=n_azim,
        n_slots=int(p.points_per_frame),
        gathering_factor=float(p.gathering_factor),
        sensor_range=float(p.sensor_range), interpret=interpret,
    )

    coverage_evolution: List[float] = []
    experiences: List[dict] = []
    path: List[Tuple[int, int, int]] = []
    path_record = 0
    gt_blocked = tables.gt_edge_blocked
    gt_blocked_np = np.asarray(gt_blocked)
    inside = np.asarray(tables.inside)

    def flush_experiences():
        for ex, pixels, gains in _suffix_labels(experiences, vms, grid_range):
            db.append(ex["model_input"], ex["gt_obs"], pixels, gains,
                      ex["pose_i"])
        experiences.clear()

    for pose_i in range(n_poses):
        cov = float(coverage_percentage(gt, pc.points, pc.count, next_key()))
        coverage_evolution.append(cov)
        if verbose and pose_i % 10 == 0:
            print(f"collect pose {pose_i}: coverage {cov:.4f}")
        if cov > 0.95:  # nbp_utils.py:579
            break

        cur_pose5 = pose5(cur)
        pc = observe_current(
            tri_soa, n_tris, cur_pose5, pc, next_key(), intr,
            n_slots=int(p.points_per_frame),
            gathering_factor=float(p.gathering_factor),
            sensor_range=float(p.sensor_range), interpret=interpret,
        )
        model_input, _ = build_model_input(
            pc, traj, cur_pose5[:3], y_bins, n_pieces=int(p.n_pieces),
            img_size=int(p.pc2img_size[0]),
        )
        gt_obs = gt_obstacle_map(tris_dev, n_tris, cur_pose5,
                                 grid_size=int(p.pc2img_size[0]),
                                 grid_range=grid_range)

        if path_record >= len(path):
            flush_experiences()
            path, path_record = [], 0

            value_map, _ = forward(nbp_variables, model_input)
            scores = score_candidates_train(
                tables.positions, cur_pose5[:3], value_map[0],
                jnp.asarray([cur[0], cur[1]]), value_map_size=vms,
            )
            dist = bfs_distance_field(gt_blocked,
                                      jnp.asarray([cur[0], cur[1]]), L, H)
            dist_np = np.asarray(dist)
            scores_np = np.asarray(scores)

            # Boltzmann-sampled first candidate, then score-descending
            # fallbacks (nbp_utils.py:717-760).
            first = int(boltzmann_first(scores, next_key(), beta=0.5))
            order = list(np.argsort(-scores_np.reshape(-1)))
            order.remove(first)
            order.insert(0, first)

            chosen = None
            for flat in order:
                gl, gh = divmod(int(flat), H)
                if scores_np[gl, gh] <= -1e29:
                    break  # rest are inadmissible
                if not inside[gl, gh] or unreachable[gl, gh]:
                    continue
                if dist_np[gl, gh] >= int(INF) or dist_np[gl, gh] < 1:
                    unreachable[gl, gh] = True
                    continue
                chosen = (gl, gh)
                break

            if chosen is None:
                break  # no path anywhere -> end rollout (nbp_utils.py:758-764)

            path_arr, path_len, _ = extract_path(
                dist, gt_blocked, jnp.asarray(chosen), L, H,
                max_len=int(p.max_path_len),
            )
            rots = pick_orientations(
                path_arr, jnp.arange(int(p.max_path_len)) < path_len,
                value_map[0], tables.positions, cur_pose5[:3], visited_rot,
                next_key(), n_azim=n_azim, value_map_size=vms,
            )
            n = int(path_len)
            path_np = np.asarray(path_arr)
            rots_np = np.asarray(rots)
            path = [(int(path_np[i, 0]), int(path_np[i, 1]), int(rots_np[i]))
                    for i in range(n)]
            if not path:
                break

        experiences.append(dict(
            coverage=cov,
            model_input=np.asarray(model_input[0]).transpose(2, 0, 1),
            gt_obs=np.asarray(gt_obs),
            cam_pose5=np.asarray(cur_pose5),
            rot=cur[2],
            pose_i=pose_i,
        ))

        nxt = path[path_record]
        # Random rotation override p=0.6 (nbp_utils.py:766-768).
        if float(jax.random.uniform(next_key())) <= 0.6:
            rot = int(jax.random.randint(next_key(), (), 0, n_azim))
            nxt = (nxt[0], nxt[1], rot)

        new_pose5 = pose5(nxt)
        pc, traj, _ = move_and_capture(
            tri_soa, n_tris, cur_pose5, new_pose5, pc, traj, next_key(), intr,
            n_steps=int(p.n_interpolation_steps), n_azim=n_azim,
            n_slots=int(p.points_per_frame),
            gathering_factor=float(p.gathering_factor),
            sensor_range=float(p.sensor_range), interpret=interpret,
        )
        visited_rot = visited_rot.at[nxt[0], nxt[1], nxt[2]].set(True)
        cur = nxt
        path_record += 1

    flush_experiences()
    return coverage_evolution
