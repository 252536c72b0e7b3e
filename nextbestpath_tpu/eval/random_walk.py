"""Random-walk exploration baseline.

Analog of macarons/testers/random_walk_planning.py:25-400: the agent picks a
random collision-free neighboring pose each step, with the same mapping and
coverage harness as the NBP tester. Collision checks use the per-scene GT
edge table instead of per-step trimesh queries.
"""

from __future__ import annotations

import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..assets.scene_assets import SceneAssets
from ..config import Params, default_params
from ..geometry.cameras import CameraIntrinsics
from ..ops.coverage import compute_auc, coverage_percentage
from ..ops.raytrace import tris_to_soa
from ..planning.grid_paths import DIRS
from ..sim.rollout import TrajectoryBuffer, move_and_capture
from ..sim.sensor import PointBuffer
from ..sim.tables import build_scene_tables
from .nbp_planning import RolloutResult


def random_walk_rollout(assets: SceneAssets, params: Optional[Params] = None,
                        n_poses: int = 200, seed: int = 8,
                        interpret: Optional[bool] = None,
                        verbose: bool = False) -> RolloutResult:
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
    gt = jnp.asarray(assets.gt_surface)
    L, H, n_azim = assets.pose_l, assets.pose_h, assets.n_azim
    tables = build_scene_tables(tri_soa, n_tris,
                                jnp.asarray(assets.pose_origin), L, H,
                                interpret=interpret)
    blocked = np.asarray(tables.gt_edge_blocked)
    positions = np.asarray(tables.positions)

    def pose5(idx):
        i_l, i_h, rot = idx
        pos = positions[i_l, i_h]
        return jnp.asarray([pos[0], pos[1], pos[2],
                            assets.elevations_deg[2],
                            assets.azimuths_deg[rot]], jnp.float32)

    pc = PointBuffer.create(int(p.full_pc_capacity))
    traj = TrajectoryBuffer.create(8 * (n_poses + 4))
    start = assets.start_cam_idx
    cur = (int(start[0]), int(start[2]), int(start[4]))

    t1 = time.time()
    pose0 = pose5(cur)
    pc, traj, _ = move_and_capture(
        tri_soa, n_tris, pose0, pose0, pc, traj, next_key(), intr,
        n_steps=int(p.n_interpolation_steps), n_azim=n_azim,
        n_slots=int(p.points_per_frame),
        gathering_factor=float(p.gathering_factor),
        sensor_range=float(p.sensor_range), interpret=interpret,
    )

    rng = np.random.default_rng(seed)
    coverage_evolution: List[float] = []
    for pose_i in range(n_poses):
        cov = float(coverage_percentage(gt, pc.points, pc.count, next_key()))
        coverage_evolution.append(cov)
        if verbose and pose_i % 20 == 0:
            print(f"rw pose {pose_i}: coverage {cov:.4f}")

        # Random unblocked neighbor move + random rotation.
        open_dirs = [d for d, _ in enumerate(DIRS)
                     if not blocked[d, cur[0], cur[1]]]
        if open_dirs:
            d = int(rng.choice(open_dirs))
            dl, dh = DIRS[d]
            nxt = (cur[0] + dl, cur[1] + dh, int(rng.integers(n_azim)))
        else:
            nxt = (cur[0], cur[1], int(rng.integers(n_azim)))

        pc, traj, _ = move_and_capture(
            tri_soa, n_tris, pose5(cur), pose5(nxt), pc, traj, next_key(),
            intr, n_steps=int(p.n_interpolation_steps), n_azim=n_azim,
            n_slots=int(p.points_per_frame),
            gathering_factor=float(p.gathering_factor),
            sensor_range=float(p.sensor_range), interpret=interpret,
        )
        cur = nxt

    wall = time.time() - t1
    return RolloutResult(
        coverage_evolution=coverage_evolution,
        auc=compute_auc(coverage_evolution),
        cam_positions=np.asarray(traj.xyz[: int(traj.count)]),
        wall_time_s=wall,
        n_points=int(pc.count),
        steps_per_sec=n_poses / wall,
    )
