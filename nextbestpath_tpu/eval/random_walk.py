"""Random-walk exploration baseline.

Analog of macarons/testers/random_walk_planning.py:25-400: the agent picks a
random collision-free neighboring pose each step, with the same mapping and
coverage harness as the NBP tester. Collision checks use the per-scene GT
edge table instead of per-step trimesh queries.
"""

from __future__ import annotations

import time
from typing import List, NamedTuple, Optional

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
from .scan_rollout import (
    SceneArrays,
    _pad_scene_arrays,
    scene_arrays_from_assets,
)

_DIRS_ARR = jnp.asarray(DIRS, jnp.int32)
_RW_PROGRAM_CACHE = {}


class RWState(NamedTuple):
    pc: PointBuffer
    traj: TrajectoryBuffer
    cur: jnp.ndarray  # (3,) int32
    key: jax.Array


class ScanRandomWalk:
    """Fully-jitted random-walk baseline, vmapped over padded scenes.

    Same decision rule as random_walk_rollout (a uniformly random unblocked
    neighbor + a uniformly random rotation each pose), same mapping/coverage
    harness as the scan NBP rollout — one compiled program per configuration,
    scenes as runtime args.
    """

    def __init__(self, assets_list, params: Optional[Params] = None,
                 interpret: Optional[bool] = None):
        assert assets_list
        # Elevation is baked into the shared compiled program (_pose5 uses
        # scene 0's), so it must match across scenes — a silent mismatch
        # would render other scenes at the wrong camera pitch.
        shapes = {(a.pose_l, a.pose_h, a.n_azim,
                   float(a.elevations_deg[2])) for a in assets_list}
        assert len(shapes) == 1, f"pad scenes to a common lattice first ({shapes})"
        self.p = params or default_params()
        p = self.p
        self.interpret = interpret
        self.assets_list = list(assets_list)
        self.intr = CameraIntrinsics(
            image_height=int(p.image_height), image_width=int(p.image_width),
            fov_degrees=float(p.fov_degrees), znear=float(p.camera_znear),
            zfar=float(p.zfar),
        )
        a0 = assets_list[0]
        self.L, self.H, self.A = a0.pose_l, a0.pose_h, a0.n_azim
        self.elev2 = float(a0.elevations_deg[2])
        f_max = max(a.tris.shape[0] for a in assets_list)
        g_max = max(len(a.gt_surface) for a in assets_list)
        scenes = []
        for a in assets_list:
            scene, _ = scene_arrays_from_assets(a, n_pieces=int(p.n_pieces),
                                                interpret=interpret)
            scenes.append(_pad_scene_arrays(scene, f_max, g_max))
        self.scene_batch = jax.tree.map(lambda *xs: jnp.stack(xs), *scenes)
        self.n_scenes = len(scenes)

    def _sig(self):
        p = self.p
        return ("rw", self.intr, self.L, self.H, self.A, self.elev2,
                self.interpret, self.n_scenes, int(p.points_per_frame),
                float(p.gathering_factor), float(p.sensor_range),
                int(p.n_interpolation_steps))

    def _pose5(self, scene: SceneArrays, idx3):
        pos = scene.positions[idx3[0], idx3[1]]
        azim = scene.azims[idx3[2]]
        return jnp.asarray(
            [pos[0], pos[1], pos[2], self.elev2, 0.0], jnp.float32
        ).at[4].set(azim)

    def _step(self, scene: SceneArrays, state: RWState, pose_i):
        p = self.p
        key, k_cov, k_dir, k_rot, k_move = jax.random.split(state.key, 5)
        cov = coverage_percentage(scene.gt, state.pc.points, state.pc.count,
                                  k_cov, fast_sampling=True,
                                  gt_valid=scene.gt_valid)
        open_mask = ~scene.gt_edge_blocked[:, state.cur[0], state.cur[1]]
        logits = jnp.where(open_mask, 0.0, -jnp.inf)
        d = jax.random.categorical(k_dir, logits)
        step_lh = jnp.where(jnp.any(open_mask), _DIRS_ARR[d],
                            jnp.zeros(2, jnp.int32))
        rot = jax.random.randint(k_rot, (), 0, self.A)
        nxt = jnp.concatenate([state.cur[:2] + step_lh, rot[None]])
        pc, traj, _ = move_and_capture(
            scene.tri_soa, scene.n_tris, self._pose5(scene, state.cur),
            self._pose5(scene, nxt), state.pc, state.traj, k_move, self.intr,
            n_steps=int(p.n_interpolation_steps), n_azim=self.A,
            n_slots=int(p.points_per_frame),
            gathering_factor=float(p.gathering_factor),
            sensor_range=float(p.sensor_range), interpret=self.interpret,
        )
        return RWState(pc=pc, traj=traj, cur=nxt, key=key), cov

    def _rollout_fn(self, n_poses: int):
        # The cached closure captures self via self._step, pinning the FIRST
        # instance per signature for the process lifetime (bounded: one
        # instance per distinct config, reused by later same-sig instances
        # because the step depends only on _sig fields).
        sig = self._sig() + (n_poses,)
        if sig not in _RW_PROGRAM_CACHE:
            step = self._step
            vstep = jax.vmap(step, in_axes=(0, 0, None))

            @jax.jit
            def rollout(scene_batch, states):
                def body(s, i):
                    return vstep(scene_batch, s, i)

                return jax.lax.scan(body, states, jnp.arange(n_poses))

            _RW_PROGRAM_CACHE[sig] = rollout
        return _RW_PROGRAM_CACHE[sig]

    def initial_state(self, scene_idx: int, seed: int,
                      n_poses: int) -> RWState:
        p = self.p
        a = self.assets_list[scene_idx]
        scene = jax.tree.map(lambda x: x[scene_idx], self.scene_batch)
        key = jax.random.PRNGKey(seed)
        key, k0 = jax.random.split(key)
        pc = PointBuffer.create(int(p.full_pc_capacity))
        traj = TrajectoryBuffer.create(8 * (n_poses + 4))
        start = a.start_cam_idx
        cur = jnp.asarray([int(start[0]), int(start[2]), int(start[4])],
                          jnp.int32)
        pose0 = self._pose5(scene, cur)
        pc, traj, _ = move_and_capture(
            scene.tri_soa, scene.n_tris, pose0, pose0, pc, traj, k0,
            self.intr, n_steps=int(p.n_interpolation_steps), n_azim=self.A,
            n_slots=int(p.points_per_frame),
            gathering_factor=float(p.gathering_factor),
            sensor_range=float(p.sensor_range), interpret=self.interpret,
        )
        return RWState(pc=pc, traj=traj, cur=cur, key=key)

    def run(self, n_poses: int = 200, seed: int = 8) -> List[RolloutResult]:
        states = [self.initial_state(i, seed + i, n_poses)
                  for i in range(self.n_scenes)]
        batched = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
        rollout = self._rollout_fn(n_poses)
        t1 = time.time()
        final, coverage = rollout(self.scene_batch, batched)
        coverage = np.asarray(coverage)  # (n_poses, n_scenes)
        wall = time.time() - t1
        return [
            RolloutResult(
                coverage_evolution=[float(c) for c in coverage[:, i]],
                auc=compute_auc(coverage[:, i]),
                cam_positions=np.asarray(
                    final.traj.xyz[i][: int(final.traj.count[i])]),
                wall_time_s=wall,
                n_points=int(final.pc.count[i]),
                # Fleet-aggregate rate (matches BatchedScanRollout's
                # convention): total poses across ALL scenes per second.
                steps_per_sec=self.n_scenes * n_poses / wall,
            )
            for i in range(self.n_scenes)
        ]


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
