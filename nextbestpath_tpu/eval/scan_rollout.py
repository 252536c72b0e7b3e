"""Fully-jitted NBP evaluation rollout: one lax.scan over poses.

The host-orchestrated rollout (eval/nbp_planning.py) reproduces the reference
loop stage by stage but pays a host<->device round trip per stage per pose.
This module packs the ENTIRE per-pose step — frame capture, backprojection,
coverage metric, model input, NBP forward, layout fusion, candidate scoring,
shortest-path planning with bounded collision retries, memo updates, and the
move — into a single jitted ``lax.scan`` step over a SimState pytree
(SURVEY.md §7 step 5). Data-dependent control flow becomes ``lax.cond``
(plan regeneration) and a bounded ``fori_loop`` (candidate-retry after a
first-segment ground-truth collision).

Behavioral deltas vs the host driver (both documented):
* the reference's dead NBP forward on non-regen poses is skipped (its output
  is unused, nbp_planning.py:252),
* the anti-revisit check uses a visited-(position, rotation) grid rather than
  a growing history list (same semantics: poses are marked when occupied).

vmap over scenes / pjit over chips applies directly to ``run_scan_rollout``'s
jitted step since SimState is a fixed-shape pytree.
"""

from __future__ import annotations

import time
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..assets.scene_assets import SceneAssets
from ..config import Params, default_params
from ..geometry.cameras import CameraIntrinsics
from ..models.unet import NBP
from ..ops.coverage import compute_auc, coverage_percentage
from ..ops.raytrace import tris_to_soa
from ..ops.scatter2d import height_bins
from ..planning.candidates import score_candidates_test
from ..planning.grid_paths import (
    DIRS,
    EDGE_COLLISION,
    EDGE_PASSABLE,
    INF,
    apply_edge_memo,
    bfs_distance_field,
    extract_path,
    layout_edge_blocked,
    pick_orientations,
)
from ..sim.rollout import TrajectoryBuffer, move_and_capture, observe_current
from ..sim.sensor import PointBuffer
from ..sim.tables import SceneTables, build_scene_tables
from .nbp_planning import OBSTACLE_THRESHOLD, RolloutResult, build_model_input, fuse_layout, select_goal

_DIRS_ARR = jnp.asarray(DIRS, jnp.int32)  # (4, 2)


def _edge_dir_index(a_lh: jnp.ndarray, b_lh: jnp.ndarray):
    """Direction index of edge a->b, or -1 when not a unit move."""
    d = b_lh - a_lh
    matches = jnp.all(_DIRS_ARR == d[None, :], axis=-1)
    return jnp.where(jnp.any(matches), jnp.argmax(matches), -1)


def _memo_edge(memo: jnp.ndarray, a_lh: jnp.ndarray, b_lh: jnp.ndarray,
               state: int) -> jnp.ndarray:
    """Set memo for edge a->b and its reverse (drop when not adjacent)."""
    d_ab = _edge_dir_index(a_lh, b_lh)
    d_ba = _edge_dir_index(b_lh, a_lh)
    L, H = memo.shape[1], memo.shape[2]

    def put(m, d, n):
        idx_d = jnp.where(d >= 0, d, 4)  # 4 = dropped (out of bounds)
        return m.at[idx_d, n[0], n[1]].set(jnp.int8(state), mode="drop")

    memo = put(memo, d_ab, a_lh)
    memo = put(memo, d_ba, b_lh)
    return memo


class SceneArrays(NamedTuple):
    """Per-scene device constants, explicit so rollouts vmap over scenes."""

    tri_soa: jnp.ndarray        # (9, F)
    n_tris: jnp.ndarray         # scalar int32
    gt: jnp.ndarray             # (G, 3)
    gt_valid: jnp.ndarray       # (G,) bool (padding mask for batching)
    positions: jnp.ndarray      # (L, H, 3)
    gt_edge_blocked: jnp.ndarray  # (4, L, H)
    y_bins: jnp.ndarray         # (n_pieces + 1,)
    azims: jnp.ndarray          # (A,)


class ScanState(NamedTuple):
    pc: PointBuffer
    traj: TrajectoryBuffer
    cur: jnp.ndarray          # (3,) int32: (i_l, i_h, rot)
    prev: jnp.ndarray         # (3,) int32: previous pose (for passable memo)
    has_prev: jnp.ndarray     # bool
    path: jnp.ndarray         # (P, 3) int32 waypoints incl. rotation
    path_len: jnp.ndarray     # int32 (0 = no path)
    path_record: jnp.ndarray  # int32
    edge_memo: jnp.ndarray    # (4, L, H) int8
    banned: jnp.ndarray       # (L, H) bool
    visited_rot: jnp.ndarray  # (L, H, A) bool: all occupied (pos, rot)
    key: jax.Array


class ScanRollout:
    """Builder for the jitted scan step; one instance per scene shape."""

    def __init__(self, assets: SceneAssets, nbp_model: NBP, nbp_variables,
                 params: Optional[Params] = None,
                 interpret: Optional[bool] = None,
                 max_plan_retries: int = 4,
                 ablate: Tuple[str, ...] = ()):
        # ablate: profiling switch ('coverage' | 'plan' | 'capture' |
        # 'model_input') removes a stage from the step to attribute cost.
        self.ablate = tuple(ablate)
        self.p = params or default_params()
        p = self.p
        self.assets = assets
        self.model = nbp_model
        self.variables = nbp_variables
        self.intr = CameraIntrinsics(
            image_height=int(p.image_height), image_width=int(p.image_width),
            fov_degrees=float(p.fov_degrees), znear=float(p.camera_znear),
            zfar=float(p.zfar),
        )
        self.interpret = interpret
        self.max_plan_retries = max_plan_retries

        self.tri_soa = tris_to_soa(jnp.asarray(assets.tris))
        self.n_tris = jnp.asarray(assets.n_tris, jnp.int32)
        self.gt = jnp.asarray(assets.gt_surface)
        self.tables: SceneTables = build_scene_tables(
            self.tri_soa, self.n_tris, jnp.asarray(assets.pose_origin),
            assets.pose_l, assets.pose_h, interpret=interpret,
        )
        verts_y = assets.tris[: assets.n_tris, :, 1]
        self.y_bins = height_bins(jnp.float32(verts_y.min()),
                                  jnp.float32(verts_y.max()), int(p.n_pieces))
        self.L, self.H, self.A = assets.pose_l, assets.pose_h, assets.n_azim
        self.elev2 = float(assets.elevations_deg[2])
        self.azims = jnp.asarray(assets.azimuths_deg)
        self.scene = SceneArrays(
            tri_soa=self.tri_soa, n_tris=self.n_tris, gt=self.gt,
            gt_valid=jnp.ones(self.gt.shape[0], bool),
            positions=self.tables.positions,
            gt_edge_blocked=self.tables.gt_edge_blocked,
            y_bins=self.y_bins, azims=self.azims,
        )

    # -- pose helpers -------------------------------------------------------

    def _pose5(self, scene: SceneArrays, idx3: jnp.ndarray) -> jnp.ndarray:
        pos = scene.positions[idx3[0], idx3[1]]
        azim = scene.azims[idx3[2]]
        return jnp.asarray(
            [pos[0], pos[1], pos[2], self.elev2, 0.0], jnp.float32
        ).at[4].set(azim)

    # -- planning branch ----------------------------------------------------

    def _plan(self, scene: SceneArrays, model_input, pc: PointBuffer,
              traj_img, cur_pose5, cur, edge_memo, banned, visited_rot, key):
        p = self.p
        L, H, A = self.L, self.H, self.A
        value_map, obstacle_map = self.model.apply(self.variables,
                                                   model_input, train=False)
        layout, proj256 = fuse_layout(obstacle_map[0, :, :, 0], pc, traj_img,
                                      cur_pose5,
                                      img_size=int(p.pc2img_size[0]))
        scores = score_candidates_test(
            scene.positions, cur_pose5[:3], value_map[0], proj256,
            banned, value_map_size=int(p.value_map_size[0]),
            layout_size=int(p.pc2img_size[0]),
        )
        layout_blocked = layout_edge_blocked(
            scene.positions, cur_pose5[:3], layout, L, H,
            layout_size=int(p.pc2img_size[0]),
        )
        gt_eb = scene.gt_edge_blocked
        max_len = int(p.max_path_len)
        cur_lh = cur[:2]

        def retry_body(_, carry):
            memo, banned_c, path, path_len, done = carry

            def attempt(memo, banned_c):
                blocked = apply_edge_memo(layout_blocked, memo)
                dist = bfs_distance_field(blocked, cur_lh, L, H)
                goal, found = select_goal(scores, dist, L, H)
                path_arr, plen, reach = extract_path(dist, blocked, goal, L,
                                                     H, max_len=max_len)
                rots = pick_orientations(
                    path_arr, jnp.arange(max_len) < plen, value_map[0],
                    scene.positions, cur_pose5[:3], visited_rot,
                    key, n_azim=A, value_map_size=int(p.value_map_size[0]),
                )
                first = path_arr[0]
                d_idx = _edge_dir_index(cur_lh, first)
                d_safe = jnp.clip(d_idx, 0, 3)
                first_collides = (
                    (d_idx >= 0)
                    & gt_eb[d_safe, cur_lh[0], cur_lh[1]]
                    & found & (plen > 0)
                )
                ok = found & (plen > 0) & (~first_collides)
                new_path = jnp.concatenate(
                    [path_arr, rots[:, None].astype(jnp.int32)], axis=-1
                )
                memo2 = jnp.where(first_collides,
                                  _memo_edge(memo, cur_lh, first,
                                             EDGE_COLLISION), memo)
                return memo2, banned_c, jnp.where(ok, new_path, 0), \
                    jnp.where(ok, plen, 0), ok | (~found)
                # ~found: nothing reachable at all -> stop retrying (done
                # with empty path, like the reference's exhausted candidate
                # list).

            new = jax.lax.cond(
                done,
                lambda m, b: (m, b, path, path_len, done),
                attempt,
                memo, banned_c,
            )
            return new

        memo, banned2, path, path_len, _ = jax.lax.fori_loop(
            0, self.max_plan_retries, retry_body,
            (edge_memo, banned,
             jnp.zeros((max_len, 3), jnp.int32), jnp.int32(0),
             jnp.bool_(False)),
        )
        return memo, banned2, path, path_len

    # -- the scan step ------------------------------------------------------

    def make_step(self):
        """step(state, pose_i) bound to this rollout's scene."""
        scene_step = self.make_scene_step()

        def step(state, pose_i):
            return scene_step(self.scene, state, pose_i)

        return step

    def make_scene_step(self):
        """step(scene, state, pose_i) with the scene as an explicit pytree
        argument — vmap over a stacked SceneArrays batches rollouts."""
        p = self.p
        L, H, A = self.L, self.H, self.A

        ablate = self.ablate

        def step(scene: SceneArrays, state: ScanState, pose_i):
            gt_eb = scene.gt_edge_blocked
            key, k_cov, k_obs, k_rot, k_rot2, k_move, k_plan = (
                jax.random.split(state.key, 7))

            if "coverage" in ablate:
                cov = jnp.float32(0.0)
            else:
                cov = coverage_percentage(scene.gt, state.pc.points,
                                          state.pc.count, k_cov,
                                          fast_sampling=True,
                                          gt_valid=scene.gt_valid)
            cur_pose5 = self._pose5(scene, state.cur)
            pc = observe_current(
                scene.tri_soa, scene.n_tris, cur_pose5, state.pc, k_obs,
                self.intr, n_slots=int(p.points_per_frame),
                gathering_factor=float(p.gathering_factor),
                sensor_range=float(p.sensor_range), interpret=self.interpret,
            )
            if "model_input" in ablate:
                S = int(p.pc2img_size[0])
                model_input = jnp.zeros((1, S, S, int(p.n_pieces) + 1))
                traj_img = jnp.zeros((S, S))
            else:
                model_input, traj_img = build_model_input(
                    pc, state.traj, cur_pose5[:3], scene.y_bins,
                    n_pieces=int(p.n_pieces), img_size=int(p.pc2img_size[0]),
                )

            # Regen condition + collision memo (nbp_planning.py:134-160).
            path_exhausted = state.path_record >= state.path_len
            nxt_candidate = state.path[
                jnp.clip(state.path_record, 0, state.path.shape[0] - 1)]
            d_idx = _edge_dir_index(state.cur[:2], nxt_candidate[:2])
            d_safe = jnp.clip(d_idx, 0, 3)
            next_collides = (
                (~path_exhausted)
                & (d_idx >= 0)
                & gt_eb[d_safe, state.cur[0], state.cur[1]]
            )
            regen = (pose_i == 0) | path_exhausted | next_collides | (d_idx < 0)

            goal = state.path[jnp.clip(state.path_len - 1, 0,
                                       state.path.shape[0] - 1)]
            edge_memo = jnp.where(
                next_collides,
                _memo_edge(state.edge_memo, state.cur[:2],
                           nxt_candidate[:2], EDGE_COLLISION),
                state.edge_memo,
            )
            banned = state.banned.at[goal[0], goal[1]].set(
                state.banned[goal[0], goal[1]] | next_collides)

            # Passable memo between the last two loop-start poses
            # (nbp_planning.py:149-155).
            edge_memo = jnp.where(
                state.has_prev,
                _memo_edge(edge_memo, state.cur[:2], state.prev[:2],
                           EDGE_PASSABLE),
                edge_memo,
            )

            def do_plan(memo, bann):
                return self._plan(scene, model_input, pc, traj_img,
                                  cur_pose5, state.cur, memo, bann,
                                  state.visited_rot, k_plan)

            def keep_plan(memo, bann):
                return memo, bann, state.path, state.path_len

            if "plan" in ablate:
                do_plan = keep_plan
            edge_memo, banned, path, path_len = jax.lax.cond(
                regen, do_plan, keep_plan, edge_memo, banned)
            path_record = jnp.where(regen, 0, state.path_record)

            # Next index (nbp_planning.py:252-266).
            no_path = path_len == 0
            rand_rot = jax.random.randint(k_rot, (), 0, A)
            nxt = jnp.where(
                no_path,
                jnp.asarray([state.cur[0], state.cur[1], 0]).at[2].set(rand_rot),
                path[jnp.clip(path_record, 0, path.shape[0] - 1)],
            )
            # Anti-revisit: random rotation when (pos, rot) already occupied.
            revisit = state.visited_rot[nxt[0], nxt[1], nxt[2]]
            rand_rot2 = jax.random.randint(k_rot2, (), 0, A)
            nxt = nxt.at[2].set(jnp.where(revisit & (~no_path), rand_rot2,
                                          nxt[2]))

            new_pose5 = self._pose5(scene, nxt)
            pc, traj, _ = move_and_capture(
                scene.tri_soa, scene.n_tris, cur_pose5, new_pose5, pc,
                state.traj, k_move, self.intr,
                n_steps=int(p.n_interpolation_steps), n_azim=A,
                n_slots=int(p.points_per_frame),
                gathering_factor=float(p.gathering_factor),
                sensor_range=float(p.sensor_range), interpret=self.interpret,
            )
            visited_rot = state.visited_rot.at[nxt[0], nxt[1], nxt[2]].set(True)

            new_state = ScanState(
                pc=pc, traj=traj, cur=nxt, prev=state.cur,
                has_prev=jnp.bool_(True), path=path, path_len=path_len,
                path_record=path_record + 1, edge_memo=edge_memo,
                banned=banned, visited_rot=visited_rot, key=key,
            )
            return new_state, cov

        return step

    def initial_state(self, seed: int = 8, n_poses: int = 101) -> ScanState:
        p = self.p
        key = jax.random.PRNGKey(seed)
        key, k0 = jax.random.split(key)
        pc = PointBuffer.create(int(p.full_pc_capacity))
        traj = TrajectoryBuffer.create(8 * (n_poses + 4))
        start = self.assets.start_cam_idx
        cur = jnp.asarray([int(start[0]), int(start[2]), int(start[4])],
                          jnp.int32)
        pose0 = self._pose5(self.scene, cur)
        pc, traj, _ = move_and_capture(
            self.tri_soa, self.n_tris, pose0, pose0, pc, traj, k0, self.intr,
            n_steps=int(p.n_interpolation_steps), n_azim=self.A,
            n_slots=int(p.points_per_frame),
            gathering_factor=float(p.gathering_factor),
            sensor_range=float(p.sensor_range), interpret=self.interpret,
        )
        visited = jnp.zeros((self.L, self.H, self.A), bool)
        visited = visited.at[cur[0], cur[1], cur[2]].set(True)
        return ScanState(
            pc=pc, traj=traj, cur=cur, prev=cur, has_prev=jnp.bool_(False),
            path=jnp.zeros((int(p.max_path_len), 3), jnp.int32),
            path_len=jnp.int32(0), path_record=jnp.int32(0),
            edge_memo=jnp.zeros((4, self.L, self.H), jnp.int8),
            banned=jnp.zeros((self.L, self.H), bool),
            visited_rot=visited, key=key,
        )

    def _rollout_fn(self, n_poses: int):
        """Cached jitted scan program (compiled once per pose count)."""
        if not hasattr(self, "_rollout_cache"):
            self._rollout_cache = {}
        if n_poses not in self._rollout_cache:
            step = self.make_step()

            @jax.jit
            def rollout(state):
                return jax.lax.scan(step, state, jnp.arange(n_poses))

            self._rollout_cache[n_poses] = rollout
        return self._rollout_cache[n_poses]

    def run(self, n_poses: int = 101, seed: int = 8) -> RolloutResult:
        rollout = self._rollout_fn(n_poses)
        state = self.initial_state(seed=seed, n_poses=n_poses)
        t1 = time.time()
        final, coverage = rollout(state)
        coverage = np.asarray(coverage)
        wall = time.time() - t1
        cam = np.asarray(final.traj.xyz[: int(final.traj.count)])
        return RolloutResult(
            coverage_evolution=[float(c) for c in coverage],
            auc=compute_auc(coverage),
            cam_positions=cam,
            wall_time_s=wall,
            n_points=int(final.pc.count),
            steps_per_sec=n_poses / wall,
        )


# ---------------------------------------------------------------------------
# Batched rollouts: vmap over scenes (the reference's one-scene-per-GPU data
# parallelism, SURVEY.md §2.3, expressed as a batch axis on one chip; shard
# the same axis over a Mesh for multi-chip).
# ---------------------------------------------------------------------------


def _pad_gt(gt: np.ndarray, target: int):
    pad = target - len(gt)
    valid = np.zeros(target, bool)
    valid[: len(gt)] = True
    if pad > 0:
        gt = np.concatenate([gt, np.full((pad, 3), 1e7, np.float32)])
    return gt, valid


class BatchedScanRollout:
    """vmap the scan step over a batch of same-lattice scenes.

    Tradeoff: under vmap, lax.cond lowers to both-branches execution, so the
    plan-regeneration pipeline runs every pose for every scene (the
    single-scene rollout only pays it on actual regens). Batched mode
    therefore maximizes *throughput per program* only when plans regenerate
    often; for sparse regens the single-scene rollout is faster per scene.
    Sharding the scene axis over a multi-chip Mesh recovers linear scaling
    either way."""

    def __init__(self, assets_list, nbp_model: NBP, nbp_variables,
                 params: Optional[Params] = None,
                 interpret: Optional[bool] = None):
        assert assets_list, "need at least one scene"
        shapes = {(a.pose_l, a.pose_h, a.n_azim) for a in assets_list}
        assert len(shapes) == 1, (
            "batched rollouts need a common pose lattice; pad/buck scenes "
            f"first (got {shapes})")
        f_max = max(a.tris.shape[0] for a in assets_list)
        g_max = max(len(a.gt_surface) for a in assets_list)

        self.rollouts = [
            ScanRollout(a, nbp_model, nbp_variables, params=params,
                        interpret=interpret)
            for a in assets_list
        ]
        base = self.rollouts[0]
        self.p = base.p
        self.n_scenes = len(assets_list)

        scenes = []
        for r, a in zip(self.rollouts, assets_list):
            tri_soa = np.asarray(r.tri_soa)
            if tri_soa.shape[1] < f_max:
                pad = np.full((9, f_max - tri_soa.shape[1]), 1e8, np.float32)
                tri_soa = np.concatenate([tri_soa, pad], axis=1)
            gt, gt_valid = _pad_gt(np.asarray(r.gt), g_max)
            scenes.append(SceneArrays(
                tri_soa=jnp.asarray(tri_soa), n_tris=r.n_tris,
                gt=jnp.asarray(gt), gt_valid=jnp.asarray(gt_valid),
                positions=r.tables.positions,
                gt_edge_blocked=r.tables.gt_edge_blocked,
                y_bins=r.y_bins, azims=r.azims,
            ))
        self.scene_batch = jax.tree.map(lambda *xs: jnp.stack(xs), *scenes)
        self._cache = {}

    def _rollout_fn(self, n_poses: int):
        if n_poses not in self._cache:
            scene_step = self.rollouts[0].make_scene_step()
            vstep = jax.vmap(scene_step, in_axes=(0, 0, None))

            @jax.jit
            def rollout(scene_batch, states):
                def body(s, i):
                    return vstep(scene_batch, s, i)

                return jax.lax.scan(body, states, jnp.arange(n_poses))

            self._cache[n_poses] = rollout
        return self._cache[n_poses]

    def run(self, n_poses: int = 101, seed: int = 8):
        states = [r.initial_state(seed=seed + i, n_poses=n_poses)
                  for i, r in enumerate(self.rollouts)]
        batched = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
        rollout = self._rollout_fn(n_poses)
        t1 = time.time()
        final, coverage = rollout(self.scene_batch, batched)
        coverage = np.asarray(coverage)  # (n_poses, n_scenes)
        wall = time.time() - t1
        results = []
        for i in range(self.n_scenes):
            curve = coverage[:, i]
            results.append(RolloutResult(
                coverage_evolution=[float(c) for c in curve],
                auc=compute_auc(curve),
                cam_positions=np.asarray(
                    final.traj.xyz[i][: int(final.traj.count[i])]),
                wall_time_s=wall,
                n_points=int(final.pc.count[i]),
                steps_per_sec=self.n_scenes * n_poses / wall,
            ))
        return results
