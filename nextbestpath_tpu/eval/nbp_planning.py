"""NBP planning evaluation rollout (the reference's primary workload).

TPU-native rebuild of compute_nbp_trajectory / test_nbp_planning
(next_best_path/testers/nbp_planning.py:23-361,364-516). Differences from the
reference are architectural, not behavioral:

* frames never touch disk — depth is rendered and consumed on device,
* candidate scoring is one fused program over the whole pose lattice instead
  of a Python loop (nbp_planning.py:203-233),
* the per-candidate heapq Dijkstra is replaced by a single unit-cost
  shortest-path field from the current node; goal selection is a masked
  argmax over (score, reachable) and retries after a first-segment collision
  recompute the field with the updated edge memos (nbp_planning.py:235-249),
* trimesh segment/inside queries use the per-scene static tables
  (sim/tables.py).

Behavioral contract kept: obstacle-map threshold 0.13, layout fusion with the
real point-cloud projection and current-height slice, trajectory pixels
passable, density penalty 10, collision/passable edge memos, anti-revisit
random rotation, 101-pose budget, per-pose coverage metric.
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
import time
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..assets.scene_assets import SceneAssets
from ..config import Params, default_params
from ..geometry.cameras import CameraIntrinsics
from ..models.unet import NBP
from ..ops.coverage import compute_auc, coverage_percentage
from ..ops.raytrace import tris_to_soa
from ..ops.scatter2d import (binned_count_imgs, count_img, height_bins,
                             plan_count_imgs)
from ..planning.candidates import score_candidates_test
from ..planning.grid_paths import (
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

OBSTACLE_THRESHOLD = 0.13  # nbp_planning.py:168-169
DENSITY_PENALTY = 10.0


@functools.partial(jax.jit, static_argnames=("n_pieces", "img_size"))
def build_model_input(pc: PointBuffer, traj: TrajectoryBuffer,
                      cam_xyz: jnp.ndarray, y_bins: jnp.ndarray,
                      n_pieces: int = 4, img_size: int = 256,
                      grid_range: Tuple[float, float] = (-40.0, 40.0)):
    """(1, S, S, n_pieces+1) NHWC model input + the trajectory image.

    Channels: n_pieces height-sliced point-cloud count images + the previous
    trajectory count image (nbp_planning.py:111-132).
    """
    pc_imgs = binned_count_imgs(pc.points, pc.valid_mask(), cam_xyz, y_bins,
                                n_pieces, img_size, grid_range,
                                count=pc.count)
    traj_img = count_img(traj.xyz, traj.valid_mask(), cam_xyz, img_size,
                         grid_range)
    x = jnp.concatenate([pc_imgs, traj_img[None]], axis=0)  # (C, S, S)
    return jnp.transpose(x, (1, 2, 0))[None], traj_img


def build_plan_projections(pc: PointBuffer, traj: TrajectoryBuffer,
                           cam_pose5: jnp.ndarray, y_bins: jnp.ndarray,
                           n_pieces: int = 4, img_size: int = 256,
                           grid_range: Tuple[float, float] = (-40.0, 40.0)):
    """Model input + trajectory image + fuse_layout's projections, one pass.

    Produces exactly what build_model_input + fuse_layout's two internal
    count images produce, but walks the point buffer once instead of three
    times (ops/scatter2d.plan_count_imgs). Used by the scan rollout's plan
    branch where all four arrays are consumed together.

    Returns (model_input (1, S, S, n_pieces+1), traj_img, proj, filt) with
    proj/filt already clamped to [0, 1] like fuse_layout.
    """
    imgs = plan_count_imgs(pc.points, pc.valid_mask(), cam_pose5[:3], y_bins,
                           cam_pose5[1], n_pieces, img_size, grid_range,
                           count=pc.count)
    traj_img = count_img(traj.xyz, traj.valid_mask(), cam_pose5[:3], img_size,
                         grid_range)
    x = jnp.concatenate([imgs[:n_pieces], traj_img[None]], axis=0)
    model_input = jnp.transpose(x, (1, 2, 0))[None]
    proj = jnp.minimum(jnp.sum(imgs[:n_pieces + 1], axis=0), 1.0)
    filt = jnp.minimum(imgs[n_pieces + 1], 1.0)
    return model_input, traj_img, proj, filt


def fuse_layout_from_projections(pred_obstacle: jnp.ndarray,
                                 proj: jnp.ndarray, filt: jnp.ndarray,
                                 traj_img: jnp.ndarray):
    """fuse_layout's fusion step over precomputed clamped projections."""
    layout = (pred_obstacle >= OBSTACLE_THRESHOLD).astype(jnp.float32)
    layout = jnp.where(proj > 0, filt, layout)
    layout = jnp.where(traj_img > 0, 0.0, layout)
    return layout, proj


@functools.partial(jax.jit, static_argnames=("img_size",))
def fuse_layout(pred_obstacle: jnp.ndarray, pc: PointBuffer,
                traj_img: jnp.ndarray, cam_pose5: jnp.ndarray,
                img_size: int = 256,
                grid_range: Tuple[float, float] = (-40.0, 40.0)):
    """Fused binary layout + clamped pc projection (nbp_planning.py:166-191).

    - threshold the predicted obstacle map at 0.13,
    - where the full-pc projection has observations, substitute the binary
      current-height slice,
    - clear trajectory pixels as passable.
    Returns (layout (S, S), proj256 (S, S) clamped to [0, 1]).
    """
    layout = (pred_obstacle >= OBSTACLE_THRESHOLD).astype(jnp.float32)
    valid = pc.valid_mask()
    proj = count_img(pc.points, valid, cam_pose5[:3], img_size, grid_range,
                     count=pc.count)
    proj = jnp.minimum(proj, 1.0)

    cam_y = cam_pose5[1]
    height_slice = valid & (pc.points[:, 1] < cam_y + 0.1) & (pc.points[:, 1] > cam_y - 0.1)
    filt = count_img(pc.points, height_slice, cam_pose5[:3], img_size,
                     grid_range, count=pc.count)
    filt = jnp.minimum(filt, 1.0)

    layout = jnp.where(proj > 0, filt, layout)
    layout = jnp.where(traj_img > 0, 0.0, layout)
    return layout, proj


@functools.partial(jax.jit, static_argnames=("L", "H"))
def select_goal(scores: jnp.ndarray, dist: jnp.ndarray, L: int, H: int):
    """Best-scoring candidate that is reachable (dist in [1, INF))."""
    ok = (dist >= 1) & (dist < INF) & (scores > -1e29)
    masked = jnp.where(ok, scores, -jnp.inf)
    flat_idx = jnp.argmax(masked)
    found = jnp.any(ok)
    return jnp.stack([flat_idx // H, flat_idx % H]), found


@dataclasses.dataclass
class RolloutResult:
    coverage_evolution: List[float]
    auc: float
    cam_positions: np.ndarray
    wall_time_s: float
    n_points: int
    steps_per_sec: float


class NBPPlanningRollout:
    """Host-orchestrated eval rollout over jitted device stages."""

    def __init__(self, assets: SceneAssets, nbp_model: NBP, nbp_variables,
                 params: Optional[Params] = None, seed: int = 8,
                 interpret: Optional[bool] = None,
                 shared_rng: bool = False, max_plan_retries: int = 8):
        # shared_rng: derive per-pose keys exactly like ScanRollout._pre
        # (one 7-way split per pose with fixed roles) instead of the legacy
        # sequential _next_key() stream, and use the scan's stride-based
        # coverage subsample. With shared_rng=True and max_plan_retries
        # matching the scan's, both drivers consume identical key streams at
        # identical decision points, so their coverage curves agree to float
        # tolerance (tests/test_scan_vs_host.py) — the host rollout is the
        # reference-faithful port, the scan is the perf path, and this mode
        # is the proof the seam between them preserves the planner.
        self.shared_rng = bool(shared_rng)
        self.max_plan_retries = int(max_plan_retries)
        self.params = params or default_params()
        p = self.params
        self.assets = assets
        self.model = nbp_model
        self.variables = nbp_variables
        # Eager flax apply dispatches each conv separately (catastrophic over
        # a remote-TPU tunnel); one jitted forward for the whole rollout.
        self._forward = jax.jit(
            lambda v, x: nbp_model.apply(v, x, train=False)
        )
        self.intr = CameraIntrinsics(
            image_height=int(p.image_height), image_width=int(p.image_width),
            fov_degrees=float(p.fov_degrees), znear=float(p.camera_znear),
            zfar=float(p.zfar),
        )
        self.interpret = interpret
        self.key = jax.random.PRNGKey(seed)

        self.tri_soa = tris_to_soa(jnp.asarray(assets.tris))
        self.n_tris = jnp.asarray(assets.n_tris, jnp.int32)
        self.gt = jnp.asarray(assets.gt_surface)
        self.tables: SceneTables = build_scene_tables(
            self.tri_soa, self.n_tris, jnp.asarray(assets.pose_origin),
            assets.pose_l, assets.pose_h, interpret=interpret,
        )
        verts_y = assets.tris[: assets.n_tris, :, 1]
        self.y_bins = height_bins(jnp.float32(verts_y.min()),
                                  jnp.float32(verts_y.max()),
                                  int(p.n_pieces))

        self.L = assets.pose_l
        self.H = assets.pose_h
        self.n_azim = assets.n_azim
        # Host copies fetched once (device->host transfers are expensive
        # through the remote-TPU tunnel).
        self._positions_np = np.asarray(self.tables.positions)
        self._gt_eb_np = np.asarray(self.tables.gt_edge_blocked)

    def _next_key(self):
        self.key, k = jax.random.split(self.key)
        return k

    def _pose_keys(self):
        """Per-pose role keys, identical to ScanRollout._pre's 7-way split.

        Returns None in legacy mode (sequential stream)."""
        if not self.shared_rng:
            return None
        key, k_cov, k_obs, k_rot, k_rot2, k_move, k_plan = (
            jax.random.split(self.key, 7))
        self.key = key
        return {"cov": k_cov, "obs": k_obs, "rot": k_rot, "rot2": k_rot2,
                "move": k_move, "plan": k_plan}

    def _k(self, ks, role):
        return self._next_key() if ks is None else ks[role]

    def _pose5(self, idx_lh_rot: Tuple[int, int, int]) -> jnp.ndarray:
        i_l, i_h, rot = idx_lh_rot
        pos = self._positions_np[i_l, i_h]
        elev = self.assets.elevations_deg[2]  # fixed elevation index 2
        azim = self.assets.azimuths_deg[rot]
        return jnp.asarray([pos[0], pos[1], pos[2], elev, azim], jnp.float32)

    def run(self, n_poses: int = 101, verbose: bool = False) -> RolloutResult:
        p = self.params
        t1 = time.time()

        pc = PointBuffer.create(int(p.full_pc_capacity))
        traj = TrajectoryBuffer.create(8 * (n_poses + 4))
        edge_memo = jnp.zeros((4, self.L, self.H), jnp.int8)
        banned = jnp.zeros((self.L, self.H), bool)
        visited_rot = jnp.zeros((self.L, self.H, self.n_azim), bool)

        start = self.assets.start_cam_idx
        cur = (int(start[0]), int(start[2]), int(start[4]))
        visited_rot = visited_rot.at[cur[0], cur[1], cur[2]].set(True)
        idx_history: List[Tuple[int, int, int]] = []

        # Initial captures (setup_test_camera, testers/scene.py:478-487):
        # one static capture + a full interpolation from start to start.
        pose0 = self._pose5(cur)
        pc, traj, _ = move_and_capture(
            self.tri_soa, self.n_tris, pose0, pose0, pc, traj,
            self._next_key(), self.intr,
            n_steps=int(p.n_interpolation_steps), n_azim=self.n_azim,
            n_slots=int(p.points_per_frame),
            gathering_factor=float(p.gathering_factor),
            sensor_range=float(p.sensor_range), interpret=self.interpret,
        )

        path: List[Tuple[int, int, int]] = []
        path_record = 0
        gt_eb = self._gt_eb_np
        coverage_evolution: List[float] = []
        value_map = None

        for pose_i in range(n_poses):
            ks = self._pose_keys()
            cov = float(coverage_percentage(self.gt, pc.points, pc.count,
                                            self._k(ks, "cov"),
                                            fast_sampling=self.shared_rng))
            coverage_evolution.append(cov)
            if verbose and pose_i % 10 == 0:
                print(f"pose {pose_i}: coverage {cov:.4f} pc {int(pc.count)}")

            cur_pose5 = self._pose5(cur)
            # Loop-start frame re-processing.
            pc = observe_current(
                self.tri_soa, self.n_tris, cur_pose5, pc, self._k(ks, "obs"),
                self.intr, n_slots=int(p.points_per_frame),
                gathering_factor=float(p.gathering_factor),
                sensor_range=float(p.sensor_range), interpret=self.interpret,
            )

            model_input, traj_img = build_model_input(
                pc, traj, cur_pose5[:3], self.y_bins,
                n_pieces=int(p.n_pieces), img_size=int(p.pc2img_size[0]),
            )

            # Regen condition (nbp_planning.py:134-160).
            regen = pose_i == 0 or path_record >= len(path)
            if not regen:
                nxt = path[path_record]
                d_idx = self._edge_dir(cur, nxt)
                if d_idx is None:
                    regen = True
                else:
                    collide = bool(gt_eb[d_idx, cur[0], cur[1]])
                    if collide:
                        edge_memo = self._memo_edge(edge_memo, cur, nxt,
                                                    EDGE_COLLISION)
                        banned = banned.at[path[-1][0], path[-1][1]].set(True)
                        regen = True
            # Passable memo for the edge JUST traversed: cur vs the previous
            # loop-start pose (nbp_planning.py:149-155; scan_rollout.py
            # memoizes the same pair). Using idx_history[-1]/[-2] here would
            # lag one move behind and never mark the newest edge, so the
            # planner couldn't route back through a layout-blocked but
            # actually-walkable edge at the very next replan.
            if idx_history:
                a, b = cur, idx_history[-1]
                d_idx = self._edge_dir(a, b)
                if d_idx is not None:
                    edge_memo = self._memo_edge(edge_memo, a, b, EDGE_PASSABLE)

            if regen:
                value_map, obstacle_map = self._forward(self.variables,
                                                        model_input)
                layout, proj256 = fuse_layout(
                    obstacle_map[0, :, :, 0], pc, traj_img, cur_pose5,
                    img_size=int(p.pc2img_size[0]),
                )
                scores = score_candidates_test(
                    self.tables.positions, cur_pose5[:3], value_map[0],
                    proj256, banned,
                    value_map_size=int(p.value_map_size[0]),
                    layout_size=int(p.pc2img_size[0]),
                )
                path, path_record, edge_memo = self._plan(
                    scores, layout, cur_pose5, cur, edge_memo, banned,
                    value_map[0], visited_rot, gt_eb,
                    plan_key=ks["plan"] if ks else None,
                )
            else:
                value_map, _ = self._forward(self.variables, model_input)

            # Choose the next index (nbp_planning.py:252-266).
            if not path:
                rot = int(jax.random.randint(self._k(ks, "rot"), (), 0,
                                             self.n_azim))
                nxt = (cur[0], cur[1], rot)
            else:
                nxt = path[path_record]
                if (nxt[0], nxt[1], nxt[2]) in set(idx_history):
                    rot = int(jax.random.randint(self._k(ks, "rot2"), (), 0,
                                                 self.n_azim))
                    nxt = (nxt[0], nxt[1], rot)

            idx_history.append(cur)
            new_pose5 = self._pose5(nxt)
            pc, traj, _ = move_and_capture(
                self.tri_soa, self.n_tris, cur_pose5, new_pose5, pc, traj,
                self._k(ks, "move"), self.intr,
                n_steps=int(p.n_interpolation_steps), n_azim=self.n_azim,
                n_slots=int(p.points_per_frame),
                gathering_factor=float(p.gathering_factor),
                sensor_range=float(p.sensor_range), interpret=self.interpret,
            )
            visited_rot = visited_rot.at[nxt[0], nxt[1], nxt[2]].set(True)
            cur = nxt
            path_record += 1

        t2 = time.time()
        auc = compute_auc(coverage_evolution)
        wall = t2 - t1
        return RolloutResult(
            coverage_evolution=coverage_evolution,
            auc=auc,
            cam_positions=np.asarray(traj.xyz[: int(traj.count)]),
            wall_time_s=wall,
            n_points=int(pc.count),
            steps_per_sec=n_poses / wall,
        )

    # -- helpers ----------------------------------------------------------

    @staticmethod
    def _edge_dir(a, b) -> Optional[int]:
        from ..planning.grid_paths import DIRS

        d = (b[0] - a[0], b[1] - a[1])
        for k, dd in enumerate(DIRS):
            if d == dd:
                return k
        return None

    def _memo_edge(self, memo, a, b, state):
        from ..planning.grid_paths import DIRS

        d = self._edge_dir(a, b)
        if d is not None:
            memo = memo.at[d, a[0], a[1]].set(state)
        d2 = self._edge_dir(b, a)
        if d2 is not None:
            memo = memo.at[d2, b[0], b[1]].set(state)
        return memo

    def _plan(self, scores, layout, cur_pose5, cur, edge_memo, banned,
              value_map, visited_rot, gt_eb, plan_key=None):
        """Field -> goal -> path -> first-segment GT check -> retry loop.

        Returns (path, path_record, edge_memo): the memo updated with any
        first-segment collisions found during the retries (banned is never
        modified here). plan_key (shared-RNG mode) is used for EVERY retry's
        orientation pick, matching ScanRollout._plan's single k_plan."""
        p = self.params
        layout_blocked = layout_edge_blocked(
            self.tables.positions, cur_pose5[:3], layout, self.L, self.H,
            layout_size=int(p.pc2img_size[0]),
        )
        for _ in range(self.max_plan_retries):
            blocked = apply_edge_memo(layout_blocked, edge_memo)
            dist = bfs_distance_field(blocked, jnp.asarray([cur[0], cur[1]]),
                                      self.L, self.H)
            goal, found = select_goal(scores, dist, self.L, self.H)
            if not bool(found):
                return [], 0, edge_memo
            path_arr, path_len, reachable = extract_path(
                dist, blocked, goal, self.L, self.H,
                max_len=int(p.max_path_len),
            )
            rots = pick_orientations(
                path_arr, jnp.arange(int(p.max_path_len)) < path_len,
                value_map, self.tables.positions, cur_pose5[:3], visited_rot,
                plan_key if plan_key is not None else self._next_key(),
                n_azim=self.n_azim,
                value_map_size=int(p.value_map_size[0]),
            )
            n = int(path_len)
            path_np = np.asarray(path_arr)
            rots_np = np.asarray(rots)
            path = [
                (int(path_np[i, 0]), int(path_np[i, 1]), int(rots_np[i]))
                for i in range(n)
            ]
            if not path:
                return [], 0, edge_memo
            # First-segment ground-truth collision check
            # (nbp_planning.py:240-249).
            first = path[0]
            d_idx = self._edge_dir(cur, first)
            if d_idx is not None and bool(gt_eb[d_idx, cur[0], cur[1]]):
                edge_memo = self._memo_edge(edge_memo, cur, first,
                                            EDGE_COLLISION)
                continue
            return path, 0, edge_memo
        return [], 0, edge_memo


def test_nbp_planning(assets_list, nbp_model, nbp_variables,
                      params: Optional[Params] = None,
                      n_poses: int = 101,
                      results_path: Optional[str] = None,
                      seed: int = 8, verbose: bool = True):
    """Multi-scene eval driver (test_nbp_planning, nbp_planning.py:364-516).

    Emits the same artifact: per-scene coverage evolution + camera history.
    """
    results = {}
    for assets in assets_list:
        rollout = NBPPlanningRollout(assets, nbp_model, nbp_variables,
                                     params=params, seed=seed)
        res = rollout.run(n_poses=n_poses, verbose=verbose)
        results[assets.name] = {
            "coverage_evolution": res.coverage_evolution,
            "auc": res.auc,
            "cam_positions": res.cam_positions.tolist(),
            "wall_time_s": res.wall_time_s,
            "steps_per_sec": res.steps_per_sec,
        }
        if verbose:
            print(f"{assets.name}: final coverage "
                  f"{res.coverage_evolution[-1]:.4f} auc {res.auc:.4f} "
                  f"({res.steps_per_sec:.2f} poses/s)")
    if results_path:
        os.makedirs(os.path.dirname(results_path) or ".", exist_ok=True)
        with open(results_path, "w") as f:
            json.dump(results, f)
    return results
