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

Program identity: the scene arrays and the model variables are *runtime
arguments* of one module-cached jitted program per configuration signature,
so evaluating N same-shape scenes (or re-evaluating after a training epoch
updates the weights) never recompiles.

The step is factored in two phases (pre-plan / plan / post-plan) so the
batched rollout can gate the expensive plan pass behind a SCALAR
``lax.cond`` over "any scene regenerates this pose": under vmap a per-scene
cond lowers to both-branches select, which made round 1's batched mode pay
the NBP forward + planning every pose for every scene (BASELINE.md). With
the scalar gate the batched plan (one (B, 256, 256, 5) U-Net forward) runs
only on poses where at least one scene needs it.

Behavioral deltas vs the host driver (both documented):
* the reference's dead NBP forward on non-regen poses is skipped (its output
  is unused, nbp_planning.py:252),
* the anti-revisit check uses a visited-(position, rotation) grid rather than
  a growing history list (same semantics: poses are marked when occupied).
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
from ..models.fold import fold_bn_variables, fold_model_and_variables
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
from .nbp_planning import (OBSTACLE_THRESHOLD, RolloutResult,
                           build_plan_projections, fuse_layout,
                           fuse_layout_from_projections, select_goal)

_DIRS_ARR = jnp.asarray(DIRS, jnp.int32)  # (4, 2)

# Module-level compiled-program cache: sig -> jitted rollout. Keyed on every
# closure input of the step (model, param values, lattice dims, ...); scene
# arrays and variables are runtime args, so same-shape scenes and fresh
# weights share one executable.
_PROGRAM_CACHE = {}

# Watchdog-safe auto-segmentation (VERDICT r4 item 8). The tunneled TPU
# worker kills minutes-long SINGLE device executions (round-4 crash bisect:
# a 2500-pose monolithic scan and a batched 8x101 program both died, while
# short executions are reliable at any batch size — duration, not a kernel
# bug). Default runs therefore never launch a long monolithic program:
# rollouts longer than _AUTO_SEG_THRESHOLD poses run as _AUTO_SEG_POSES-pose
# segments (bit-identical to the monolithic scan — the step consumes only
# the absolute pose index, and state stays on device between dispatches).
# A 25-pose segment is ~0.55 s of device work at the measured 22 ms/pose —
# two orders of magnitude under the kill window — and segmentation costs no
# throughput because dispatch is asynchronous (BENCH_r04: segment-25 45.0
# poses/s at 200 poses vs 46.5 monolithic at 30). The segment length is
# deliberately FIXED rather than sized from a measured rate: every distinct
# segment length is a separate XLA program, and scan-program compiles are
# minutes-long through the remote-compile tunnel, so adaptive resizing
# would trade a nonexistent throughput problem for real compile churn.
# segment_len=0 forces the monolithic program; an explicit int keeps
# manual control.
_AUTO_SEG_POSES = 25
_AUTO_SEG_THRESHOLD = 50


def resolve_segment_len(segment_len: Optional[int], n_poses: int):
    """Resolve a run's segment length: None = auto (fixed watchdog-safe
    segments past the threshold), 0 = monolithic, int = manual."""
    if segment_len is None and n_poses > _AUTO_SEG_THRESHOLD:
        return _AUTO_SEG_POSES
    return segment_len


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


class PrePlan(NamedTuple):
    """Everything the cheap phase computes before the plan decision."""

    cov: jnp.ndarray
    pc: PointBuffer
    cur_pose5: jnp.ndarray
    regen: jnp.ndarray
    edge_memo: jnp.ndarray
    banned: jnp.ndarray
    k_rot: jax.Array
    k_rot2: jax.Array
    k_move: jax.Array
    k_plan: jax.Array
    new_key: jax.Array


def scene_arrays_from_assets(assets: SceneAssets, n_pieces: int = 4,
                             interpret: Optional[bool] = None
                             ) -> Tuple[SceneArrays, SceneTables]:
    """Build the per-scene device constants shared by every scan program."""
    tri_soa = tris_to_soa(jnp.asarray(assets.tris))
    n_tris = jnp.asarray(assets.n_tris, jnp.int32)
    gt = jnp.asarray(assets.gt_surface)
    tables = build_scene_tables(
        tri_soa, n_tris, jnp.asarray(assets.pose_origin),
        assets.pose_l, assets.pose_h, interpret=interpret,
    )
    verts_y = assets.tris[: assets.n_tris, :, 1]
    y_bins = height_bins(jnp.float32(verts_y.min()),
                         jnp.float32(verts_y.max()), n_pieces)
    scene = SceneArrays(
        tri_soa=tri_soa, n_tris=n_tris, gt=gt,
        gt_valid=jnp.ones(gt.shape[0], bool),
        positions=tables.positions,
        gt_edge_blocked=tables.gt_edge_blocked,
        y_bins=y_bins, azims=jnp.asarray(assets.azimuths_deg),
    )
    return scene, tables


def _pad_scene_arrays(scene: SceneArrays, f_max: int, g_max: int
                      ) -> SceneArrays:
    """Pad triangle/GT buffers so same-lattice scenes share one program."""
    tri_soa = np.asarray(scene.tri_soa)
    if tri_soa.shape[1] < f_max:
        pad = np.full((9, f_max - tri_soa.shape[1]), 1e8, np.float32)
        tri_soa = np.concatenate([tri_soa, pad], axis=1)
    gt = np.asarray(scene.gt)
    gt_valid = np.zeros(g_max, bool)
    gt_valid[: len(gt)] = np.asarray(scene.gt_valid)
    if len(gt) < g_max:
        gt = np.concatenate(
            [gt, np.full((g_max - len(gt), 3), 1e7, np.float32)])
    return scene._replace(tri_soa=jnp.asarray(tri_soa), gt=jnp.asarray(gt),
                          gt_valid=jnp.asarray(gt_valid))


class ScanRollout:
    """Builder for the jitted scan step; programs cached per configuration."""

    def __init__(self, assets: SceneAssets, nbp_model: NBP, nbp_variables,
                 params: Optional[Params] = None,
                 interpret: Optional[bool] = None,
                 max_plan_retries: int = 4,
                 ablate: Tuple[str, ...] = (),
                 fold_bn: bool = True):
        # ablate: profiling switch ('coverage' | 'plan' | 'capture' |
        # 'model_input') removes a stage from the step to attribute cost.
        self.ablate = tuple(ablate)
        self.p = params or default_params()
        p = self.p
        self.assets = assets
        # Eval-only program: fold BatchNorm into conv weights (exact for the
        # frozen running stats the eval forward uses; models/fold.py).
        if fold_bn:
            nbp_model, nbp_variables = fold_model_and_variables(
                nbp_model, nbp_variables)
        self._fold_bn = fold_bn
        self.model = nbp_model
        self.variables = nbp_variables
        self.intr = CameraIntrinsics(
            image_height=int(p.image_height), image_width=int(p.image_width),
            fov_degrees=float(p.fov_degrees), znear=float(p.camera_znear),
            zfar=float(p.zfar),
        )
        self.interpret = interpret
        self.max_plan_retries = max_plan_retries
        # Two-stage stratified pixel draw instead of the full-frame top_k
        # in every backprojection (sim/sensor.py) — same n_keep contract,
        # cheaper sort footprint on TPU.
        self.stratified = bool(p.get("stratified_sampling", False))
        # Batched substep capture (sim/rollout.py move_and_capture
        # batched=True): one subsample + one fused append per move instead
        # of a 4x serial chain; same results (tests/test_batched_capture).
        self.batched_capture = bool(p.get("batched_capture", False))

        self.scene, self.tables = scene_arrays_from_assets(
            assets, n_pieces=int(p.n_pieces), interpret=interpret)
        self.tri_soa = self.scene.tri_soa
        self.n_tris = self.scene.n_tris
        self.gt = self.scene.gt
        self.y_bins = self.scene.y_bins
        self.L, self.H, self.A = assets.pose_l, assets.pose_h, assets.n_azim
        self.elev2 = float(assets.elevations_deg[2])
        self.azims = self.scene.azims

    def _sig(self):
        """Hashable signature of everything the step closes over."""
        p = self.p
        return (
            self.model, self.intr, self.L, self.H, self.A, self.elev2,
            self.interpret, self.max_plan_retries, self.ablate,
            int(p.pc2img_size[0]), int(p.value_map_size[0]),
            int(p.n_pieces), int(p.points_per_frame),
            float(p.gathering_factor), float(p.sensor_range),
            int(p.n_interpolation_steps), int(p.max_path_len),
            self.stratified, self.batched_capture,
        )

    # -- pose helpers -------------------------------------------------------

    def _pose5(self, scene: SceneArrays, idx3: jnp.ndarray) -> jnp.ndarray:
        pos = scene.positions[idx3[0], idx3[1]]
        azim = scene.azims[idx3[2]]
        return jnp.asarray(
            [pos[0], pos[1], pos[2], self.elev2, 0.0], jnp.float32
        ).at[4].set(azim)

    # -- planning branch ----------------------------------------------------

    def _plan_fields(self, scene: SceneArrays, variables, pc: PointBuffer,
                     traj, cur_pose5, banned):
        """Retry-independent half of the plan: U-Net forward, layout fusion,
        candidate scoring, edge blocking. Factored out so the batched step
        can run it once and scalar-gate the retry attempts (see
        make_batched_step)."""
        p = self.p
        L, H = self.L, self.H
        # The 5-channel model input is consumed only here, so it is built
        # inside the plan branch: non-regen poses (the majority) skip the
        # scatter entirely (the lax.cond guarantees the untaken branch does
        # not execute; values built in _pre would be computed every pose).
        if "model_input" in self.ablate:
            S = int(p.pc2img_size[0])
            model_input = jnp.zeros((1, S, S, int(p.n_pieces) + 1))
            traj_img = jnp.zeros((S, S))
            value_map, obstacle_map = self.model.apply(variables, model_input,
                                                       train=False)
            layout, proj256 = fuse_layout(obstacle_map[0, :, :, 0], pc,
                                          traj_img, cur_pose5,
                                          img_size=int(p.pc2img_size[0]))
        else:
            # Fused single-pass projections: the model input, the full-pc
            # projection and the height-slice image all walk the buffer
            # once (build_plan_projections) instead of three times.
            model_input, traj_img, proj, filt = build_plan_projections(
                pc, traj, cur_pose5, scene.y_bins,
                n_pieces=int(p.n_pieces), img_size=int(p.pc2img_size[0]),
            )
            value_map, obstacle_map = self.model.apply(variables, model_input,
                                                       train=False)
            layout, proj256 = fuse_layout_from_projections(
                obstacle_map[0, :, :, 0], proj, filt, traj_img)
        if "value_flat" in self.ablate:
            # Diagnostic: a uniform value map isolates how much rollout
            # quality the VALUE decoder contributes on top of the obstacle
            # decoder + planner heuristics (training-plateau probe).
            value_map = jnp.ones_like(value_map)
        scores = score_candidates_test(
            scene.positions, cur_pose5[:3], value_map[0], proj256,
            banned, value_map_size=int(p.value_map_size[0]),
            layout_size=int(p.pc2img_size[0]),
        )
        layout_blocked = layout_edge_blocked(
            scene.positions, cur_pose5[:3], layout, L, H,
            layout_size=int(p.pc2img_size[0]),
        )
        return scores, layout_blocked, value_map[0]

    def _plan_attempt(self, scene: SceneArrays, scores, layout_blocked, vm0,
                      cur_pose5, cur_lh, visited_rot, key, memo):
        """One planning attempt against the current edge memo.

        Returns (memo', path, path_len, done). done means either a usable
        path was found or nothing is reachable at all (the reference's
        exhausted candidate list); a first-segment GT collision records the
        edge in the memo and leaves done False so the next attempt reroutes.
        """
        p = self.p
        L, H, A = self.L, self.H, self.A
        gt_eb = scene.gt_edge_blocked
        max_len = int(p.max_path_len)
        blocked = apply_edge_memo(layout_blocked, memo)
        dist = bfs_distance_field(blocked, cur_lh, L, H)
        goal, found = select_goal(scores, dist, L, H)
        path_arr, plen, reach = extract_path(dist, blocked, goal, L,
                                             H, max_len=max_len)
        rots = pick_orientations(
            path_arr, jnp.arange(max_len) < plen, vm0,
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
        return memo2, jnp.where(ok, new_path, 0), jnp.where(ok, plen, 0), \
            ok | (~found)

    def _plan(self, scene: SceneArrays, variables, pc: PointBuffer, traj,
              cur_pose5, cur, edge_memo, banned, visited_rot, key):
        scores, layout_blocked, vm0 = self._plan_fields(
            scene, variables, pc, traj, cur_pose5, banned)
        max_len = int(self.p.max_path_len)
        cur_lh = cur[:2]

        def retry_body(_, carry):
            memo, path, path_len, done = carry

            def attempt(memo):
                return self._plan_attempt(scene, scores, layout_blocked, vm0,
                                          cur_pose5, cur_lh, visited_rot,
                                          key, memo)

            return jax.lax.cond(
                done,
                lambda m: (m, path, path_len, done),
                attempt,
                memo,
            )

        memo, path, path_len, _ = jax.lax.fori_loop(
            0, self.max_plan_retries, retry_body,
            (edge_memo,
             jnp.zeros((max_len, 3), jnp.int32), jnp.int32(0),
             jnp.bool_(False)),
        )
        # banned passes through unchanged (the reference bans goals in the
        # pre phase; attempts only memoize collided edges).
        return memo, banned, path, path_len

    # -- step phases ---------------------------------------------------------

    def _pre(self, scene: SceneArrays, state: ScanState, pose_i) -> PrePlan:
        """Cheap phase: metric, capture, model input, regen decision, memos."""
        p = self.p
        ablate = self.ablate
        gt_eb = scene.gt_edge_blocked
        if "rng" in ablate:  # profiling: skip the per-pose key derivation
            key = k_cov = k_obs = k_rot = k_rot2 = k_move = k_plan = state.key
        else:
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
        if "observe" in ablate:
            pc = state.pc
        else:
            pc = observe_current(
                scene.tri_soa, scene.n_tris, cur_pose5, state.pc, k_obs,
                self.intr, n_slots=int(p.points_per_frame),
                gathering_factor=float(p.gathering_factor),
                sensor_range=float(p.sensor_range), interpret=self.interpret,
                stratified=self.stratified,
            )
        if "logic" in ablate:  # profiling: skip regen/memo bookkeeping
            return PrePlan(cov=cov, pc=pc, cur_pose5=cur_pose5,
                           regen=jnp.bool_(False),
                           edge_memo=state.edge_memo, banned=state.banned,
                           k_rot=k_rot, k_rot2=k_rot2, k_move=k_move,
                           k_plan=k_plan, new_key=key)
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
        return PrePlan(cov=cov, pc=pc, cur_pose5=cur_pose5, regen=regen,
                       edge_memo=edge_memo, banned=banned, k_rot=k_rot,
                       k_rot2=k_rot2, k_move=k_move, k_plan=k_plan,
                       new_key=key)

    def _post(self, scene: SceneArrays, state: ScanState, pre: PrePlan,
              edge_memo, banned, path, path_len):
        """Move phase: next index, anti-revisit, captures, state update."""
        p = self.p
        A = self.A
        if "logic" in self.ablate:  # profiling: passthrough move logic
            new_state = ScanState(
                pc=pre.pc, traj=state.traj, cur=state.cur, prev=state.cur,
                has_prev=jnp.bool_(True), path=path, path_len=path_len,
                path_record=state.path_record, edge_memo=edge_memo,
                banned=banned, visited_rot=state.visited_rot,
                key=pre.new_key,
            )
            return new_state, pre.cov
        path_record = jnp.where(pre.regen, 0, state.path_record)

        # Next index (nbp_planning.py:252-266).
        no_path = path_len == 0
        rand_rot = jax.random.randint(pre.k_rot, (), 0, A)
        nxt = jnp.where(
            no_path,
            jnp.asarray([state.cur[0], state.cur[1], 0]).at[2].set(rand_rot),
            path[jnp.clip(path_record, 0, path.shape[0] - 1)],
        )
        # Anti-revisit: random rotation when (pos, rot) already occupied.
        revisit = state.visited_rot[nxt[0], nxt[1], nxt[2]]
        rand_rot2 = jax.random.randint(pre.k_rot2, (), 0, A)
        nxt = nxt.at[2].set(jnp.where(revisit & (~no_path), rand_rot2,
                                      nxt[2]))

        new_pose5 = self._pose5(scene, nxt)
        if "moves" in self.ablate:
            pc, traj = pre.pc, state.traj
        else:
            pc, traj, _ = move_and_capture(
                scene.tri_soa, scene.n_tris, pre.cur_pose5, new_pose5, pre.pc,
                state.traj, pre.k_move, self.intr,
                n_steps=int(p.n_interpolation_steps), n_azim=A,
                n_slots=int(p.points_per_frame),
                gathering_factor=float(p.gathering_factor),
                sensor_range=float(p.sensor_range), interpret=self.interpret,
                stratified=self.stratified, batched=self.batched_capture,
            )
        visited_rot = state.visited_rot.at[nxt[0], nxt[1], nxt[2]].set(True)

        new_state = ScanState(
            pc=pc, traj=traj, cur=nxt, prev=state.cur,
            has_prev=jnp.bool_(True), path=path, path_len=path_len,
            path_record=path_record + 1, edge_memo=edge_memo,
            banned=banned, visited_rot=visited_rot, key=pre.new_key,
        )
        return new_state, pre.cov

    # -- the scan step ------------------------------------------------------

    def make_step(self):
        """step(state, pose_i) bound to this rollout's scene + variables."""
        scene_step = self.make_scene_step()

        def step(state, pose_i):
            return scene_step(self.scene, self.variables, state, pose_i)

        return step

    def make_scene_step(self):
        """step(scene, variables, state, pose_i): scene arrays and model
        weights as explicit pytree args — vmap over a stacked SceneArrays
        batches rollouts; fresh weights reuse the compiled program."""

        def step(scene: SceneArrays, variables, state: ScanState, pose_i):
            pre = self._pre(scene, state, pose_i)

            def do_plan(memo, bann):
                return self._plan(scene, variables, pre.pc, state.traj,
                                  pre.cur_pose5, state.cur,
                                  memo, bann, state.visited_rot, pre.k_plan)

            def keep_plan(memo, bann):
                return memo, bann, state.path, state.path_len

            if "plan" in self.ablate:
                do_plan = keep_plan
            edge_memo, banned, path, path_len = jax.lax.cond(
                pre.regen, do_plan, keep_plan, pre.edge_memo, pre.banned)
            return self._post(scene, state, pre, edge_memo, banned, path,
                              path_len)

        return step

    def make_batched_step(self):
        """Two-phase batched step over stacked scenes/states.

        Phase 1 (vmapped, cheap) computes captures + regen flags; the plan
        pass is gated by a SCALAR cond on any(regen) so non-regen poses skip
        the U-Net + planner entirely even under vmap (a per-scene cond would
        lower to both-branches select). Scenes that did not request a regen
        keep their state via a per-scene select inside the plan pass.

        Retry gating (round 4): inside the plan pass, the per-scene
        4-attempt retry loop used to vmap the single-scene fori_loop, whose
        per-scene ``lax.cond(done, ...)`` lowers to both-branch select under
        vmap — every batched plan paid max_plan_retries x the
        field/path/orientation cost even though attempt 1 almost always
        succeeds. Now the retry-independent fields run once (vmapped), the
        first attempt runs unconditionally (vmapped), and attempts 2..R sit
        behind a SCALAR ``lax.cond(any scene not done)``, mirroring the
        any-regen gate one level down. Per-scene results are selected so the
        sequence of attempts each scene sees is identical to the
        single-scene fori_loop (bit-parity kept; tests/test_scan_rollout).
        """
        def bstep(scene_b: SceneArrays, variables, states: ScanState, pose_i):
            pre_b = jax.vmap(self._pre, in_axes=(0, 0, None))(
                scene_b, states, pose_i)
            any_regen = jnp.any(pre_b.regen)

            def do_plans(memo_b, bann_b):
                scores_b, lb_b, vm_b = jax.vmap(
                    self._plan_fields, in_axes=(0, None, 0, 0, 0, 0))(
                        scene_b, variables, pre_b.pc, states.traj,
                        pre_b.cur_pose5, bann_b)
                cur_lh_b = states.cur[:, :2]

                def attempt_b(memo):
                    return jax.vmap(self._plan_attempt)(
                        scene_b, scores_b, lb_b, vm_b, pre_b.cur_pose5,
                        cur_lh_b, states.visited_rot, pre_b.k_plan, memo)

                memo, path, plen, done = attempt_b(memo_b)

                def retry(carry):
                    memo_c, path_c, plen_c, done_c = carry
                    m2, p2, l2, d2 = attempt_b(memo_c)
                    keep_s = done_c
                    return (
                        jnp.where(keep_s[:, None, None, None], memo_c, m2),
                        jnp.where(keep_s[:, None, None], path_c, p2),
                        jnp.where(keep_s, plen_c, l2),
                        done_c | d2,
                    )

                carry = (memo, path, plen, done)
                for _ in range(self.max_plan_retries - 1):
                    carry = jax.lax.cond(jnp.any(~carry[3]), retry,
                                         lambda c: c, carry)
                memo_f, path_f, plen_f, _ = carry
                sel = pre_b.regen
                return (
                    jnp.where(sel[:, None, None, None], memo_f, memo_b),
                    bann_b,
                    jnp.where(sel[:, None, None], path_f, states.path),
                    jnp.where(sel, plen_f, states.path_len),
                )

            def keep(memo_b, bann_b):
                return memo_b, bann_b, states.path, states.path_len

            if "plan" in self.ablate:
                do_plans = keep
            memo, bann, path, plen = jax.lax.cond(
                any_regen, do_plans, keep, pre_b.edge_memo, pre_b.banned)
            return jax.vmap(self._post)(scene_b, states, pre_b, memo, bann,
                                        path, plen)

        return bstep

    def _init_fn(self, n_poses: int):
        """Module-cached jitted state initializer: one dispatch per run.

        An eager initial_state issues ~12 small device calls; through the
        axon tunnel each pays the RPC floor, adding a ~200 ms constant per
        rollout (one third of a 30-pose bench run). Folding initialization
        into a single program removes it."""
        sig = self._sig() + ("init", n_poses)
        if sig not in _PROGRAM_CACHE:
            p = self.p
            intr, A, L, H = self.intr, self.A, self.L, self.H
            interpret, stratified = self.interpret, self.stratified

            @jax.jit
            def init(scene: SceneArrays, cur: jnp.ndarray,
                     seed: jnp.ndarray) -> ScanState:
                key = jax.random.PRNGKey(seed)
                key, k0 = jax.random.split(key)
                pc = PointBuffer.create(int(p.full_pc_capacity))
                traj = TrajectoryBuffer.create(8 * (n_poses + 4))
                pose0 = self._pose5(scene, cur)
                pc, traj, _ = move_and_capture(
                    scene.tri_soa, scene.n_tris, pose0, pose0, pc, traj, k0,
                    intr, n_steps=int(p.n_interpolation_steps), n_azim=A,
                    n_slots=int(p.points_per_frame),
                    gathering_factor=float(p.gathering_factor),
                    sensor_range=float(p.sensor_range), interpret=interpret,
                    stratified=stratified, batched=self.batched_capture,
                )
                visited = jnp.zeros((L, H, A), bool)
                visited = visited.at[cur[0], cur[1], cur[2]].set(True)
                return ScanState(
                    pc=pc, traj=traj, cur=cur, prev=cur,
                    has_prev=jnp.bool_(False),
                    path=jnp.zeros((int(p.max_path_len), 3), jnp.int32),
                    path_len=jnp.int32(0), path_record=jnp.int32(0),
                    edge_memo=jnp.zeros((4, L, H), jnp.int8),
                    banned=jnp.zeros((L, H), bool),
                    visited_rot=visited, key=key,
                )

            _PROGRAM_CACHE[sig] = init
        return _PROGRAM_CACHE[sig]

    def initial_state(self, seed: int = 8, n_poses: int = 101) -> ScanState:
        start = self.assets.start_cam_idx
        cur = jnp.asarray([int(start[0]), int(start[2]), int(start[4])],
                          jnp.int32)
        return self._init_fn(n_poses)(self.scene, cur,
                                      jnp.asarray(seed, jnp.uint32))

    def _rollout_fn(self, n_poses: int):
        """Module-cached jitted scan program (scene + variables are args)."""
        sig = self._sig() + ("single", n_poses)
        if sig not in _PROGRAM_CACHE:
            step = self.make_scene_step()

            @jax.jit
            def rollout(scene, variables, state):
                def body(s, i):
                    return step(scene, variables, s, i)

                return jax.lax.scan(body, state, jnp.arange(n_poses))

            _PROGRAM_CACHE[sig] = rollout
        return _PROGRAM_CACHE[sig]

    def _segment_fn(self, seg_len: int):
        """Jitted scan SEGMENT: scans poses [start, start + seg_len) with a
        traced start, so one compiled program serves every segment of every
        run length. Splitting a long rollout into segments is bit-exact
        (the step consumes only the absolute pose index; state stays on
        device between calls) and keeps each device execution short — the
        tunneled TPU worker was observed to die mid-execution on programs
        running for minutes (single-scene 2500-pose and batched 8x101-pose
        scans both reproduced it; round-4 crash bisect, BASELINE.md) while
        sub-minute executions are reliable."""
        sig = self._sig() + ("seg", seg_len)
        if sig not in _PROGRAM_CACHE:
            step = self.make_scene_step()

            @jax.jit
            def rollout_seg(scene, variables, state, start):
                def body(s, i):
                    return step(scene, variables, s, i)

                return jax.lax.scan(body, state,
                                    start + jnp.arange(seg_len))

            _PROGRAM_CACHE[sig] = rollout_seg
        return _PROGRAM_CACHE[sig]

    def run(self, n_poses: int = 101, seed: int = 8,
            variables=None, segment_len: Optional[int] = None
            ) -> RolloutResult:
        """segment_len: None (default) = automatic watchdog-safe
        segmentation for rollouts longer than _AUTO_SEG_THRESHOLD poses;
        0 = force one monolithic program; int = manual segment length."""
        state = self.initial_state(seed=seed, n_poses=n_poses)
        if variables is not None and self._fold_bn:
            variables = fold_bn_variables(variables)
        v = variables if variables is not None else self.variables
        segment_len = resolve_segment_len(segment_len, n_poses)
        t1 = time.time()
        if segment_len and segment_len < n_poses:
            covs = []
            final, done = state, 0
            while done < n_poses:
                s = min(segment_len, n_poses - done)
                final, cov = self._segment_fn(s)(self.scene, v, final,
                                                 jnp.int32(done))
                covs.append(cov)
                done += s
            coverage = np.concatenate([np.asarray(c) for c in covs])
        else:
            final, coverage = self._rollout_fn(n_poses)(self.scene, v, state)
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


def run_interleaved(rollouts, n_poses: int = 101, seed: int = 8,
                    segment_len: int = 25, variables=None,
                    seeds=None):
    """Pipelined multi-scene rollouts on ONE chip: round-robin the segment
    dispatches across scenes and sync the host ONCE at the end.

    JAX dispatch is asynchronous, so the device executes the queued
    segments back-to-back while the host runs ahead enqueueing the next
    round — N-scene total throughput approaches the device-compute bound
    instead of paying per-run host/tunnel latency (round-3 sequential mode
    lost ~0.4 s per run to init + result sync, multi_scene_bench: 29.4
    total poses/s vs 46.1 single-scene). Per-scene results are bit-identical
    to ``ScanRollout.run(segment_len=...)`` — the interleaving only reorders
    independent device programs.

    All rollouts must share a compiled-program signature (same lattice /
    buffer shapes — use ``pad_assets_to_common``); compile by running one
    scene once before timing. ``seeds`` (one per scene) overrides
    ``seed + i``.

    Timing semantics differ from ``ScanRollout.run``: every returned
    ``RolloutResult.wall_time_s`` is the SHARED N-scene wall clock (the
    scenes execute interleaved, so no per-scene time exists) and
    ``steps_per_sec`` is the AGGREGATE throughput
    ``len(rollouts) * n_poses / wall`` — identical across the returned
    results. Divide by ``len(rollouts)`` for a per-scene average.
    """
    if seeds is None:
        seeds = [seed + i for i in range(len(rollouts))]
    states = [r.initial_state(seed=s, n_poses=n_poses)
              for r, s in zip(rollouts, seeds)]
    vs = []
    for r in rollouts:
        if variables is not None:
            vs.append(fold_bn_variables(variables) if r._fold_bn
                      else variables)
        else:
            vs.append(r.variables)
    covs = [[] for _ in rollouts]
    t1 = time.time()
    done = 0
    while done < n_poses:
        s = min(segment_len, n_poses - done)
        for i, r in enumerate(rollouts):
            states[i], cov = r._segment_fn(s)(r.scene, vs[i], states[i],
                                              jnp.int32(done))
            covs[i].append(cov)
        done += s
    # Force everything, then read the clock: one host sync for the whole
    # N-scene batch.
    coverage = [np.concatenate([np.asarray(c) for c in cs]) for cs in covs]
    cams = [np.asarray(st.traj.xyz[: int(st.traj.count)]) for st in states]
    wall = time.time() - t1
    results = []
    for i, r in enumerate(rollouts):
        results.append(RolloutResult(
            coverage_evolution=[float(c) for c in coverage[i]],
            auc=compute_auc(coverage[i]),
            cam_positions=cams[i],
            wall_time_s=wall,
            n_points=int(states[i].pc.count),
            steps_per_sec=len(rollouts) * n_poses / wall,
        ))
    return results


# ---------------------------------------------------------------------------
# Batched rollouts: vmap over scenes (the reference's one-scene-per-GPU data
# parallelism, SURVEY.md §2.3, expressed as a batch axis on one chip; shard
# the same axis over a Mesh for multi-chip).
# ---------------------------------------------------------------------------


class BatchedScanRollout:
    """Two-phase vmapped scan over a batch of same-lattice scenes.

    The plan pass runs only on poses where at least one scene regenerates
    (scalar lax.cond; see ScanRollout.make_batched_step) and is batched into
    one (B, 256, 256, 5) U-Net forward when it does. Pass ``mesh`` to shard
    the scene axis over devices (the reference's one-scene-per-GPU DDP,
    macarons_utils.py:279-293): scene/state arrays get
    NamedSharding(mesh, P(axis)) and the weights are replicated.

    DEPRECATED for single-chip benchmarks and promotion gates (VERDICT r4
    weak #3): on TPU the bf16 batch-B U-Net tiles differently from batch-1,
    occasionally flipping a goal argmax, so per-scene trajectories drift
    from single-scene runs (f32 CPU parity is bit-exact —
    test_batched_b2_matches_single_scenes — the drift is device numerics,
    not semantics) and it is also the slowest multi-scene mode (17.6 vs
    pipelined 46.8 total poses/s, BENCH_r04). Use ``run_interleaved`` on one
    chip and the mesh-sharded modes past one chip. Still appropriate for
    checkpoint SELECTION (train/driver.py periodic eval), where both
    candidates run through the same program and only their ranking matters,
    and as the vmap body for the multi-chip shard_map path.
    """

    def __init__(self, assets_list, nbp_model: NBP, nbp_variables,
                 params: Optional[Params] = None,
                 interpret: Optional[bool] = None,
                 mesh=None, mesh_axis: str = "data",
                 fold_bn: bool = True):
        assert assets_list, "need at least one scene"
        shapes = {(a.pose_l, a.pose_h, a.n_azim) for a in assets_list}
        assert len(shapes) == 1, (
            "batched rollouts need a common pose lattice; pad/buck scenes "
            f"first (got {shapes})")
        f_max = max(a.tris.shape[0] for a in assets_list)
        g_max = max(len(a.gt_surface) for a in assets_list)

        # Fold BatchNorm ONCE here; the per-scene ScanRollouts then share
        # the single folded weight pytree instead of each folding (and
        # pinning) its own copy.
        if fold_bn:
            nbp_model, nbp_variables = fold_model_and_variables(
                nbp_model, nbp_variables)
        self._fold_bn = fold_bn
        self.rollouts = [
            ScanRollout(a, nbp_model, nbp_variables, params=params,
                        interpret=interpret, fold_bn=False)
            for a in assets_list
        ]
        base = self.rollouts[0]
        self.p = base.p
        self.n_scenes = len(assets_list)
        self.mesh = mesh
        self.mesh_axis = mesh_axis

        scenes = [_pad_scene_arrays(r.scene, f_max, g_max)
                  for r in self.rollouts]
        self.scene_batch = jax.tree.map(lambda *xs: jnp.stack(xs), *scenes)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._data_sharding = NamedSharding(mesh, P(mesh_axis))
            self._repl_sharding = NamedSharding(mesh, P())
            self.scene_batch = jax.device_put(self.scene_batch,
                                              self._data_sharding)

    def _rollout_fn(self, n_poses: int):
        sig = self.rollouts[0]._sig() + ("batched", self.n_scenes, n_poses)
        if sig not in _PROGRAM_CACHE:
            bstep = self.rollouts[0].make_batched_step()

            @jax.jit
            def rollout(scene_batch, variables, states):
                def body(s, i):
                    return bstep(scene_batch, variables, s, i)

                return jax.lax.scan(body, states, jnp.arange(n_poses))

            _PROGRAM_CACHE[sig] = rollout
        return _PROGRAM_CACHE[sig]

    def _segment_fn(self, seg_len: int):
        """Batched scan segment with a traced start (see
        ScanRollout._segment_fn for why long executions are split)."""
        sig = self.rollouts[0]._sig() + ("bseg", self.n_scenes, seg_len)
        if sig not in _PROGRAM_CACHE:
            bstep = self.rollouts[0].make_batched_step()

            @jax.jit
            def rollout_seg(scene_batch, variables, states, start):
                def body(s, i):
                    return bstep(scene_batch, variables, s, i)

                return jax.lax.scan(body, states,
                                    start + jnp.arange(seg_len))

            _PROGRAM_CACHE[sig] = rollout_seg
        return _PROGRAM_CACHE[sig]

    def run(self, n_poses: int = 101, seed: int = 8, variables=None,
            segment_len: Optional[int] = None):
        """segment_len semantics as in ScanRollout.run: None = auto
        watchdog-safe segmentation past _AUTO_SEG_THRESHOLD poses (batched
        executions are B x longer, so the auto default matters most here —
        the round-3 8x101 monolithic program was the original crash),
        0 = monolithic, int = manual."""
        states = [r.initial_state(seed=seed + i, n_poses=n_poses)
                  for i, r in enumerate(self.rollouts)]
        batched = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
        if variables is not None and self._fold_bn:
            variables = fold_bn_variables(variables)
        v = variables if variables is not None else self.rollouts[0].variables
        if self.mesh is not None:
            batched = jax.device_put(batched, self._data_sharding)
            v = jax.device_put(v, self._repl_sharding)
        segment_len = resolve_segment_len(segment_len, n_poses)
        t1 = time.time()
        if segment_len and segment_len < n_poses:
            covs = []
            final, done = batched, 0
            while done < n_poses:
                s = min(segment_len, n_poses - done)
                final, cov = self._segment_fn(s)(self.scene_batch, v,
                                                 final, jnp.int32(done))
                covs.append(cov)
                done += s
            coverage = np.concatenate([np.asarray(c) for c in covs])
        else:
            final, coverage = self._rollout_fn(n_poses)(self.scene_batch, v,
                                                        batched)
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
