"""Fully-jitted training rollout collection: one lax.scan over poses.

The host-orchestrated ``collection.collect_trajectory`` reproduces the
reference's trajectory_collection (next_best_path/utility/nbp_utils.py:470-855)
stage by stage, but pays ~10 host<->device round trips per pose — through the
remote-TPU tunnel that caps collection at <1 pose/s, which makes
reference-scale training (100-pose rollouts x many scenes x tens of epochs)
infeasible. This module folds the whole collection rollout into a single
jitted ``lax.scan``; per-pose experience tensors (model input, GT layout,
pose, coverage) are stacked on device and transferred once at the end.

Matches the reference recipe: Boltzmann exploration over NBP-predicted
candidate values (beta=0.5 softmax, nbp_utils.py:717-723), ground-truth-edge
shortest paths (training edges are segment-vs-mesh tests, long_term_utils.py
:346-347 — precomputed in SceneTables), per-waypoint orientation picks
(:396-413), random rotation override p=0.6 (:766-768), early stop at coverage
> 0.95 (:579), and break when no candidate is reachable (:758-764). Suffix
labels (every later pose labels every earlier state, :654-683) are mined on
the host from the returned arrays.

Documented deltas vs the host loop (both behavior-preserving in intent):
* the Boltzmann sample is drawn from the softmax restricted upfront to
  reachable candidates (one distance field computes reachability for ALL
  candidates at once); the host samples over every admissible candidate and
  then walks the score-descending order until a reachable one is found,
* the host loop's unreachable-position memo (nbp_utils.py:553,731,746) is
  subsumed: every plan recomputes exact reachability for ALL candidates
  from the static GT-edge distance field, and on an undirected graph with
  static edges the reachable component never changes — so the memo can
  never exclude a candidate the field doesn't already, and no memo state
  is carried,
* after the early-stop / no-path condition fires, the scan keeps executing
  frozen no-op poses (lax.scan has fixed length); their experiences are
  marked invalid and dropped on the host.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..assets.scene_assets import SceneAssets
from ..config import Params, default_params
from ..geometry.cameras import CameraIntrinsics
from ..ops.coverage import coverage_percentage
from ..ops.obstacle_map import gt_obstacle_map_soa
from ..planning.candidates import NEG, score_candidates_train
from ..planning.grid_paths import (
    INF,
    bfs_distance_field,
    extract_path,
    pick_orientations,
)
from ..sim.rollout import TrajectoryBuffer, move_and_capture, observe_current
from ..sim.sensor import PointBuffer
from ..eval.nbp_planning import build_model_input
from ..models.fold import fold_bn_variables
from .replay import ReplayDB

_PROGRAM_CACHE = {}


def soa_to_tris(tri_soa: jnp.ndarray) -> jnp.ndarray:
    """(9, F) SoA (v0, e1, e2) -> dense (F, 3, 3) triangles."""
    v0 = tri_soa[0:3].T
    v1 = v0 + tri_soa[3:6].T
    v2 = v0 + tri_soa[6:9].T
    return jnp.stack([v0, v1, v2], axis=1)


class CollectScene(NamedTuple):
    """Per-scene device constants for a collection rollout."""

    tri_soa: jnp.ndarray          # (9, F)
    n_tris: jnp.ndarray           # scalar int32
    gt: jnp.ndarray               # (G, 3)
    gt_valid: jnp.ndarray         # (G,) bool
    positions: jnp.ndarray        # (L, H, 3)
    gt_edge_blocked: jnp.ndarray  # (4, L, H)
    inside: jnp.ndarray           # (L, H) bool
    y_bins: jnp.ndarray           # (n_pieces + 1,)
    azims: jnp.ndarray            # (A,)


class CollectState(NamedTuple):
    pc: PointBuffer
    traj: TrajectoryBuffer
    cur: jnp.ndarray          # (3,) int32 (i_l, i_h, rot)
    path: jnp.ndarray         # (P, 3) int32
    path_len: jnp.ndarray     # int32
    path_record: jnp.ndarray  # int32
    visited_rot: jnp.ndarray  # (L, H, A) bool
    done: jnp.ndarray         # bool: rollout ended (coverage / no path)
    key: jax.Array


class CollectOut(NamedTuple):
    """Per-pose experience record (stacked over the scan)."""

    model_input: jnp.ndarray  # (S, S, C) f32
    gt_obs: jnp.ndarray       # (S, S) bool
    pose5: jnp.ndarray        # (5,) f32
    rot: jnp.ndarray          # int32
    coverage: jnp.ndarray     # f32
    valid: jnp.ndarray        # bool
    planned: jnp.ndarray      # bool: a new path was planned at this pose
    #                           (suffix labels are mined within one planned
    #                           path only, nbp_utils.py:654-687)


class ScanCollection:
    """Jitted collection rollouts over a set of same-shape scenes.

    All scenes are padded to common (F, G) sizes and must share the lattice
    dims (pad_assets_to_common handles both), so ONE compiled program serves
    every scene and every epoch (weights are a runtime argument).
    """

    def __init__(self, assets_list: Sequence[SceneAssets], nbp_model,
                 params: Optional[Params] = None,
                 interpret: Optional[bool] = None,
                 boltzmann_beta: float = 0.5,
                 rotation_override_p: float = 0.6,
                 fold_bn: bool = True):
        assert assets_list, "need at least one scene"
        shapes = {(a.pose_l, a.pose_h, a.n_azim) for a in assets_list}
        assert len(shapes) == 1, (
            f"collection scenes need a common pose lattice (got {shapes}); "
            "use pad_assets_to_common")
        self.p = params or default_params()
        p = self.p
        # Collection forwards are eval-mode (nbp.eval() during rollouts,
        # train_nbp_model.py:103); fold BN into conv weights per run().
        self._fold_bn = fold_bn
        if fold_bn:
            nbp_model = nbp_model.clone(fold_bn=True)
        self.model = nbp_model
        self.interpret = interpret
        self.beta = float(boltzmann_beta)
        self.rot_p = float(rotation_override_p)
        # Same sensor-subsampling scheme as the eval rollout
        # (scan_rollout.py): collection and evaluation must see the same
        # point-density distribution when the flag is on.
        self.stratified = bool(p.get("stratified_sampling", False))
        self.assets_list = list(assets_list)
        self.intr = CameraIntrinsics(
            image_height=int(p.image_height), image_width=int(p.image_width),
            fov_degrees=float(p.fov_degrees), znear=float(p.camera_znear),
            zfar=float(p.zfar),
        )
        a0 = assets_list[0]
        self.L, self.H, self.A = a0.pose_l, a0.pose_h, a0.n_azim
        self.elev2 = float(a0.elevations_deg[2])

        # Scene arrays + padding come from the shared eval builders (one
        # sentinel/padding scheme to maintain); CollectScene only adds the
        # inside-mesh mask the Boltzmann candidate filter needs.
        from ..eval.scan_rollout import (
            _pad_scene_arrays,
            scene_arrays_from_assets,
        )

        f_max = max(a.tris.shape[0] for a in assets_list)
        g_max = max(len(a.gt_surface) for a in assets_list)
        self.scenes: List[CollectScene] = []
        for a in assets_list:
            scene, tables = scene_arrays_from_assets(
                a, n_pieces=int(p.n_pieces), interpret=interpret)
            scene = _pad_scene_arrays(scene, f_max, g_max)
            self.scenes.append(CollectScene(
                tri_soa=scene.tri_soa, n_tris=scene.n_tris,
                gt=scene.gt, gt_valid=scene.gt_valid,
                positions=scene.positions,
                gt_edge_blocked=scene.gt_edge_blocked,
                inside=tables.inside, y_bins=scene.y_bins,
                azims=scene.azims,
            ))

    def _sig(self):
        p = self.p
        return ("collect", self.model, self.intr, self.L, self.H, self.A,
                self.elev2, self.interpret, self.beta, self.rot_p,
                self.stratified,
                int(p.pc2img_size[0]), int(p.value_map_size[0]),
                int(p.n_pieces), int(p.points_per_frame),
                float(p.gathering_factor), float(p.sensor_range),
                int(p.n_interpolation_steps), int(p.max_path_len))

    def _pose5(self, scene: CollectScene, idx3: jnp.ndarray) -> jnp.ndarray:
        pos = scene.positions[idx3[0], idx3[1]]
        azim = scene.azims[idx3[2]]
        return jnp.asarray(
            [pos[0], pos[1], pos[2], self.elev2, 0.0], jnp.float32
        ).at[4].set(azim)

    # -- the scan step -------------------------------------------------------

    def _step(self, scene: CollectScene, variables, state: CollectState,
              pose_i):
        p = self.p
        L, H, A = self.L, self.H, self.A
        vms = int(p.value_map_size[0])
        key, k_cov, k_obs, k_bolt, k_pick, k_u, k_rot, k_move = (
            jax.random.split(state.key, 8))

        cov = coverage_percentage(scene.gt, state.pc.points, state.pc.count,
                                  k_cov, fast_sampling=True,
                                  gt_valid=scene.gt_valid)
        cur_pose5 = self._pose5(scene, state.cur)
        pc = observe_current(
            scene.tri_soa, scene.n_tris, cur_pose5, state.pc, k_obs,
            self.intr, n_slots=int(p.points_per_frame),
            gathering_factor=float(p.gathering_factor),
            sensor_range=float(p.sensor_range), interpret=self.interpret,
            stratified=self.stratified,
        )
        model_input, _ = build_model_input(
            pc, state.traj, cur_pose5[:3], scene.y_bins,
            n_pieces=int(p.n_pieces), img_size=int(p.pc2img_size[0]),
        )
        gt_obs = gt_obstacle_map_soa(scene.tri_soa, scene.n_tris,
                                     cur_pose5,
                                     grid_size=int(p.pc2img_size[0]),
                                     grid_range=tuple(p.prediction_range))

        regen = state.path_record >= state.path_len

        def do_plan(_):
            value_map, _ = self.model.apply(variables, model_input,
                                            train=False)
            scores = score_candidates_train(
                scene.positions, cur_pose5[:3], value_map[0],
                state.cur[:2], value_map_size=vms,
            )
            dist = bfs_distance_field(scene.gt_edge_blocked, state.cur[:2],
                                      L, H)
            reachable = (dist >= 1) & (dist < INF)
            ok = (scores > NEG / 2) & scene.inside & reachable
            logits = jnp.where(ok, scores / self.beta, -jnp.inf)
            flat = jax.random.categorical(k_bolt, logits.reshape(-1))
            goal = jnp.stack([flat // H, flat % H]).astype(jnp.int32)
            found = jnp.any(ok)
            path_arr, plen, _ = extract_path(
                dist, scene.gt_edge_blocked, goal, L, H,
                max_len=int(p.max_path_len))
            rots = pick_orientations(
                path_arr, jnp.arange(int(p.max_path_len)) < plen,
                value_map[0], scene.positions, cur_pose5[:3],
                state.visited_rot, k_pick, n_azim=A, value_map_size=vms,
            )
            path = jnp.concatenate(
                [path_arr, rots[:, None].astype(jnp.int32)], axis=-1)
            return (jnp.where(found, path, 0),
                    jnp.where(found, plen, 0), found)

        def keep(_):
            return state.path, state.path_len, jnp.bool_(True)

        plan_now = regen & (~state.done) & (cov <= 0.95)
        path, path_len, found = jax.lax.cond(
            plan_now, do_plan, keep, operand=None)
        path_record = jnp.where(plan_now, 0, state.path_record)

        # Early-stop conditions (evaluated BEFORE this pose's experience is
        # recorded, like the reference's breaks).
        done = state.done | (cov > 0.95) | (~found)
        valid = ~done

        out = CollectOut(
            # f16 halves the end-of-rollout device->host transfer (counts
            # are < 2048 so exactly representable; the replay DB stores f16
            # anyway).
            model_input=model_input[0].astype(jnp.float16),
            gt_obs=gt_obs > 0.5,
            pose5=cur_pose5,
            rot=state.cur[2],
            coverage=cov,
            valid=valid,
            planned=plan_now,
        )

        # Next waypoint + random rotation override p=0.6 (:766-768).
        nxt = path[jnp.clip(path_record, 0, path.shape[0] - 1)]
        override = jax.random.uniform(k_u) <= self.rot_p
        rand_rot = jax.random.randint(k_rot, (), 0, A)
        nxt = nxt.at[2].set(jnp.where(override, rand_rot, nxt[2]))
        nxt = jnp.where(done, state.cur, nxt)  # frozen after the rollout ends

        new_pose5 = self._pose5(scene, nxt)
        pc, traj, _ = move_and_capture(
            scene.tri_soa, scene.n_tris, cur_pose5, new_pose5, pc,
            state.traj, k_move, self.intr,
            n_steps=int(p.n_interpolation_steps), n_azim=A,
            n_slots=int(p.points_per_frame),
            gathering_factor=float(p.gathering_factor),
            sensor_range=float(p.sensor_range), interpret=self.interpret,
            stratified=self.stratified,
        )
        visited_rot = state.visited_rot.at[nxt[0], nxt[1], nxt[2]].set(True)
        new_state = CollectState(
            pc=pc, traj=traj, cur=nxt, path=path, path_len=path_len,
            path_record=path_record + 1,
            visited_rot=visited_rot, done=done, key=key,
        )
        return new_state, out

    def _rollout_fn(self, n_poses: int):
        sig = self._sig() + (n_poses,)
        if sig not in _PROGRAM_CACHE:
            step = self._step

            @jax.jit
            def rollout(scene, variables, state):
                def body(s, i):
                    return step(scene, variables, s, i)

                return jax.lax.scan(body, state, jnp.arange(n_poses))

            _PROGRAM_CACHE[sig] = rollout
        return _PROGRAM_CACHE[sig]

    def initial_state(self, scene_idx: int, seed: int,
                      n_poses: int) -> CollectState:
        p = self.p
        a = self.assets_list[scene_idx]
        scene = self.scenes[scene_idx]
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
            stratified=self.stratified,
        )
        visited = jnp.zeros((self.L, self.H, self.A), bool)
        visited = visited.at[cur[0], cur[1], cur[2]].set(True)
        return CollectState(
            pc=pc, traj=traj, cur=cur,
            path=jnp.zeros((int(p.max_path_len), 3), jnp.int32),
            path_len=jnp.int32(0), path_record=jnp.int32(0),
            visited_rot=visited, done=jnp.bool_(False), key=key,
        )

    def run(self, scene_idx: int, variables, seed: int = 0,
            n_poses: int = 100) -> CollectOut:
        """One rollout; returns host-side stacked CollectOut arrays."""
        fold_only = []
        if self._fold_bn:
            original = {id(l) for l in jax.tree.leaves(variables)}
            variables = fold_bn_variables(variables)
            # _fold_tree aliases untouched leaves into its output — delete
            # only the NEW (actually folded) arrays, never the caller's.
            fold_only = [l for l in jax.tree.leaves(variables)
                         if id(l) not in original]
        rollout = self._rollout_fn(n_poses)
        state = self.initial_state(scene_idx, seed, n_poses)
        final, out = rollout(self.scenes[scene_idx], variables, state)
        host = jax.tree.map(np.asarray, out)
        # Explicitly free the per-rollout transients (stacked experience
        # tensors, final sim state, folded weights): the remote-TPU client
        # retains host mirrors of device buffers until deleted, which leaks
        # ~1 GB per collection epoch otherwise (host OOM at epoch ~20).
        for leaf in jax.tree.leaves(out) + jax.tree.leaves(final) + fold_only:
            try:
                leaf.delete()
            except Exception:
                pass
        return host


def suffix_labels_from_out(out: CollectOut, value_map_size: int,
                           grid_range: Tuple[float, float]):
    """Path-suffix label mining over a rollout's stacked records
    (nbp_utils.py:654-687): for valid poses i < j ON THE SAME PLANNED PATH,
    pose_j's position projects into pose_i's egocentric value-map frame;
    in-bounds pairs produce a (rot_j, row, col) pixel with gain
    max(0, 100*(cov_j - cov_i)).

    The reference clears its experiences list at every replan before
    appending the replan pose, so pairs never span a replan boundary —
    cross-path pairs would credit pose_i's value map with coverage gained
    via a different later plan. Segments are recovered from out.planned
    (True at poses that started a new path). Delta vs the reference
    (matching our host collector, collection.py:266): the final segment is
    also mined; the reference's control flow drops the leftover list when
    the pose loop ends.

    Returns a list of (pose_index, pixels (k,3) i32, gains (k,) f32).
    """
    valid = np.asarray(out.valid)
    idx = np.nonzero(valid)[0]
    if len(idx) == 0:
        return []
    lo, hi = grid_range
    scale = value_map_size / (hi - lo)
    pose5 = np.asarray(out.pose5)[idx]       # (P, 5)
    cov = np.asarray(out.coverage)[idx]      # (P,)
    rot = np.asarray(out.rot)[idx]           # (P,)
    seg = np.cumsum(np.asarray(out.planned)[idx])  # (P,) path segment id
    P = len(idx)
    dx = pose5[None, :, 0] - pose5[:, None, 0]   # (i, j)
    dz = pose5[None, :, 2] - pose5[:, None, 2]
    row = np.rint((-dz - lo) * scale).astype(np.int64)
    col = np.rint((-dx - lo) * scale).astype(np.int64)
    upper = np.triu(np.ones((P, P), bool), k=1)
    same_path = seg[:, None] == seg[None, :]
    in_b = ((row >= 0) & (row < value_map_size)
            & (col >= 0) & (col < value_map_size) & upper & same_path)
    gain = np.maximum((cov[None, :] - cov[:, None]) * 100.0, 0.0)
    results = []
    for i in range(P):
        js = np.nonzero(in_b[i])[0]
        if len(js) == 0:
            continue
        pixels = np.stack([rot[js], row[i, js], col[i, js]],
                          axis=-1).astype(np.int32)
        results.append((int(idx[i]), pixels, gain[i, js].astype(np.float32)))
    return results


def collect_trajectory_scan(
    collection: ScanCollection,
    scene_idx: int,
    variables,
    db: ReplayDB,
    seed: int = 0,
    n_poses: int = 100,
) -> List[float]:
    """Scan-collection analog of collection.collect_trajectory: runs the
    jitted rollout and streams suffix-labeled experiences into the db.
    Returns the (valid prefix of the) coverage evolution."""
    p = collection.p
    out = collection.run(scene_idx, variables, seed=seed, n_poses=n_poses)
    labeled = suffix_labels_from_out(
        out, int(p.value_map_size[0]), tuple(p.prediction_range))
    for pose_i, pixels, gains in labeled:
        db.append(
            np.transpose(out.model_input[pose_i], (2, 0, 1)),
            out.gt_obs[pose_i], pixels, gains, pose_i,
        )
    # valid[k] is False at the pose where an early stop fired, but that
    # pose's coverage measurement was still taken (the host collector and
    # the reference append it before breaking, collection.py:162-167) —
    # include it. Numpy slicing caps n_valid + 1 at n_poses when the
    # rollout never ended early.
    n_valid = int(np.sum(out.valid))
    return [float(c) for c in np.asarray(out.coverage)[: max(n_valid + 1, 1)]]
