"""MACARONS greedy next-best-view tester on the TPU engine.

Analog of macarons/testers/scene.py:compute_trajectory (:491-825) with the
decision core of train_macarons.loop (:319-345): per pose the agent

1. renders + backprojects the current frame (perfect depth),
2. carves the proxy occupancy field and updates view states,
3. predicts occupancy probabilities with SconeOcc over proxy points,
4. scores every neighboring pose with SconeVis visibility gains evaluated
   toward the candidate camera center, weighted by the in-fov proxy volume
   (predict_coverage_gain_for_single_camera, macarons_utils.py:1909-2080),
5. greedily moves to the argmax neighbor.

All candidates are scored in one batched SconeVis call instead of the
reference's per-neighbor Python loop.
"""

from __future__ import annotations

import functools
import time
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..assets.scene_assets import SceneAssets
from ..config import Params, default_params
from ..geometry.cameras import CameraIntrinsics, get_camera_RT
from ..models.harmonics import base_view_harmonics
from ..models.scone import SconeOcc, SconeVis
from ..ops.coverage import compute_auc, coverage_percentage, masked_min_dists, min_dists
from ..ops.raytrace import render_depth_batch, tris_to_soa
from ..ops.view_state import compute_view_harmonics
from ..planning.grid_paths import DIRS
from ..sim.coverage_gain import predict_coverage_gain
from ..sim.proxy import ProxyField, carve_with_frame
from ..sim.rollout import TrajectoryBuffer, move_and_capture
from ..sim.sensor import PointBuffer, backproject_sample
from ..sim.tables import build_scene_tables
from .nbp_planning import RolloutResult


@functools.partial(jax.jit, static_argnames=("scone_occ",))
def _occ_forward(scone_occ, variables, pc_tokens, proxy_pts, vh, key):
    """Jitted SconeOcc forward (eager flax apply dispatches op-by-op —
    catastrophic over the remote-TPU tunnel at 100 calls per rollout)."""
    return scone_occ.apply(variables, pc_tokens, proxy_pts, vh, key=key)


@functools.partial(jax.jit, static_argnames=("intr", "n_slots"))
def _oracle_gains(tri_soa, n_tris, cand_pose5, gt, covered_now, key,
                  intr: CameraIntrinsics, n_slots: int,
                  gathering_factor, sensor_range, threshold=1.0):
    """Ground-truth greedy gain: newly covered GT fraction per candidate.

    The oracle upper bound for the 1-step greedy NBV policy: render every
    candidate pose (one batched pinhole-kernel call), backproject with the
    SAME sampling density the agent's capture uses, and count GT surface
    points that would flip from uncovered to covered under the coverage
    metric's threshold. Diagnoses whether the SconeOcc/SconeVis gain model
    or the greedy harness itself limits NBV quality (the reference never
    separates the two; its tester only reports the learned policy,
    testers/scene.py:631-663)."""
    R, T = get_camera_RT(cand_pose5[:, :3], cand_pose5[:, 3:])
    zb = render_depth_batch(tri_soa, n_tris, R, T, intr)
    keys = jax.random.split(key, cand_pose5.shape[0])

    chunk = 2048 if n_slots % 2048 == 0 else n_slots

    def per_cand(z, r, t, k):
        fp = backproject_sample(z, r, t, intr, k, n_slots,
                                gathering_factor=gathering_factor,
                                sensor_range=sensor_range)
        d = masked_min_dists(gt, fp.points, fp.valid, chunk=chunk)
        return jnp.sum((d < threshold) & ~covered_now)

    newly = jax.vmap(per_cand)(zb, R, T, keys)
    return newly.astype(jnp.float32) / gt.shape[0]


@functools.partial(jax.jit, static_argnames=("n_tokens",))
def _sample_tokens(key, points, valid, n_tokens: int = 1024):
    """Random n_tokens valid points (with replacement on the valid prefix).

    PointBuffer.append compacts valid points to the front, so the valid
    rows ARE the prefix — no permutation needed (a full-capacity argsort
    here would cost O(C log C) on a 2M-slot buffer every pose)."""
    count = jnp.maximum(jnp.sum(valid), 1)
    idx = jax.random.randint(key, (n_tokens,), 0, count)
    return points[idx]


def macarons_nbv_rollout(
    assets: SceneAssets,
    scone_occ: SconeOcc, occ_variables,
    scone_vis: SconeVis, vis_variables,
    params: Optional[Params] = None,
    n_poses: int = 100, seed: int = 8,
    n_tokens: int = 1024,
    n_proxy_tokens: int = 1024,
    interpret: Optional[bool] = None,
    oracle: bool = False,
    verbose: bool = False,
) -> RolloutResult:
    """oracle=True swaps the learned SconeVis gain for the ground-truth
    coverage-gain of each candidate (_oracle_gains): the upper bound of
    this greedy harness, independent of model quality. scone_occ/vis and
    their variables are ignored in that mode (pass None)."""
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

    n_elev_vs = int(p.view_state_n_elev)
    n_azim_vs = int(p.view_state_n_azim)
    base_h, h_polar = base_view_harmonics(n_elev_vs, n_azim_vs,
                                          int(p.harmonic_degree))

    sx_min = jnp.asarray(assets.settings.scene.x_min - 0.2)
    sx_max = jnp.asarray(assets.settings.scene.x_max + 0.2)
    proxy = ProxyField.create(next_key(), sx_min, sx_max,
                              int(p.n_proxy_points), n_elev_vs, n_azim_vs)

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
    pc, traj, last_zbuf = move_and_capture(
        tri_soa, n_tris, pose0, pose0, pc, traj, next_key(), intr,
        n_steps=int(p.n_interpolation_steps), n_azim=n_azim,
        n_slots=int(p.points_per_frame),
        gathering_factor=float(p.gathering_factor),
        sensor_range=float(p.sensor_range), interpret=interpret,
    )

    coverage_evolution: List[float] = []
    for pose_i in range(n_poses):
        cov = float(coverage_percentage(gt, pc.points, pc.count, next_key()))
        coverage_evolution.append(cov)
        if verbose and pose_i % 10 == 0:
            print(f"nbv pose {pose_i}: coverage {cov:.4f}")

        cur_pose = pose5(cur)
        # The last move's final substep rendered exactly this pose
        # (interpolate_pose returns new_pose5 at the final step), so the
        # returned last_zbuf IS the current frame — only R, T (pure camera
        # math) need recomputing, saving one full render per pose.
        R, T = get_camera_RT(cur_pose[None, :3], cur_pose[None, 3:])
        R, T = R[0], T[0]
        zbuf = last_zbuf
        if not oracle:
            proxy = carve_with_frame(
                proxy, zbuf, R, T, cur_pose[:3], intr,
                score_threshold=float(p.score_threshold),
                carving_tolerance=float(p.carving_tolerance),
                n_elev=n_elev_vs, n_azim=n_azim_vs,
                sensor_range=float(p.sensor_range),
            )

            # Occupancy prediction on a proxy-token sample.
            pc_tokens = _sample_tokens(next_key(), pc.points,
                                       pc.valid_mask(), n_tokens)
            box_center = (sx_min + sx_max) / 2.0
            box_diag = jnp.linalg.norm(sx_max - sx_min)
            norm = lambda q: (q - box_center) / box_diag
            vs_idx = jax.random.randint(next_key(), (n_proxy_tokens,), 0,
                                        proxy.points.shape[0])
            vh = compute_view_harmonics(
                proxy.view_states[None, vs_idx], base_h, h_polar,
                n_elev_vs, n_azim_vs,
            )
            occ = _occ_forward(scone_occ, occ_variables,
                               norm(pc_tokens)[None],
                               norm(proxy.points[vs_idx])[None], vh,
                               next_key())

            # Write predicted occupancy back to the proxy field (proxy_proba
            # update, train_macarons.py:313-317) for the sampled tokens.
            proxy = proxy._replace(
                proba=proxy.proba.at[vs_idx].set(occ[0]))

        # Candidate neighbors: unit moves (4 dirs) x nearby azimuths
        # (get_neighboring_poses_2d removes zero-translation neighbors,
        # macarons_utils.py:2447-2471). Fixed 4x5 slots + validity mask so
        # the jitted gain prediction compiles once, and the (C, 5) pose
        # batch is assembled in host numpy (per-candidate jnp round-trips
        # would sync the device ~20x per pose).
        C_MAX = len(DIRS) * 5
        cands: List[Tuple[int, int, int]] = []
        cand_valid = np.zeros((C_MAX,), bool)
        slot = 0
        for d, (dl, dh) in enumerate(DIRS):
            nl, nh = cur[0] + dl, cur[1] + dh
            ok = (0 <= nl < L and 0 <= nh < H
                  and not blocked[d, cur[0], cur[1]])
            for rot_shift in (-2, -1, 0, 1, 2):
                cands.append((nl, nh, (cur[2] + rot_shift) % n_azim) if ok
                             else (cur[0], cur[1], cur[2]))
                cand_valid[slot] = ok
                slot += 1
        if not cand_valid.any():
            cands[0] = (cur[0], cur[1], int(jax.random.randint(next_key(), (),
                                                               0, n_azim)))
            cand_valid[0] = True
        elev2 = float(assets.elevations_deg[2])
        cand_pose5 = jnp.asarray(np.stack([
            np.concatenate([positions[c[0], c[1]],
                            [elev2, assets.azimuths_deg[c[2]]]])
            for c in cands
        ]).astype(np.float32))
        if oracle:
            # Non-TPU backends fall back to masked_min_dists, which requires
            # a chunk-divisible pts length — the default full_pc_capacity
            # (2,000,000) is not 8192-divisible. Pick the largest divisor
            # <= 8192 so the fallback neither trips the assert nor
            # materializes a (G, capacity) distance matrix in one piece
            # (chunk=capacity would allocate tens of GB on CPU).
            cap = int(pc.points.shape[0])
            chunk = next(c for c in range(min(8192, cap), 0, -1)
                         if cap % c == 0)
            covered_now = min_dists(gt, pc.points, pc.valid_mask(),
                                    s_count=pc.count, chunk=chunk) < 1.0
            gains = _oracle_gains(
                tri_soa, n_tris, cand_pose5, gt, covered_now, next_key(),
                intr, int(p.points_per_frame),
                jnp.float32(p.gathering_factor),
                jnp.float32(p.sensor_range))
        else:
            # Fov-filtered, occupancy-weighted coverage-gain prediction
            # (predict_coverage_gain_for_single_camera semantics).
            gains = predict_coverage_gain(
                next_key(), scone_vis, vis_variables,
                proxy.points, proxy.proba,
                compute_view_harmonics(proxy.view_states[None], base_h,
                                       h_polar, n_elev_vs, n_azim_vs)[0],
                cand_pose5, intr, sx_min, sx_max,
                sensor_range=float(p.sensor_range),
                seq_len=min(int(p.seq_len), 1024),
                min_occ=float(p.get("min_occ_for_proxy_points", 0.1)),
            )
        gains = jnp.where(jnp.asarray(cand_valid), gains, -jnp.inf)
        best = int(jnp.argmax(gains))
        nxt = cands[best]

        pc, traj, last_zbuf = move_and_capture(
            tri_soa, n_tris, cur_pose, pose5(nxt), pc, traj, next_key(), intr,
            n_steps=int(p.n_interpolation_steps), n_azim=n_azim,
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
