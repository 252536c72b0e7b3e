"""MACARONS online self-supervised training loop.

TPU port of macarons/trainers/train_macarons.py — one online step per pose
(`loop`, :191-579):

1. depth from the current frame (ManyDepth, or the rendered zbuf when
   use_perfect_depth) -> backprojected partial pc -> surface store fill,
2. proxy carving: fov mask, signed distances, view states, supervision occ,
3. occupancy-field prediction with SconeOcc over proxy chunks (:313-317),
4. greedy NBV over neighbor poses with SconeVis coverage gains (:319-345) —
   gains are summed over the proxy points inside each candidate's FRUSTUM
   (predict_coverage_gain_for_single_camera, macarons_utils.py:1909-2080),
   which is what makes them depend on candidate orientation,
5. move + capture interpolation frames (:366-372),
6. losses (:389-545): photometric depth loss on the new frames, occupancy
   MSE vs carving pseudo-GT, coverage-gain loss (uncentered L1) vs the
   measured camera_coverage_gain,
7. when depth is PREDICTED (use_perfect_depth=False): periodic
   recompute_mapping analog (:815-1035, every remap_every_n_poses) — the
   frame history is re-inferred with the CURRENT depth weights and the
   point cloud, voxel store, and proxy carving are rebuilt from scratch
   (early garbage from the then-untrained depth net is purged); saved
   memory depths are refreshed. Under perfect depth the rebuild would
   reproduce the same state and is skipped.

Replay loops (memory_loop/memory_scene_loop :582-812) replay saved frames
through the same loss functions via sim.memory.Memory: scone replay
rebuilds scenes from other trajectories' saved depths, and depth replay
(memory_loop :582-607) re-trains ManyDepth photometrically on stored RGB
frame windows of other trajectories.
"""

from __future__ import annotations

import dataclasses
import functools
import random as _pyrandom
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..assets.scene_assets import SceneAssets
from ..config import Params, default_params
from ..geometry.cameras import (CameraIntrinsics, camera_center,
                                get_camera_RT, points_in_fov_mask)
from ..models.harmonics import base_view_harmonics
from ..models.macarons import Macarons
from ..models.scone import coverage_gain
from ..ops.coverage import coverage_percentage
from ..ops.raytrace import tris_to_soa
from ..ops.view_state import compute_view_harmonics
from ..planning.grid_paths import DIRS
from ..models.manydepth import disparity_to_depth
from ..sim.curriculum import curriculum_sampling_distances
from ..sim.proxy import ProxyField, carve_with_frame
from ..sim.rollout import TrajectoryBuffer, move_and_capture
from ..sim.sensor import (PointBuffer, backproject_sample, capture_depth,
                          capture_rgbd)
from ..sim.surface_store import SurfaceStore, camera_coverage_gain
from ..sim.tables import build_scene_tables
from .depth_losses import (color_jitter, error_mask_from_disparity,
                           horizontal_flip, photometric_loss,
                           regularity_loss)
from .pretrain_scone import uncentered_l1


@dataclasses.dataclass
class MacaronsTrainState:
    model: Macarons
    occ_opt_state: Any
    vis_opt_state: Any
    depth_opt_state: Any
    occ_tx: Any
    vis_tx: Any
    depth_tx: Any

    @staticmethod
    def create(key: jax.Array, params: Optional[Params] = None,
               depth_lr: float = 1e-4, scone_lr: float = 1e-4,
               depth_clip: float = 0.0) -> "MacaronsTrainState":
        """depth_clip > 0 prepends global-norm gradient clipping to the
        online depth optimizer — part of the staged-unfreeze recipe
        (VERDICT r4 item 4): unfrozen photometric updates on shading-only
        frames otherwise blow up the pretrained model within poses
        (data/depth_quality_r4_frozen.json)."""
        p = params or default_params()
        model = Macarons.create(
            key, image_height=int(p.image_height),
            image_width=int(p.image_width),
        )
        occ_tx = optax.adam(scone_lr)
        vis_tx = optax.adam(scone_lr)
        depth_tx = (optax.chain(optax.clip_by_global_norm(depth_clip),
                                optax.adam(depth_lr))
                    if depth_clip > 0 else optax.adam(depth_lr))
        return MacaronsTrainState(
            model=model,
            occ_opt_state=occ_tx.init(model.occ_vars),
            vis_opt_state=vis_tx.init(model.vis_vars),
            depth_opt_state=depth_tx.init(model.depth_vars),
            occ_tx=occ_tx, vis_tx=vis_tx, depth_tx=depth_tx,
        )


def make_depth_steps(depth_model, depth_tx, intr: CameraIntrinsics,
                     p: Params):
    """Jitted online depth-training + inference steps.

    Matches the reference's apply_depth_model + photometric supervision
    (macarons_utils.py:1089-1388, train_macarons.py:389-403): a frame
    triplet (target + 2 previous frames) goes through ManyDepth; the loss is
    min-over-alpha 0.85*SSIM + 0.15*L1 reprojection plus edge-aware
    regularity; photometric jitter (always, jitter_probability=1.0) and
    horizontal-flip symmetry aug (p=0.5, with the matching camera conjugate)
    mirror depth_model_utils.py:873-919. The reference's alphas=[-1,-2,1]
    (create_batch_for_depth_model, macarons_utils.py:1007-1086) include the
    future frame in the photometric supervision (not the cost volume): the
    caller passes it as x_fut and the loss mins over all three warps — the
    online loop trains one pose behind capture so the +1 frame exists.
    """
    reg_factor = float(p.get("regularity_loss_factor", 0.1))
    jitter_p = float(p.get("jitter_probability", 1.0))
    sym_p = float(p.get("symmetry_probability", 0.5))

    @functools.partial(jax.jit, static_argnames=("n_cv",))
    def depth_step(depth_vars, depth_opt, tgt, R, T, x_alpha, R_alpha,
                   T_alpha, rng, n_cv=2):
        """x_alpha stacks the supervision frames; the first n_cv of them
        (the past frames) feed the cost volume, all of them are warp
        targets for the min-over-alpha photometric loss."""
        k_j, k_f = jax.random.split(rng)
        all_imgs = jnp.concatenate([tgt[None], x_alpha], axis=0)
        all_imgs = color_jitter(
            k_j, all_imgs,
            brightness=float(p.get("brightness_jitter_range", 0.2)),
            contrast=float(p.get("contrast_jitter_range", 0.2)),
            saturation=float(p.get("saturation_jitter_range", 0.2)),
            hue=float(p.get("hue_jitter_range", 0.1)),
            probability=jitter_p)
        Rs = jnp.concatenate([R[None], R_alpha], axis=0)
        Ts = jnp.concatenate([T[None], T_alpha], axis=0)
        f_imgs, f_R, f_T = horizontal_flip(all_imgs, Rs, Ts)
        do_flip = jax.random.uniform(k_f) < sym_p
        imgs = jnp.where(do_flip, f_imgs, all_imgs)
        Rs = jnp.where(do_flip, f_R, Rs)
        Ts = jnp.where(do_flip, f_T, Ts)
        tgt2, xa2 = imgs[0], imgs[1:]
        R2, Ra2, T2, Ta2 = Rs[0], Rs[1:], Ts[0], Ts[1:]

        def loss_fn(dv):
            disp1, *_ = depth_model.apply(
                dv, tgt2[None], R2[None], T2[None], xa2[None, :n_cv],
                Ra2[None, :n_cv], Ta2[None, :n_cv])
            depth = disparity_to_depth(disp1[0, ..., 0])
            photo = photometric_loss(tgt2, depth, R2, T2, xa2, Ra2, Ta2,
                                     intr)
            reg = regularity_loss(disp1[0, ..., 0], tgt2)
            return photo + reg_factor * reg, (photo, reg)

        (loss, (photo, reg)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(depth_vars)
        updates, depth_opt = depth_tx.update(grads, depth_opt)
        return optax.apply_updates(depth_vars, updates), depth_opt, photo, reg

    @jax.jit
    def depth_infer(depth_vars, tgt, R, T, x_alpha, R_alpha, T_alpha):
        """Predicted depth map with the obtain_depth error mask; masked
        pixels get -1 (background convention of the perfect-depth path)."""
        disp1, *_ = depth_model.apply(depth_vars, tgt[None], R[None],
                                      T[None], x_alpha[None], R_alpha[None],
                                      T_alpha[None])
        d = disp1[0, ..., 0]
        depth = disparity_to_depth(d)
        ok = error_mask_from_disparity(d, tgt, jnp.ones_like(d, bool))
        return jnp.where(ok, depth, -1.0)

    return depth_step, depth_infer


def train_macarons_online(
    assets: SceneAssets,
    state: MacaronsTrainState,
    params: Optional[Params] = None,
    n_poses: int = 100,
    seed: int = 8,
    n_tokens: int = 512,
    n_proxy_tokens: int = 512,
    use_perfect_depth: bool = True,
    learn_depth: bool = False,
    unfreeze_depth_after: int = 0,
    depth_reject_factor: float = 0.0,
    log_depth_error: bool = False,
    memory=None,
    scene_memory_path: Optional[str] = None,
    memory_replay_loops: int = 0,
    interpret: Optional[bool] = None,
    verbose: bool = True,
) -> Dict[str, List[float]]:
    """One scene's online training trajectory. Returns loss/metric logs.

    When a sim.memory.Memory (+ scene_memory_path) is given, the loop
    persists per-pose frames/depths into the current trajectory slot, runs
    `memory_replay_loops` scone-replay steps per pose on scenes
    reconstructed from OTHER trajectories' saved depths
    (memory_scene_loop, train_macarons.py:609-812 — occupancy supervision
    from the stored proxy snapshot + coverage-gain supervision from the
    held-out replayed cameras' measured gains), and snapshots the occupancy
    field + surface + poses at the end.
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
    box_center = (sx_min + sx_max) / 2.0
    box_diag = jnp.linalg.norm(sx_max - sx_min)
    norm = lambda q: (q - box_center) / box_diag

    proxy = ProxyField.create(next_key(), sx_min, sx_max,
                              int(p.n_proxy_points), n_elev_vs, n_azim_vs)
    surface = SurfaceStore.create(
        262144, sx_min, sx_max,
        float(p.get("surface_resolution", 0.05)) * float(p.scene_scale_factor),
    )
    # Fresh (empty) store consumed by scone_replay_step's measured-gain
    # replay; created here because SurfaceStore.create is not traceable.
    replay_store_template = SurfaceStore.create(
        65536, sx_min, sx_max,
        float(p.get("surface_resolution", 0.05)) * float(p.scene_scale_factor))
    pc = PointBuffer.create(int(p.full_pc_capacity))
    traj = TrajectoryBuffer.create(8 * (n_poses + 4))

    def pose5(idx):
        i_l, i_h, rot = idx
        pos = positions[i_l, i_h]
        return jnp.asarray([pos[0], pos[1], pos[2],
                            assets.elevations_deg[2],
                            assets.azimuths_deg[rot]], jnp.float32)

    cur = (int(assets.start_cam_idx[0]), int(assets.start_cam_idx[2]),
           int(assets.start_cam_idx[4]))
    pose0 = pose5(cur)
    pc, traj, _ = move_and_capture(
        tri_soa, n_tris, pose0, pose0, pc, traj, next_key(), intr,
        n_steps=int(p.n_interpolation_steps), n_azim=n_azim,
        n_slots=int(p.points_per_frame),
        gathering_factor=float(p.gathering_factor),
        sensor_range=float(p.sensor_range), interpret=interpret,
    )

    occ_model = state.model.scone_occ
    vis_model = state.model.scone_vis

    # log_depth_error needs RGB frames + depth inference even when the
    # model is frozen (learn_depth=False): a frozen-eval probe still
    # measures |predicted - zbuf| every pose.
    need_rgb = learn_depth or not use_perfect_depth or log_depth_error
    depth_step = depth_infer = None
    if need_rgb:
        depth_step, depth_infer = make_depth_steps(
            state.model.depth, state.depth_tx, intr, p)
    tri_colors = jnp.asarray(assets.tri_colors)
    ambient = float(p.get("ambient_light_intensity", 0.85))
    frame_hist: List[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]] = []

    def _weighted_uncentered_l1(x, y, w, eps=1e-7):
        """uncentered_l1 over the valid candidates only (w in {0,1});
        padded candidate slots must not shift the normalizing means."""
        wsum = jnp.maximum(jnp.sum(w), 1.0)
        mx = jnp.sum(x * w) / wsum
        my = jnp.sum(y * w) / wsum
        return jnp.sum(jnp.abs(x / (mx + eps) - y / (my + eps)) * w) / wsum

    @jax.jit
    def scone_step(occ_vars, vis_vars, occ_opt, vis_opt, pc_tokens,
                   proxy_pts, proxy_vh, sup_occ, cand_cams, cand_fov,
                   cand_w, measured_gain, rng):
        def loss_fn(ov, vv):
            occ_pred = occ_model.apply(ov, norm(pc_tokens)[None],
                                       norm(proxy_pts)[None], proxy_vh,
                                       key=rng)
            occ_loss = jnp.mean((occ_pred[0] - sup_occ) ** 2)
            tokens4 = jnp.concatenate([norm(proxy_pts), occ_pred[0]],
                                      axis=-1)[None]
            h = vis_model.apply(vv, tokens4, view_harmonics=proxy_vh)
            # Same frustum masks as the NBV decision: identical candidate
            # POSITIONS with different orientations get different predicted
            # gains, so the supervision targets are fittable.
            pred_gain = coverage_gain(tokens4[..., :3], h,
                                      norm(cand_cams)[None],
                                      fov_mask=cand_fov[None])
            cov_loss = _weighted_uncentered_l1(pred_gain[0], measured_gain,
                                               cand_w)
            return occ_loss + cov_loss, (occ_loss, cov_loss)

        (loss, (ol, cl)), grads = jax.value_and_grad(
            lambda ov, vv: loss_fn(ov, vv), argnums=(0, 1), has_aux=True
        )(occ_vars, vis_vars)
        ou, occ_opt = state.occ_tx.update(grads[0], occ_opt)
        vu, vis_opt = state.vis_tx.update(grads[1], vis_opt)
        return (optax.apply_updates(occ_vars, ou),
                optax.apply_updates(vis_vars, vu), occ_opt, vis_opt, ol, cl)

    @jax.jit
    def occ_replay_step(occ_vars, occ_opt, pc_tokens, proxy_pts, proxy_vh,
                        sup_occ, rng):
        """Occupancy supervision on a memory-replayed scene
        (memory_scene_loop, train_macarons.py:609-812)."""
        def loss_fn(ov):
            pred = occ_model.apply(ov, norm(pc_tokens)[None],
                                   norm(proxy_pts)[None], proxy_vh, key=rng)
            return jnp.mean((pred[0] - sup_occ) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(occ_vars)
        ou, occ_opt = state.occ_tx.update(grads, occ_opt)
        return optax.apply_updates(occ_vars, ou), occ_opt, loss

    @jax.jit
    def scone_replay_step(occ_vars, vis_vars, occ_opt, vis_opt, pc_tokens,
                          proxy_pts, proxy_vh, sup_occ, base_clouds,
                          base_valid, replay_clouds, replay_valid,
                          replay_cams, rng):
        """Occupancy + coverage-gain supervision on a memory-replayed scene
        (memory_scene_loop, train_macarons.py:609-812): the replayed
        cameras' measured coverage gains (:737-744) supervise SconeVis with
        the same uncentered-L1 the online step uses (:526-545).

        Measured gains replay the online semantics exactly: the base frames
        are pushed through camera_coverage_gain + fill in order (building
        the covered state the trajectory had), then each held-out camera is
        measured against it before its own cloud is filled.
        """
        store = replay_store_template

        def seen(store, inp):
            cloud, valid = inp
            _, store = camera_coverage_gain(store, cloud, valid, eps_cov)
            return store.fill(cloud, valid), None

        store, _ = jax.lax.scan(seen, store, (base_clouds, base_valid))

        def measure(store, inp):
            cloud, valid = inp
            gain, store = camera_coverage_gain(store, cloud, valid, eps_cov)
            gain = gain / jnp.maximum(jnp.sum(valid), 1)
            return store.fill(cloud, valid), gain

        _, measured = jax.lax.scan(measure, store,
                                   (replay_clouds, replay_valid))

        def loss_fn(ov, vv):
            occ_pred = occ_model.apply(ov, norm(pc_tokens)[None],
                                       norm(proxy_pts)[None], proxy_vh,
                                       key=rng)
            occ_loss = jnp.mean((occ_pred[0] - sup_occ) ** 2)
            tokens4 = jnp.concatenate([norm(proxy_pts), occ_pred[0]],
                                      axis=-1)[None]
            h = vis_model.apply(vv, tokens4, view_harmonics=proxy_vh)
            pred_gain = coverage_gain(tokens4[..., :3], h,
                                      norm(replay_cams)[None])
            cov_loss = uncentered_l1(pred_gain[..., None],
                                     measured[None, :, None])
            return occ_loss + cov_loss, (occ_loss, cov_loss)

        (_, (ol, cl)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(occ_vars, vis_vars)
        ou, occ_opt = state.occ_tx.update(grads[0], occ_opt)
        vu, vis_opt = state.vis_tx.update(grads[1], vis_opt)
        return (optax.apply_updates(occ_vars, ou),
                optax.apply_updates(vis_vars, vu), occ_opt, vis_opt, ol, cl)

    def run_memory_replay(rng_py, n_replay_poses: int = 2):
        scene = memory.get_random_scene_for_scone_model(
            scene_memory_path, intr, rng=rng_py,
            sensor_range=float(p.sensor_range),
            n_replay_poses=n_replay_poses)
        if scene is None:
            return None
        pr = np.random.default_rng(rng_py.randrange(2**31))
        pi = pr.integers(0, len(scene["proxy_points"]), n_proxy_tokens)
        si = pr.integers(0, len(scene["surface"]), n_tokens)
        vh_r = compute_view_harmonics(
            jnp.asarray(scene["view_states"][pi])[None], base_h, h_polar,
            n_elev_vs, n_azim_vs)
        if "replay_cams" in scene:
            (state.model.occ_vars, state.model.vis_vars, state.occ_opt_state,
             state.vis_opt_state, ol, cl) = scone_replay_step(
                state.model.occ_vars, state.model.vis_vars,
                state.occ_opt_state, state.vis_opt_state,
                jnp.asarray(scene["surface"][si]),
                jnp.asarray(scene["proxy_points"][pi]), vh_r,
                jnp.asarray(scene["supervision_occ"][pi]),
                jnp.asarray(scene["base_clouds"]),
                jnp.asarray(scene["base_valid"]),
                jnp.asarray(scene["replay_clouds"]),
                jnp.asarray(scene["replay_valid"]),
                jnp.asarray(scene["replay_cams"]), next_key())
            logs["replay_cov_loss"].append(float(cl))
            return float(ol)
        (state.model.occ_vars, state.occ_opt_state, loss) = occ_replay_step(
            state.model.occ_vars, state.occ_opt_state,
            jnp.asarray(scene["surface"][si]),
            jnp.asarray(scene["proxy_points"][pi]), vh_r,
            jnp.asarray(scene["supervision_occ"][pi]), next_key())
        return float(loss)

    # Staged-unfreeze guard state (depth_reject_factor > 0): recent
    # accepted photometric losses + the last known-good (vars, opt)
    # snapshot. Shared by the online depth step AND the memory-replay depth
    # step — a replay update that bypassed the guard could poison the model
    # inside the "frozen" window or be silently reverted by a later online
    # rollback.
    _depth_guard = {"photos": [], "snapshot": None}

    def apply_depth_update(new_vars, new_opt, photo, pose_marker):
        """Accept or reject a computed depth update.

        ``photo`` is the loss at the PRE-update weights, so a spike means
        earlier accepted updates (or a no-overlap rotation-heavy frame
        whose photometric gradient is depth-independent garbage — the r3
        bimodality) poisoned the model or the sample. On a spike: roll
        back to the last good snapshot and discard this update; otherwise
        snapshot the pre-update weights as known-good and accept.
        Returns the float loss."""
        photo_f = float(photo)
        photos = _depth_guard["photos"]
        good = bool(photos) and photo_f <= depth_reject_factor * float(
            np.median(photos[-10:]))
        if depth_reject_factor <= 0 or not photos or good:
            if depth_reject_factor > 0:
                _depth_guard["snapshot"] = (state.model.depth_vars,
                                            state.depth_opt_state)
                photos.append(photo_f)
            state.model.depth_vars = new_vars
            state.depth_opt_state = new_opt
        elif _depth_guard["snapshot"] is not None:
            state.model.depth_vars, state.depth_opt_state = \
                _depth_guard["snapshot"]
            logs.setdefault("depth_rejected_poses", []).append(pose_marker)
        return photo_f

    def run_depth_memory_replay(rng_py, pose_marker):
        """memory_loop analog (train_macarons.py:582-607): a consecutive
        4-frame RGB window from a NON-current trajectory re-trains ManyDepth
        with the same photometric step as the online path (target = frame 2,
        alphas [-1, -2, +1] = frames 1, 0, 3). Updates flow through the
        same staged-unfreeze guard as the online step."""
        frames = memory.random_replay_frames(scene_memory_path, 4,
                                             rng=rng_py)
        if len(frames) < 4 or "rgb" not in frames[0]:
            return None

        def img(f):
            return jnp.asarray(f["rgb"], jnp.float32) / 255.0

        tgt, alphas = frames[2], (frames[1], frames[0], frames[3])
        x_alpha = jnp.stack([img(f) for f in alphas])
        R_a = jnp.stack([jnp.asarray(f["R"], jnp.float32).reshape(3, 3)
                         for f in alphas])
        T_a = jnp.stack([jnp.asarray(f["T"], jnp.float32).reshape(3)
                         for f in alphas])
        new_vars, new_opt, photo, _ = depth_step(
            state.model.depth_vars, state.depth_opt_state, img(tgt),
            jnp.asarray(tgt["R"], jnp.float32).reshape(3, 3),
            jnp.asarray(tgt["T"], jnp.float32).reshape(3),
            x_alpha, R_a, T_a, next_key())
        return apply_depth_update(new_vars, new_opt, photo, pose_marker)

    mem_rng = _pyrandom.Random(seed + 17)
    frame_nb = 0
    if memory is not None and scene_memory_path:
        # Clear the reused slot's stale files (a previous occupant's longer
        # trajectory would otherwise leak into frame counts and replay).
        memory.begin_trajectory(scene_memory_path)
    pose_history: List[List[float]] = []
    # Host-side frame archive for the recompute_mapping analog (uint8 RGB
    # to keep it small; only kept when depth is predicted).
    all_frames: List[Tuple[np.ndarray, np.ndarray, np.ndarray]] = []
    remap_every = int(p.get("remap_every_n_poses", 95))

    logs = {"coverage": [], "occ_loss": [], "cov_loss": [], "gain": [],
            "depth_loss": [], "depth_abs_err": [], "store_coverage": [],
            "replay_occ_loss": [], "replay_cov_loss": [],
            "replay_depth_loss": []}
    # Coverage epsilon tracks the stores' voxel resolution (testers/scene.py
    # :544-545: eps = 2 * test_resolution * scale) — a hard-coded 0.05 here
    # would silently decouple from surface stores built with an overridden
    # surface_resolution.
    eps_cov = (2.0 * float(p.get("surface_resolution", 0.05))
               * float(p.scene_scale_factor)
               * float(p.surface_epsilon_factor))
    curriculum_dists = curriculum_sampling_distances(
        max(n_poses, 2),
        float(3.0 * proxy.distance_between_points),
        float(2.0 * jnp.linalg.norm(sx_max - sx_min)),
    )
    for pose_i in range(n_poses):
        cov = float(coverage_percentage(gt, pc.points, pc.count, next_key()))
        logs["coverage"].append(cov)
        if verbose and pose_i % 10 == 0:
            print(f"macarons pose {pose_i}: coverage {cov:.4f}")

        cur_pose = pose5(cur)
        pose_history.append([float(v) for v in np.asarray(cur_pose)])
        if need_rgb:
            rgb, zbuf, R, T = capture_rgbd(tri_soa, n_tris, cur_pose, intr,
                                           tri_colors=tri_colors,
                                           ambient=ambient)
            frame_hist.append((rgb, R, T))
            if len(frame_hist) > 4:
                frame_hist.pop(0)
            if not use_perfect_depth:
                all_frames.append((
                    (np.clip(np.asarray(rgb), 0, 1) * 255).astype(np.uint8),
                    np.asarray(R), np.asarray(T)))
        else:
            zbuf, R, T = capture_depth(tri_soa, n_tris, cur_pose, intr)

        have_context = need_rgb and len(frame_hist) >= 3
        if learn_depth and pose_i >= unfreeze_depth_after \
                and len(frame_hist) >= 4:
            # Online self-supervised depth step, one pose behind capture:
            # target = previous frame, alphas = [-1, -2, +1] relative to it
            # (params.alphas, create_batch_for_depth_model,
            # macarons_utils.py:1007-1086; train step train_macarons.py
            # :389-403). The +1 frame (just captured) joins the photometric
            # warps; the cost volume sees only the two past frames.
            x_alpha = jnp.stack([frame_hist[-3][0], frame_hist[-4][0],
                                 frame_hist[-1][0]])
            R_a = jnp.stack([frame_hist[-3][1], frame_hist[-4][1],
                             frame_hist[-1][1]])
            T_a = jnp.stack([frame_hist[-3][2], frame_hist[-4][2],
                             frame_hist[-1][2]])
            new_vars, new_opt, photo, reg = depth_step(
                state.model.depth_vars, state.depth_opt_state,
                frame_hist[-2][0], frame_hist[-2][1], frame_hist[-2][2],
                x_alpha, R_a, T_a, next_key())
            # Loss-spike rejection (staged-unfreeze recipe, VERDICT r4
            # item 4) — accept/rollback logic in apply_depth_update.
            logs["depth_loss"].append(
                apply_depth_update(new_vars, new_opt, photo, pose_i))
        if not use_perfect_depth and have_context:
            # Backproject through the PREDICTED depth (apply_depth_model,
            # macarons_utils.py:1089-1289) instead of the rendered zbuf.
            x_alpha = jnp.stack([frame_hist[-2][0], frame_hist[-3][0]])
            R_a = jnp.stack([frame_hist[-2][1], frame_hist[-3][1]])
            T_a = jnp.stack([frame_hist[-2][2], frame_hist[-3][2]])
            zbuf_used = depth_infer(state.model.depth_vars, rgb, R, T,
                                    x_alpha, R_a, T_a)
        else:
            zbuf_used = zbuf
        if log_depth_error and need_rgb and have_context:
            # Depth-quality metric: mean |predicted - rendered zbuf| over
            # pixels valid in BOTH maps (the predicted map carries the
            # obtain_depth error mask as -1; zbuf uses -1 background).
            # In perfect-depth mode the inference pass runs solely for this
            # metric so the learning curve is observable without routing
            # the (possibly untrained) prediction into the mapping.
            if use_perfect_depth:
                x_alpha = jnp.stack([frame_hist[-2][0], frame_hist[-3][0]])
                R_a = jnp.stack([frame_hist[-2][1], frame_hist[-3][1]])
                T_a = jnp.stack([frame_hist[-2][2], frame_hist[-3][2]])
                pred = depth_infer(state.model.depth_vars, rgb, R, T,
                                   x_alpha, R_a, T_a)
            else:
                pred = zbuf_used
            valid = (pred > 0) & (zbuf > 0)
            err = jnp.sum(jnp.abs(pred - zbuf) * valid) / jnp.maximum(
                jnp.sum(valid), 1)
            logs["depth_abs_err"].append(float(err))
        if memory is not None and scene_memory_path:
            traj_slot = memory.current_trajectory()
            memory.save_frame(scene_memory_path, traj_slot, frame_nb,
                              np.asarray(zbuf), np.asarray(R), np.asarray(T),
                              float(p.zfar),
                              rgb=np.asarray(rgb) if need_rgb else None)
            memory.save_depth(scene_memory_path, traj_slot, frame_nb,
                              np.asarray(zbuf_used), np.asarray(R),
                              np.asarray(T))
            frame_nb += 1
            for _ in range(memory_replay_loops):
                rl = run_memory_replay(mem_rng)
                if rl is not None:
                    logs["replay_occ_loss"].append(rl)
                # Replay depth updates respect the same freeze window as
                # the online step (and the shared rejection guard above).
                if learn_depth and pose_i >= unfreeze_depth_after:
                    dl_r = run_depth_memory_replay(mem_rng, pose_i)
                    if dl_r is not None:
                        logs["replay_depth_loss"].append(dl_r)

        batch = backproject_sample(zbuf_used, R, T, intr, next_key(),
                                   int(p.points_per_frame),
                                   gathering_factor=float(p.gathering_factor),
                                   sensor_range=float(p.sensor_range))
        surface = surface.fill(batch.points, batch.valid)
        if log_depth_error:
            # Mapping-quality metric: GT coverage of the SURFACE STORE —
            # the store is filled through zbuf_used (predicted depth when
            # use_perfect_depth=False), unlike logs["coverage"] whose
            # point buffer follows the reference's GT-zbuf covered_scene
            # (testers/scene.py:529-551) and is depth-model-independent.
            logs["store_coverage"].append(float(coverage_percentage(
                gt, surface.points, surface.count, next_key())))
        proxy = carve_with_frame(
            proxy, zbuf_used, R, T, cur_pose[:3], intr,
            score_threshold=float(p.score_threshold),
            carving_tolerance=float(p.carving_tolerance),
            n_elev=n_elev_vs, n_azim=n_azim_vs,
            sensor_range=float(p.sensor_range),
        )

        # Candidate neighbors + greedy NBV using current vis model.
        # Fixed C_MAX slots (4 neighbors x 5 rotations) with a validity
        # mask: variable candidate counts would retrace the jitted
        # scone_step per distinct count.
        C_MAX = len(DIRS) * 5
        cands: List[Tuple[int, int, int]] = []
        cand_valid = np.zeros((C_MAX,), np.float32)
        slot = 0
        for d, (dl, dh) in enumerate(DIRS):
            nl, nh = cur[0] + dl, cur[1] + dh
            ok = (0 <= nl < L and 0 <= nh < H
                  and not blocked[d, cur[0], cur[1]])
            for rs in (-2, -1, 0, 1, 2):
                if ok:
                    cands.append((nl, nh, (cur[2] + rs) % n_azim))
                else:
                    cands.append((cur[0], cur[1], cur[2]))
                cand_valid[slot] = 1.0 if ok else 0.0
                slot += 1
        if not cand_valid.any():
            # Dead end: rotate in place (testers keep a random rotation).
            cands[0] = (cur[0], cur[1],
                        int(jax.random.randint(next_key(), (), 0, n_azim)))
            cand_valid[0] = 1.0
        cand_xyz = np.stack([positions[c[0], c[1]] for c in cands])
        cand_pose = jnp.asarray(np.stack(
            [np.asarray(pose5(c)) for c in cands]))
        # Per-candidate frustum masks over the sampled proxy points: the
        # reference sums visibility gains over the points in each
        # candidate's FOV (x fov proxy volume), which is the only way the
        # gain distinguishes the 5 rotations sharing one position.
        R_c, T_c = get_camera_RT(cand_pose[:, :3], cand_pose[:, 3:5])

        # Proxy/pc token samples, curriculum-weighted: supervision
        # concentrates near the camera early in the trajectory and widens
        # following get_curriculum_sampling_distances' arctan ramp
        # (macarons_utils.py:1744-1754; reference samples within the ramp
        # distance of observed SURFACE cells — camera-centered here, delta
        # documented).
        d_t = curriculum_dists[min(pose_i, len(curriculum_dists) - 1)]
        prox_d = jnp.linalg.norm(proxy.points - cur_pose[:3][None], axis=-1)
        cur_logits = jnp.where(prox_d <= d_t, 0.0, -jnp.inf)
        cur_logits = jnp.where(jnp.any(prox_d <= d_t), cur_logits,
                               jnp.zeros_like(cur_logits))
        pidx = jax.random.categorical(next_key(), cur_logits,
                                      shape=(n_proxy_tokens,))
        proxy_pts = proxy.points[pidx]
        sup_occ = proxy.supervision_occ[pidx]
        vh = compute_view_harmonics(proxy.view_states[None, pidx], base_h,
                                    h_polar, n_elev_vs, n_azim_vs)
        cnt = jnp.maximum(pc.count, 1)
        tidx = jax.random.randint(next_key(), (n_tokens,), 0, cnt)
        pc_tokens = pc.points[tidx]

        # NBV decision with the current model (4-dim x,y,z,occ tokens).
        cand_fov = jax.vmap(
            lambda Rc, Tc: points_in_fov_mask(
                proxy_pts, Rc, Tc, intr,
                fov_range=float(p.sensor_range))
        )(R_c, T_c).astype(jnp.float32)
        h = vis_model.apply(
            state.model.vis_vars,
            jnp.concatenate([norm(proxy_pts), sup_occ], -1)[None],
            view_harmonics=vh)
        gains = coverage_gain(norm(proxy_pts)[None], h,
                              norm(jnp.asarray(cand_xyz))[None],
                              fov_mask=cand_fov[None])[0]
        gains = jnp.where(jnp.asarray(cand_valid) > 0, gains, -jnp.inf)
        chosen = int(jnp.argmax(gains))
        nxt = cands[chosen]

        # Move + capture; measure the true coverage gain of the move.
        pc, traj, _ = move_and_capture(
            tri_soa, n_tris, cur_pose, pose5(nxt), pc, traj, next_key(), intr,
            n_steps=int(p.n_interpolation_steps), n_azim=n_azim,
            n_slots=int(p.points_per_frame),
            gathering_factor=float(p.gathering_factor),
            sensor_range=float(p.sensor_range), interpret=interpret,
        )
        zb2, R2, T2 = capture_depth(tri_soa, n_tris, pose5(nxt), intr)
        new_batch = backproject_sample(zb2, R2, T2, intr, next_key(),
                                       int(p.points_per_frame),
                                       gathering_factor=float(p.gathering_factor),
                                       sensor_range=float(p.sensor_range))
        gain, surface = camera_coverage_gain(surface, new_batch.points,
                                             new_batch.valid, eps_cov)
        logs["gain"].append(float(gain))

        # Supervised step: measured gain distribution over candidates is a
        # one-hot-ish proxy (the executed candidate's measured gain); padded
        # candidate slots carry weight 0.
        measured = jnp.full((C_MAX,), 1e-3)
        measured = measured.at[chosen].set(
            jnp.maximum(gain / jnp.maximum(jnp.sum(new_batch.valid), 1), 1e-3))
        (state.model.occ_vars, state.model.vis_vars, state.occ_opt_state,
         state.vis_opt_state, ol, cl) = scone_step(
            state.model.occ_vars, state.model.vis_vars, state.occ_opt_state,
            state.vis_opt_state, pc_tokens, proxy_pts, vh, sup_occ,
            jnp.asarray(cand_xyz), cand_fov, jnp.asarray(cand_valid),
            measured, next_key(),
        )
        logs["occ_loss"].append(float(ol))
        logs["cov_loss"].append(float(cl))

        if (not use_perfect_depth and remap_every > 0 and pose_i > 0
                and pose_i % remap_every == 0 and len(all_frames) >= 3):
            # recompute_mapping analog (macarons_utils.py:815-1035): re-run
            # the CURRENT depth weights over the whole frame history and
            # rebuild pc / voxel store / proxy carving from scratch,
            # purging the garbage an earlier (less-trained) depth model
            # backprojected. Frames 0-1 lack past context and are skipped
            # (the reference reloads them with their stored neighbors).
            surface = SurfaceStore.create(
                262144, sx_min, sx_max,
                float(p.get("surface_resolution", 0.05))
                * float(p.scene_scale_factor))
            pc = PointBuffer.create(int(p.full_pc_capacity))
            P_n = proxy.points.shape[0]
            proxy = proxy._replace(
                proba=jnp.full((P_n, 1), 0.5),
                supervision_occ=jnp.ones((P_n, 1)),
                view_states=jnp.zeros_like(proxy.view_states),
                n_inside_fov=jnp.zeros((P_n, 1)),
                n_behind_depth=jnp.zeros((P_n, 1)),
                out_of_field=jnp.ones((P_n, 1)),
            )
            for t in range(2, len(all_frames)):
                rgb_t = jnp.asarray(all_frames[t][0], jnp.float32) / 255.0
                R_t = jnp.asarray(all_frames[t][1])
                T_t = jnp.asarray(all_frames[t][2])
                x_a = jnp.stack([
                    jnp.asarray(all_frames[t - 1][0], jnp.float32) / 255.0,
                    jnp.asarray(all_frames[t - 2][0], jnp.float32) / 255.0])
                R_a = jnp.stack([jnp.asarray(all_frames[t - 1][1]),
                                 jnp.asarray(all_frames[t - 2][1])])
                T_a = jnp.stack([jnp.asarray(all_frames[t - 1][2]),
                                 jnp.asarray(all_frames[t - 2][2])])
                z_t = depth_infer(state.model.depth_vars, rgb_t, R_t, T_t,
                                  x_a, R_a, T_a)
                b = backproject_sample(
                    z_t, R_t, T_t, intr, next_key(),
                    int(p.points_per_frame),
                    gathering_factor=float(p.gathering_factor),
                    sensor_range=float(p.sensor_range))
                pc = pc.append(b, prefix_valid=True)
                surface = surface.fill(b.points, b.valid)
                proxy = carve_with_frame(
                    proxy, z_t, R_t, T_t, camera_center(R_t, T_t), intr,
                    score_threshold=float(p.score_threshold),
                    carving_tolerance=float(p.carving_tolerance),
                    n_elev=n_elev_vs, n_azim=n_azim_vs,
                    sensor_range=float(p.sensor_range),
                )
                if memory is not None and scene_memory_path:
                    # Refresh the saved depths with the re-inferred maps
                    # (recompute_mapping's save_depths tier).
                    memory.save_depth(scene_memory_path,
                                      memory.current_trajectory(), t,
                                      np.asarray(z_t), np.asarray(R_t),
                                      np.asarray(T_t))
            if verbose:
                print(f"macarons pose {pose_i}: recompute_mapping rebuilt "
                      f"{len(all_frames) - 2} frames, "
                      f"{int(pc.count)} points")

        cur = nxt

    if memory is not None and scene_memory_path:
        # End-of-trajectory snapshots (save_surface_scene_in_memory /
        # save_occupancy_field_in_memory, macarons_utils.py:755-821, and the
        # per-epoch pose dumps, train_macarons.py:1402-1410).
        traj_slot = memory.current_trajectory()
        memory.save_surface(scene_memory_path, traj_slot,
                            np.asarray(pc.points), int(pc.count))
        memory.save_occupancy(
            scene_memory_path, traj_slot, np.asarray(proxy.points),
            np.asarray(proxy.proba), np.asarray(proxy.supervision_occ),
            np.asarray(proxy.view_states), np.asarray(proxy.out_of_field))
        memory.save_poses(scene_memory_path, pose_history,
                          traj=traj_slot)
    return logs
