"""SCONE pretraining harness (occupancy + visibility).

Analog of macarons/trainers/pretrain_scone_occ.py and pretrain_scone_vis.py:
sample camera subsets on a sphere around an object, build partial point
clouds + view-state harmonics, then

* occ: predict occupancy of query points, MSE vs GT occupancy
  (pretrain_scone_occ.py:10-130),
* vis: predict per-point visibility-gain harmonics, supervise the
  per-candidate-camera coverage distribution with the configured loss
  (pretrain_scone_vis.py:10-195; losses KLDivCE / L1 / uncentered L1 from
  SconeVis.py:306-377 — default "uncentered_l1" per config).

The ShapeNet dataset is not vendored; objects come from the procedural
blob-object generator (assets/objects.py — closed exterior meshes whose GT
occupancy the parity kernel provides; procgen SCENES are interiors and
would make sphere-camera visibility degenerate). Partial point clouds are
produced by the same renderer used everywhere else.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..assets.objects import (FAMILIES, cameras_on_sphere, generate_object,
                              pose5_toward)
from ..geometry.cameras import CameraIntrinsics
from ..models.harmonics import base_view_harmonics
from ..models.scone import SconeOcc, SconeVis, coverage_gain
from ..ops.raytrace import points_inside_mesh, tris_to_soa
from ..ops.view_state import compute_view_harmonics, compute_view_state
from ..sim.sensor import backproject_sample, capture_depth


def kl_div_ce(x, y):
    """KL(softmax(y) || softmax(x)) batchmean (SconeVis.py:306-320)."""
    logp = jax.nn.log_softmax(x, axis=1)
    q = jax.nn.softmax(y, axis=1)
    return jnp.sum(q * (jnp.log(jnp.clip(q, 1e-12)) - logp)) / x.shape[0]


def normalized_l1(x, y, eps: float = 1e-7):
    """Std-normalized L1 between coverage distributions (:322-351)."""
    nx = (x - x.mean(axis=1, keepdims=True)) / (x.std(axis=1, keepdims=True) + eps)
    ny = (y - y.mean(axis=1, keepdims=True)) / (y.std(axis=1, keepdims=True) + eps)
    return jnp.mean(jnp.abs(nx - ny))


def uncentered_l1(x, y, eps: float = 1e-7):
    """Mean-normalized L1 (:353-377) — the default cov_loss_fn."""
    nx = x / (x.mean(axis=1, keepdims=True) + eps)
    ny = y / (y.mean(axis=1, keepdims=True) + eps)
    return jnp.mean(jnp.abs(nx - ny))


COV_LOSSES = {"kl_divergence": kl_div_ce, "l1": normalized_l1,
              "uncentered_l1": uncentered_l1}


@dataclasses.dataclass
class PretrainSample:
    partial_pc: np.ndarray       # (N, 3) normalized
    query_x: np.ndarray          # (M, 3) normalized
    query_occ: np.ndarray        # (M, 1)
    view_harmonics: np.ndarray   # (M, n_harmonics)
    candidate_cams: np.ndarray   # (C, 3) normalized
    gt_coverage: np.ndarray      # (C,)


def make_pretrain_sample(seed: int, n_partial: int = 1024, n_query: int = 512,
                         n_candidates: int = 16, n_views: int = 3,
                         n_elev: int = 7, n_azim: int = 14,
                         intr: Optional[CameraIntrinsics] = None
                         ) -> PretrainSample:
    """Build one supervised sample from a procedural blob object, viewed
    from sphere cameras like the reference's ShapeNet setup
    (pretrain_scone_occ.py:10-130: sample n_views cameras on a sphere,
    fuse their partial clouds, supervise occupancy / per-candidate
    coverage)."""
    rng = np.random.default_rng(seed)
    # Rotate through the shape families (assets/objects.FAMILIES) so a
    # pretraining set spans blobs, superquadrics and gouged concave shapes —
    # the category-diversity analog of the reference's multi-category
    # ShapeNet split (pretrain_scone_occ.py:248).
    assets = generate_object(seed, family=FAMILIES[seed % len(FAMILIES)])
    soa = tris_to_soa(jnp.asarray(assets.tris))
    n_tris = assets.n_tris
    intr = intr or CameraIntrinsics(image_height=64, image_width=114)

    lo = assets.x_min
    hi = assets.x_max
    center = (lo + hi) / 2.0
    diag = float(np.linalg.norm(hi - lo))

    key = jax.random.PRNGKey(seed)
    view_cams = cameras_on_sphere(n_views, 0.7 * diag, center, rng)
    cam_positions = []
    parts = []
    for v in range(n_views):
        pos = view_cams[v]
        pose5 = jnp.asarray(pose5_toward(pos, center))
        zbuf, R, T = capture_depth(soa, n_tris, pose5, intr)
        key, sub = jax.random.split(key)
        batch = backproject_sample(zbuf, R, T, intr, sub, n_partial,
                                   gathering_factor=0.2, sensor_range=200.0)
        pts = np.asarray(batch.points)[np.asarray(batch.valid)]
        parts.append(pts)
        cam_positions.append(np.asarray(pos))

    partial = np.concatenate(parts, axis=0) if parts else np.zeros((0, 3))
    if len(partial) >= n_partial:
        partial = partial[rng.permutation(len(partial))[:n_partial]]
    else:
        pad = rng.integers(0, max(len(partial), 1), n_partial - len(partial))
        partial = np.concatenate([partial, partial[pad]]) if len(partial) else (
            np.zeros((n_partial, 3), np.float32))

    # Query points + GT occupancy by parity (objects are solids: occupied
    # == inside the closed mesh, no inversion).
    queries = rng.uniform(lo, hi, size=(n_query, 3)).astype(np.float32)
    occ = np.asarray(points_inside_mesh(jnp.asarray(queries), soa, n_tris))
    occ = occ.astype(np.float32)[:, None]

    # View harmonics at query points from the cameras used.
    base_h, h_polar = base_view_harmonics(n_elev, n_azim, 8)
    vs = compute_view_state(jnp.asarray(queries)[None],
                            jnp.asarray(np.stack(cam_positions)),
                            n_elev, n_azim)
    vh = np.asarray(compute_view_harmonics(vs, base_h, h_polar, n_elev,
                                           n_azim))[0]

    cands = cameras_on_sphere(n_candidates, 0.7 * diag, center, rng)
    # GT coverage: fraction of GT surface visible (unoccluded) from each
    # candidate — one batched ray cast over all candidates.
    from ..eval.object_nbv import visible_mask_batched

    gt_pts = assets.gt_surface[rng.permutation(len(assets.gt_surface))[:512]]
    gt_cov = list(np.asarray(
        visible_mask_batched(gt_pts, cands, soa, n_tris)).mean(axis=1))

    norm = lambda q: (q - center) / diag
    return PretrainSample(
        partial_pc=norm(partial).astype(np.float32),
        query_x=norm(queries).astype(np.float32),
        query_occ=occ,
        view_harmonics=vh.astype(np.float32),
        candidate_cams=norm(cands).astype(np.float32),
        gt_coverage=np.asarray(gt_cov, np.float32),
    )


def _stack_samples(samples: List[PretrainSample]):
    """Stage the whole pretraining set on device ONCE (leading sample axis).

    The per-step batch is then gathered inside the jitted step — no
    per-step host->device re-upload (the axon tunnel charges ~33 ms per
    dispatch; shipping the arrays every step doubles it)."""
    return tuple(
        jnp.asarray(np.stack([getattr(s, f) for s in samples]))
        for f in ("partial_pc", "query_x", "view_harmonics", "query_occ",
                  "candidate_cams", "gt_coverage"))


def pretrain_scone_occ(n_steps: int = 100, lr: float = 1e-4, seed: int = 0,
                       samples: Optional[List[PretrainSample]] = None,
                       batch: int = 4, verbose: bool = True):
    """Supervised occupancy pretraining loop (pretrain_scone_occ.py:133-247).

    Batched like the reference's dataloader (pretrain_scone_occ.py:170
    iterates batches, not single meshes): each step draws ``batch`` samples
    uniformly from the device-staged set. Returns (model, variables,
    losses)."""
    samples = samples or [make_pretrain_sample(seed + i) for i in range(4)]
    batch = max(1, min(batch, len(samples)))
    model = SconeOcc(seq_len=min(2048, samples[0].partial_pc.shape[0]))
    key = jax.random.PRNGKey(seed)
    s0 = samples[0]
    variables = model.init(key, jnp.asarray(s0.partial_pc)[None],
                           jnp.asarray(s0.query_x)[None],
                           jnp.asarray(s0.view_harmonics)[None], key=key)
    tx = optax.adam(lr)
    opt_state = tx.init(variables)
    pc_a, x_a, vh_a, occ_a, _, _ = _stack_samples(samples)

    @jax.jit
    def step(variables, opt_state, pc_a, x_a, vh_a, occ_a, key):
        k_idx, k_drop = jax.random.split(key)
        idx = jax.random.randint(k_idx, (batch,), 0, pc_a.shape[0])

        def loss_fn(v):
            pred = model.apply(v, pc_a[idx], x_a[idx], vh_a[idx],
                               key=k_drop)
            return jnp.mean((pred - occ_a[idx]) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(variables)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(variables, updates), opt_state, loss

    losses = []
    for i in range(n_steps):
        key, sub = jax.random.split(key)
        variables, opt_state, loss = step(variables, opt_state, pc_a, x_a,
                                          vh_a, occ_a, sub)
        losses.append(float(loss))
        if verbose and i % 10 == 0:
            print(f"occ step {i}: mse {losses[-1]:.4f}", flush=True)
    return model, variables, losses


def pretrain_scone_vis(n_steps: int = 100, lr: float = 1e-4, seed: int = 0,
                       cov_loss: str = "uncentered_l1",
                       samples: Optional[List[PretrainSample]] = None,
                       batch: int = 4, verbose: bool = True):
    """Visibility-gain pretraining loop (pretrain_scone_vis.py:196-347).

    Batched + device-staged like pretrain_scone_occ."""
    samples = samples or [make_pretrain_sample(seed + i) for i in range(4)]
    batch = max(1, min(batch, len(samples)))
    model = SconeVis()
    loss_fn_cov = COV_LOSSES[cov_loss]
    key = jax.random.PRNGKey(seed)
    s0 = samples[0]
    pts0 = jnp.concatenate(
        [jnp.asarray(s0.query_x), jnp.asarray(s0.query_occ)], axis=-1
    )[None]
    variables = model.init(key, pts0,
                           view_harmonics=jnp.asarray(s0.view_harmonics)[None])
    tx = optax.adam(lr)
    opt_state = tx.init(variables)
    _, x_a, vh_a, occ_a, cams_a, cov_a = _stack_samples(samples)

    @jax.jit
    def step(variables, opt_state, x_a, vh_a, occ_a, cams_a, cov_a, key):
        idx = jax.random.randint(key, (batch,), 0, x_a.shape[0])
        pts = jnp.concatenate([x_a[idx], occ_a[idx]], axis=-1)

        def loss_fn(v):
            h = model.apply(v, pts, view_harmonics=vh_a[idx])
            pred = coverage_gain(pts[..., :3], h, cams_a[idx])
            return loss_fn_cov(pred[..., None], cov_a[idx][..., None])

        loss, grads = jax.value_and_grad(loss_fn)(variables)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(variables, updates), opt_state, loss

    losses = []
    for i in range(n_steps):
        key, sub = jax.random.split(key)
        variables, opt_state, loss = step(variables, opt_state, x_a, vh_a,
                                          occ_a, cams_a, cov_a, sub)
        losses.append(float(loss))
        if verbose and i % 10 == 0:
            print(f"vis step {i}: {cov_loss} {losses[-1]:.4f}", flush=True)
    return model, variables, losses


# ---------------------------------------------------------------------------
# Interior-domain pretraining samples (VERDICT r4 missing #2): the object
# sampler above mirrors the reference's ShapeNet setup (sphere-viewed
# convex-ish solids), but MACARONS deploys into enclosed scene interiors
# (macarons/testers/scene.py:631-663) — the round-4 oracle probe localized
# the learned-NBV shortfall to exactly that domain transfer (gain model
# pretrained on blobs, deployed into rooms; data/nbv_oracle.json). These
# samples are built FROM procgen scene interiors with rollout-like capture:
# a short lattice walklet of interior cameras, sight-carved occupancy
# labels (occupied == not visible from any walklet camera — the geometric
# truth the online carving supervision converges to), and candidate
# cameras at interior positions with fov-restricted coverage labels.
# Normalization mirrors deployment (sim/coverage_gain.predict_coverage_gain
# :81-86): token-bbox center, scene-bbox diagonal scale.
# ---------------------------------------------------------------------------

_SCENE_CACHE: dict = {}

_INTERIOR_DIFFS = ("simple", "normal", "hard", "insane")


def _interior_scene(seed: int):
    """Packed procgen scene + SoA for interior samples (cached: scene
    packing renders and samples GT surfaces, so several walklet samples
    share one scene)."""
    if seed in _SCENE_CACHE:
        return _SCENE_CACHE[seed]
    from ..assets import generate_scene, pack_generated_scene
    from ..config import default_params

    diff = _INTERIOR_DIFFS[seed % len(_INTERIOR_DIFFS)]
    p = default_params(n_gt_surface_points=4096)
    assets = pack_generated_scene(generate_scene(diff, seed=1000 + seed),
                                  params=p)
    soa = tris_to_soa(jnp.asarray(assets.tris))
    _SCENE_CACHE[seed] = (assets, soa)
    return _SCENE_CACHE[seed]


def make_interior_sample(seed: int, n_partial: int = 1024, n_query: int = 512,
                         n_candidates: int = 16, n_views: int = 4,
                         n_elev: int = 7, n_azim: int = 14,
                         scenes: int = 8,
                         intr: Optional[CameraIntrinsics] = None
                         ) -> PretrainSample:
    """One supervised sample from a procgen scene INTERIOR.

    Walklet capture: starting from the scene's start pose, take n_views - 1
    random unit lattice moves (segment-vs-mesh validated, like rollout
    moves) with random azimuths, rendering + backprojecting a partial cloud
    at each pose. Occupancy GT: sight carving — a query point is free iff
    the open segment from SOME walklet camera reaches it; enclosed unseen
    space and wall solids are occupied (the fixpoint of the online carving
    supervision, macarons_utils.py:3338-3363). Coverage GT per candidate:
    fraction of the scene GT surface sample that is unoccluded AND inside
    the candidate's fov frustum (deployment gains are fov-filtered,
    sim/coverage_gain.py:71-88).
    """
    from ..ops.raytrace import ray_hits, segments_hit_mesh
    from ..planning.grid_paths import DIRS, lattice_positions

    rng = np.random.default_rng(seed)
    assets, soa = _interior_scene(seed % scenes)
    n_tris = assets.n_tris
    intr = intr or CameraIntrinsics(image_height=64, image_width=114)
    L, H = assets.pose_l, assets.pose_h
    positions = np.asarray(lattice_positions(
        jnp.asarray(assets.pose_origin), L, H))
    elev2 = float(assets.elevations_deg[2])

    # Random lattice walklet, segment-validated moves.
    start = assets.start_cam_idx
    cur = np.asarray([int(start[0]), int(start[2])])
    cells = [tuple(cur)]
    for _ in range(n_views - 1):
        order = rng.permutation(len(DIRS))
        for d in order:
            dl, dh = DIRS[d]
            nl, nh = cur[0] + dl, cur[1] + dh
            if not (0 <= nl < L and 0 <= nh < H):
                continue
            a = positions[cur[0], cur[1]]
            b = positions[nl, nh]
            hit = bool(np.asarray(segments_hit_mesh(
                jnp.asarray(a[None], jnp.float32),
                jnp.asarray(b[None], jnp.float32), soa, n_tris))[0])
            if not hit:
                cur = np.asarray([nl, nh])
                break
        cells.append(tuple(cur))

    key = jax.random.PRNGKey(seed)
    cam_positions = []
    parts = []
    for (il, ih) in cells:
        pos = positions[il, ih]
        azim = float(rng.integers(0, 8) * 45.0)
        pose5 = jnp.asarray([pos[0], pos[1], pos[2], elev2, azim],
                            jnp.float32)
        zbuf, R, T = capture_depth(soa, n_tris, pose5, intr)
        key, sub = jax.random.split(key)
        batch = backproject_sample(zbuf, R, T, intr, sub, n_partial,
                                   gathering_factor=0.2, sensor_range=70.0)
        pts = np.asarray(batch.points)[np.asarray(batch.valid)]
        parts.append(pts)
        cam_positions.append(pos.astype(np.float32))
    cams_np = np.stack(cam_positions)

    partial = np.concatenate(parts, axis=0) if parts else np.zeros((0, 3))
    if len(partial) >= n_partial:
        partial = partial[rng.permutation(len(partial))[:n_partial]]
    else:
        pad = rng.integers(0, max(len(partial), 1), n_partial - len(partial))
        partial = np.concatenate([partial, partial[pad]]) if len(partial) else (
            np.zeros((n_partial, 3), np.float32))

    # Queries: a local box around the walklet (the deployment's tokens are
    # fov-filtered proxies near the camera), clipped to the scene bbox.
    scene_lo = assets.tris[: n_tris].reshape(-1, 3).min(axis=0)
    scene_hi = assets.tris[: n_tris].reshape(-1, 3).max(axis=0)
    scene_diag = float(np.linalg.norm(scene_hi - scene_lo))
    wl_center = cams_np.mean(axis=0)
    half = 0.25 * (scene_hi - scene_lo)
    q_lo = np.maximum(wl_center - half, scene_lo)
    q_hi = np.minimum(wl_center + half, scene_hi)
    queries = rng.uniform(q_lo, q_hi, size=(n_query, 3)).astype(np.float32)

    # Sight-carved occupancy: free iff visible from some walklet camera.
    C = len(cams_np)
    origins = np.repeat(cams_np, n_query, axis=0)
    dirs = np.tile(queries, (C, 1)) - origins
    t, _ = ray_hits(jnp.asarray(origins), jnp.asarray(dirs), soa, n_tris,
                    t_min=1e-4, t_max=0.999)
    seen = (np.asarray(t) >= 0.999).reshape(C, n_query).any(axis=0)
    occ = (~seen).astype(np.float32)[:, None]

    # View harmonics at the queries from the walklet cameras.
    base_h, h_polar = base_view_harmonics(n_elev, n_azim, 8)
    vs = compute_view_state(jnp.asarray(queries)[None],
                            jnp.asarray(cams_np), n_elev, n_azim)
    vh = np.asarray(compute_view_harmonics(vs, base_h, h_polar, n_elev,
                                           n_azim))[0]

    # Candidates: interior lattice poses near the walklet with random
    # azimuths; coverage = fov-restricted unoccluded GT-surface fraction.
    d2 = np.linalg.norm(
        positions.reshape(-1, 3) - wl_center[None], axis=-1)
    near = np.nonzero(d2 <= 0.35 * scene_diag)[0]
    inside = np.asarray(points_inside_mesh(
        jnp.asarray(positions.reshape(-1, 3)[near], jnp.float32), soa,
        n_tris))
    near = near[inside]
    if len(near) == 0:
        near = np.asarray([int(np.argmin(d2))])
    pick = near[rng.integers(0, len(near), n_candidates)]
    cand_pos = positions.reshape(-1, 3)[pick].astype(np.float32)
    cand_azim = rng.integers(0, 8, n_candidates) * 45.0

    gt_pts = assets.gt_surface[
        rng.permutation(len(assets.gt_surface))[:512]].astype(np.float32)
    gt_cov = visible_fov_fraction(gt_pts, cand_pos, cand_azim, elev2, soa,
                                  n_tris, intr)

    norm = lambda q: (q - wl_center) / scene_diag
    return PretrainSample(
        partial_pc=norm(partial).astype(np.float32),
        query_x=norm(queries).astype(np.float32),
        query_occ=occ,
        view_harmonics=vh.astype(np.float32),
        candidate_cams=norm(cand_pos).astype(np.float32),
        gt_coverage=np.asarray(gt_cov, np.float32),
    )


def visible_fov_fraction(gt_pts: np.ndarray, cand_pos: np.ndarray,
                         cand_azim: np.ndarray, elev_deg: float, soa,
                         n_tris, intr: CameraIntrinsics) -> List[float]:
    """Per-candidate fraction of gt_pts unoccluded AND inside the fov."""
    from ..geometry.cameras import get_camera_RT, points_in_fov_mask
    from ..ops.raytrace import ray_hits

    C, N = len(cand_pos), len(gt_pts)
    origins = np.repeat(cand_pos, N, axis=0)
    dirs = np.tile(gt_pts, (C, 1)) - origins
    t, _ = ray_hits(jnp.asarray(origins), jnp.asarray(dirs), soa, n_tris,
                    t_min=1e-4, t_max=0.999)
    unoccl = (np.asarray(t) >= 0.999).reshape(C, N)
    fracs = []
    for c in range(C):
        pose5 = jnp.asarray([cand_pos[c, 0], cand_pos[c, 1], cand_pos[c, 2],
                             elev_deg, float(cand_azim[c])], jnp.float32)
        R, T = get_camera_RT(pose5[None, :3], pose5[None, 3:])
        fov = np.asarray(points_in_fov_mask(jnp.asarray(gt_pts), R[0], T[0],
                                            intr, fov_range=70.0))
        fracs.append(float((unoccl[c] & fov).mean()))
    return fracs
