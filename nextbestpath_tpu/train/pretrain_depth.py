"""Offline depth-network pretraining: the warm-start substitute.

The reference warm-starts ManyDepth from a pickled pretrained depth model
built on an ImageNet ResNet (macarons/networks/Macarons.py:15,234 loads
``pretrained_depth.pth``); its predicted-depth mapping mode depends on that
initialization and the file cannot exist in this offline image. This module
is the substitute pipeline: supervised disparity distillation against
rendered zbuf across many procedural scenes and poses — the cheapest path
that gives the online photometric loop (train_macarons.make_depth_steps) a
geometry-aware initialization.

Faithfulness notes:
* The training frames are generated EXACTLY like the deployed inference
  chain consumes them: a 3-pose random walklet (consecutive lattice moves
  with small azimuth turns), target = the latest pose's frame, contexts =
  the two PREVIOUS POSES' frames — train_macarons keeps one frame per
  pose in frame_hist (train_macarons.py:493) and feeds depth_infer
  x_alpha = [-1, -2] full-move baselines. (An earlier variant trained on
  quarter-move interpolation substeps; the 4x-shorter context baseline is
  a cost-volume domain shift that cost ~5x online depth error despite a
  strong pretrain-eval number.)
* Supervision is dense L1 on the 4 disparity scales vs
  depth_to_disparity(zbuf), background rays treated as d_max. This is the
  offline stand-in for ImageNet pretraining, not a reference behavior —
  the online self-supervised loss stays the reference's photometric one.
"""

from __future__ import annotations

import json
import os
import time
from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..assets.scene_assets import SceneAssets
from ..config import Params, default_params
from ..geometry.cameras import CameraIntrinsics
from ..models.manydepth import (
    D_MAX,
    D_MIN,
    ManyDepth,
    depth_to_disparity,
    disparity_to_depth,
)
from ..ops.raytrace import tris_to_soa
from ..sim.sensor import capture_rgbd
from ..sim.tables import build_scene_tables
from ..utils.checkpoint import load_checkpoint, save_checkpoint

_DIRS = jnp.asarray([[1, 0], [-1, 0], [0, 1], [0, -1]], jnp.int32)


class DepthScene(NamedTuple):
    """Per-scene device constants for sampling + rendering (runtime args of
    the jitted batch builder, so same-shape scenes share one program)."""

    tri_soa: jnp.ndarray        # (9, F)
    n_tris: jnp.ndarray         # scalar int32
    positions: jnp.ndarray      # (L, H, 3)
    inside: jnp.ndarray         # (L, H) bool
    edge_blocked: jnp.ndarray   # (4, L, H) bool
    azims: jnp.ndarray          # (A,)
    elev: jnp.ndarray           # scalar


def depth_scene_from_assets(assets: SceneAssets,
                            interpret: Optional[bool] = None) -> DepthScene:
    tri_soa = tris_to_soa(jnp.asarray(assets.tris))
    n_tris = jnp.asarray(assets.n_tris, jnp.int32)
    tables = build_scene_tables(tri_soa, n_tris,
                                jnp.asarray(assets.pose_origin),
                                assets.pose_l, assets.pose_h,
                                interpret=interpret)
    return DepthScene(
        tri_soa=tri_soa, n_tris=n_tris, positions=tables.positions,
        inside=tables.inside, edge_blocked=tables.gt_edge_blocked,
        azims=jnp.asarray(assets.azimuths_deg),
        elev=jnp.asarray(float(assets.elevations_deg[2]), jnp.float32),
    )


def _sample_walk(scene: DepthScene, key: jax.Array, n_azim: int,
                 n_poses: int = 3):
    """A short random lattice walk: (n_poses, 5) consecutive rollout poses.

    Start uniform over inside cells; each step takes a uniform unblocked
    direction (stays in place when fully walled) plus a small azimuth turn
    da in [-2, 2] — the pose statistics of consecutive frame_hist entries
    in the online loop (train_macarons.py:487-495)."""
    k_cell, k_a0, key = jax.random.split(key, 3)
    L, H = scene.inside.shape
    logits = jnp.where(scene.inside.reshape(-1), 0.0, -jnp.inf)
    flat = jax.random.categorical(k_cell, logits)
    c = jnp.stack([flat // H, flat % H])
    a = jax.random.randint(k_a0, (), 0, n_azim)

    def pose5(c, a):
        pos = scene.positions[c[0], c[1]]
        return jnp.asarray([pos[0], pos[1], pos[2], 0.0, 0.0],
                           jnp.float32).at[3].set(scene.elev).at[4].set(
                               scene.azims[a])

    poses = [pose5(c, a)]
    for _ in range(n_poses - 1):
        k_dir, k_da, key = jax.random.split(key, 3)
        blocked = scene.edge_blocked[:, c[0], c[1]]  # (4,)
        dir_logits = jnp.where(blocked, -jnp.inf, 0.0)
        any_open = jnp.any(~blocked)
        d = jax.random.categorical(k_dir,
                                   jnp.where(any_open, dir_logits, 0.0))
        c = jnp.where(any_open, c + _DIRS[d], c)
        c = jnp.clip(c, 0, jnp.asarray([L - 1, H - 1]))
        da = jax.random.randint(k_da, (), -2, 3)
        a = jnp.mod(a + da, n_azim)
        poses.append(pose5(c, a))
    return poses


def make_batch_fn(intr: CameraIntrinsics, n_azim: int, batch: int,
                  n_steps: int = 4, interpret: Optional[bool] = None):
    """Jitted batch builder: (scene, key) -> supervised ManyDepth batch.

    Per sample: frames at three CONSECUTIVE ROLLOUT POSES of a random
    walklet; target is the latest pose, contexts are the two poses behind
    it — exactly the frame_hist layout depth_infer consumes online
    (train_macarons.py:526-530). n_steps is kept for signature
    compatibility (the walk moves one full lattice step per frame)."""
    del n_steps

    @jax.jit
    def make_batch(scene: DepthScene, key: jax.Array):
        tgts, Rs, Ts, xas, Ras, Tas, zbufs = [], [], [], [], [], [], []
        for b in range(batch):
            kb = jax.random.fold_in(key, b)
            frames = []
            for pose in _sample_walk(scene, kb, n_azim, n_poses=3):
                rgb, zbuf, R, T = capture_rgbd(scene.tri_soa, scene.n_tris,
                                               pose, intr)
                frames.append((rgb, zbuf, R, T))
            (r0, _, R0, T0), (r1, _, R1, T1), (r2, z2, R2, T2) = frames
            tgts.append(r2)
            Rs.append(R2)
            Ts.append(T2)
            xas.append(jnp.stack([r1, r0]))
            Ras.append(jnp.stack([R1, R0]))
            Tas.append(jnp.stack([T1, T0]))
            zbufs.append(z2)
        return (jnp.stack(tgts), jnp.stack(Rs), jnp.stack(Ts),
                jnp.stack(xas), jnp.stack(Ras), jnp.stack(Tas),
                jnp.stack(zbufs))

    return make_batch


_SCALE_WEIGHTS = (1.0, 0.5, 0.25, 0.125)


def supervised_disparity_loss(disps, zbuf):
    """Multi-scale L1 against depth_to_disparity(zbuf); background (-1)
    rays supervise toward d_max (disparity 0), which is what a miss means
    physically (beyond zfar)."""
    gt_depth = jnp.where(zbuf > 0, zbuf, D_MAX)
    gt_disp = depth_to_disparity(jnp.clip(gt_depth, D_MIN, D_MAX))[..., None]
    loss = 0.0
    for w, d in zip(_SCALE_WEIGHTS, disps):
        gt_s = jax.image.resize(gt_disp, d.shape, method="linear")
        loss = loss + w * jnp.mean(jnp.abs(d - gt_s))
    return loss


def make_train_step(model: ManyDepth, tx):
    @jax.jit
    def step(variables, opt_state, tgt, R, T, xa, Ra, Ta, zbuf):
        def loss_fn(params):
            disps, mut = model.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                tgt, R, T, xa, Ra, Ta, train=True,
                mutable=["batch_stats"])
            return supervised_disparity_loss(disps, zbuf), mut

        (loss, mut), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"])
        updates, opt_state = tx.update(grads, opt_state,
                                       variables["params"])
        params = optax.apply_updates(variables["params"], updates)
        return ({"params": params, "batch_stats": mut["batch_stats"]},
                opt_state, loss)

    return step


def make_eval_fn(model: ManyDepth):
    @jax.jit
    def evaluate(variables, tgt, R, T, xa, Ra, Ta, zbuf):
        disp1, *_ = model.apply(variables, tgt, R, T, xa, Ra, Ta,
                                train=False)
        depth = disparity_to_depth(disp1[..., 0])
        valid = zbuf > 0
        err = jnp.sum(jnp.abs(depth - zbuf) * valid) / jnp.maximum(
            jnp.sum(valid), 1)
        return err

    return evaluate


def pretrain_depth(
    scenes: Sequence[SceneAssets],
    eval_scene: SceneAssets,
    steps: int = 2000,
    batch: int = 2,
    lr: float = 1e-4,
    seed: int = 8,
    out_dir: str = "weights/depth_pre",
    log_dir: str = "training_log",
    eval_every: int = 100,
    image_height: int = 256,
    image_width: int = 456,
    params: Optional[Params] = None,
    resume: Optional[str] = None,
    max_wall_s: Optional[float] = None,
    interpret: Optional[bool] = None,
    verbose: bool = True,
):
    """Supervised depth pretraining over procgen scenes.

    Saves ``depth_pre_best.ckpt`` (lowest held-out mean |depth - zbuf|) and
    ``depth_pre_latest.ckpt``; both are depth_vars checkpoints loadable by
    train_macarons.py --depth-ckpt. Returns (variables, best_err)."""
    p = params or default_params()
    intr = CameraIntrinsics(image_height=image_height,
                            image_width=image_width,
                            fov_degrees=float(p.fov_degrees),
                            znear=float(p.camera_znear), zfar=float(p.zfar))
    model = ManyDepth(intr=intr)
    key = jax.random.PRNGKey(seed)
    H, W = image_height, image_width
    variables = jax.jit(lambda k: model.init(
        k, jnp.zeros((batch, H, W, 3)), jnp.zeros((batch, 3, 3)),
        jnp.zeros((batch, 3)), jnp.zeros((batch, 2, H, W, 3)),
        jnp.zeros((batch, 2, 3, 3)), jnp.zeros((batch, 2, 3)),
        train=False))(key)
    if resume and os.path.exists(resume):
        variables, _, _, _ = load_checkpoint(resume, variables)
        if verbose:
            print(f"resumed depth variables from {resume}")
    tx = optax.adam(lr)
    opt_state = tx.init(variables["params"])

    n_azim = scenes[0].n_azim
    d_scenes = [depth_scene_from_assets(a, interpret=interpret)
                for a in scenes]
    make_batch = make_batch_fn(intr, n_azim, batch, interpret=interpret)
    train_step = make_train_step(model, tx)
    evaluate = make_eval_fn(model)

    # Fixed held-out eval batch (seeds disjoint from the training stream).
    ev_scene = depth_scene_from_assets(eval_scene, interpret=interpret)
    ev_batch = make_batch(ev_scene, jax.random.PRNGKey(seed + 99991))

    best_err = float("inf")
    log = {"loss": [], "eval_err": []}
    os.makedirs(out_dir, exist_ok=True)
    os.makedirs(log_dir, exist_ok=True)
    t0 = time.time()
    for step_i in range(steps):
        k = jax.random.fold_in(key, step_i + 1)
        scene = d_scenes[step_i % len(d_scenes)]
        b = make_batch(scene, k)
        variables, opt_state, loss = train_step(variables, opt_state, *b)
        log["loss"].append(float(loss))
        if verbose and (step_i < 3 or step_i % 50 == 0):
            print(f"step {step_i}: loss {float(loss):.5f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
        if (step_i + 1) % eval_every == 0 or step_i == steps - 1:
            err = float(evaluate(variables, *ev_batch))
            log["eval_err"].append({"step": step_i + 1, "err": err})
            if verbose:
                print(f"  eval mean|depth-zbuf| = {err:.4f} "
                      f"(best {best_err:.4f})", flush=True)
            if err < best_err:
                best_err = err
                save_checkpoint(os.path.join(out_dir, "depth_pre_best.ckpt"),
                                variables, epoch=step_i + 1,
                                extra={"eval_err": err})
            save_checkpoint(os.path.join(out_dir, "depth_pre_latest.ckpt"),
                            variables, epoch=step_i + 1,
                            extra={"eval_err": err})
            with open(os.path.join(log_dir, "depth_pre_loss.json"),
                      "w") as f:
                json.dump(log, f)
        if max_wall_s is not None and time.time() - t0 > max_wall_s:
            if verbose:
                print(f"wall budget reached at step {step_i}", flush=True)
            break
    return variables, best_err
