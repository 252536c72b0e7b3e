#!/usr/bin/env python
"""ManyDepth convergence evidence: many gradient steps on one frame window.

The online probe (tools/depth_quality_probe.py) trains the depth model for
only ~56 steps — one per pose, the reference's online cadence
(macarons/trainers/train_macarons.py:389-403) — which from a random init
(no ImageNet warm start available offline, Macarons.py:15,234) barely
moves the depth error. This probe answers the complementary question "CAN
the pipeline learn depth at all?" the way the reference's depth module is
actually expected to converge: hundreds of optimizer steps over a short
captured window (the memory-replay regime, macarons_utils.py:1007-1086).

Protocol: capture M consecutive RGB-D frames along an unobstructed
straight lattice walk (bouncing at walls), then run K depth_step updates
on random frame triplets (target t, alphas [t-1, t-2, t+1] — the
reference's alphas, create_batch_for_depth_model). Every eval_every
steps, run depth_infer on a HELD-OUT frame of the window and log mean
|predicted - zbuf| over pixels valid in both maps.

Run on the TPU (ambient env):  python tools/depth_convergence_probe.py
CPU smoke:  JAX_PLATFORMS=cpu python tools/depth_convergence_probe.py \
    --tiny --steps 40 --eval-every 10
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nextbestpath_tpu.utils.jaxcache import enable_cache  # noqa: E402

enable_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--eval-every", type=int, default=25)
    ap.add_argument("--difficulty", default="simple")
    ap.add_argument("--seed", type=int, default=8)
    ap.add_argument("--tiny", action="store_true",
                    help="32x56 frames (CPU smoke)")
    ap.add_argument("--object", action="store_true",
                    help="orbit a procedural blob object instead of walking "
                    "a scene: curved Lambert-shaded geometry gives the "
                    "photometric loss real texture to match, isolating "
                    "'can the pipeline learn depth' from the flat-gray "
                    "scene shading (the reference's AiMDoom texture is "
                    "flat gray too, load_scene_with_texture)")
    ap.add_argument("--out", default="data/depth_convergence.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from nextbestpath_tpu.assets import generate_scene, pack_generated_scene
    from nextbestpath_tpu.config import default_params
    from nextbestpath_tpu.geometry.cameras import CameraIntrinsics
    from nextbestpath_tpu.ops.raytrace import segments_hit_mesh, tris_to_soa
    from nextbestpath_tpu.planning.grid_paths import DIRS, lattice_positions
    from nextbestpath_tpu.sim.sensor import capture_rgbd
    from nextbestpath_tpu.train.train_macarons import (
        MacaronsTrainState,
        make_depth_steps,
    )

    if args.tiny:
        params = default_params(image_height=32, image_width=56)
    else:
        params = default_params(image_height=256, image_width=456)
    intr = CameraIntrinsics(
        image_height=int(params.image_height),
        image_width=int(params.image_width),
        fov_degrees=float(params.fov_degrees),
        znear=float(params.camera_znear), zfar=float(params.zfar))
    ambient = float(params.get("ambient_light_intensity", 0.85))

    if args.object:
        from nextbestpath_tpu.assets.objects import generate_object

        obj = generate_object(args.seed)
        tri_soa = tris_to_soa(jnp.asarray(obj.tris))
        n_tris = jnp.asarray(obj.n_tris, jnp.int32)
        tri_colors = None
        # Orbit arc: small azimuth steps at fixed elevation, camera on a
        # sphere looking at the blob center — heavy frame overlap with
        # real parallax, curved shading for the photometric loss.
        radius, elev = 2.5, 20.0
        center = np.zeros(3, np.float32)
        poses = []
        for i in range(args.frames):
            azim = 8.0 * i
            e, a = np.deg2rad(elev), np.deg2rad(azim)
            pos = center + radius * np.asarray(
                [np.cos(e) * np.sin(a), np.sin(e), np.cos(e) * np.cos(a)],
                np.float32)
            poses.append(jnp.asarray(
                [*pos, -elev, (azim + 180.0) % 360.0], jnp.float32))
    else:
        assets = pack_generated_scene(
            generate_scene(args.difficulty, seed=args.seed), params=params)
        tri_soa = tris_to_soa(jnp.asarray(assets.tris))
        n_tris = jnp.asarray(assets.n_tris, jnp.int32)
        tri_colors = jnp.asarray(assets.tri_colors)
        positions = np.asarray(lattice_positions(
            jnp.asarray(assets.pose_origin), assets.pose_l, assets.pose_h))

        # Straight unobstructed walk from the canonical start cell, bouncing
        # at the first blocked edge; fixed azimuth so consecutive frames
        # share most of their frustum (translation per cell small vs depth).
        l, h = int(assets.start_cam_idx[0]), int(assets.start_cam_idx[2])
        rot = int(assets.start_cam_idx[4])
        best_dir, best_run = None, -1
        for (dl, dh) in DIRS:
            run, cl, ch = 0, l, h
            while run < args.frames:
                nl, nh = cl + dl, ch + dh
                if not (0 <= nl < assets.pose_l and 0 <= nh < assets.pose_h):
                    break
                hit = bool(np.asarray(segments_hit_mesh(
                    jnp.asarray(positions[cl, ch])[None],
                    jnp.asarray(positions[nl, nh])[None], tri_soa,
                    n_tris))[0])
                if hit:
                    break
                run, cl, ch = run + 1, nl, nh
            if run > best_run:
                best_dir, best_run = (dl, dh), run
        dl, dh = best_dir
        cells, cl, ch, step_sign = [(l, h)], l, h, 1
        for _ in range(args.frames - 1):
            nl, nh = cl + step_sign * dl, ch + step_sign * dh
            if (len(cells) - 1) % max(best_run, 1) == 0 and len(cells) > 1:
                step_sign = -step_sign  # bounce at the end of the clear run
                nl, nh = cl + step_sign * dl, ch + step_sign * dh
            cl, ch = nl, nh
            cells.append((cl, ch))
        print(f"# walk dir={best_dir} clear_run={best_run} cells={cells}",
              file=sys.stderr, flush=True)
        elev = float(assets.elevations_deg[2])
        azim = float(assets.azimuths_deg[rot])
        poses = [jnp.asarray([*positions[cl, ch], elev, azim], jnp.float32)
                 for (cl, ch) in cells]

    frames = []
    for pose in poses:
        rgb, zbuf, R, T = capture_rgbd(tri_soa, n_tris, pose, intr,
                                       tri_colors=tri_colors,
                                       ambient=ambient)
        frames.append((rgb, zbuf, R, T))

    state = MacaronsTrainState.create(jax.random.PRNGKey(args.seed),
                                      params=params)
    depth_step, depth_infer = make_depth_steps(
        state.model.depth, state.depth_tx, intr, params)
    dv, dopt = state.model.depth_vars, state.depth_opt_state

    M = len(frames)
    hold = M - 2  # held-out eval target (never a training target)

    def eval_err(dv):
        rgb, zbuf, R, T = frames[hold]
        x_a = jnp.stack([frames[hold - 1][0], frames[hold - 2][0]])
        R_a = jnp.stack([frames[hold - 1][2], frames[hold - 2][2]])
        T_a = jnp.stack([frames[hold - 1][3], frames[hold - 2][3]])
        pred = depth_infer(dv, rgb, R, T, x_a, R_a, T_a)
        valid = (pred > 0) & (zbuf > 0)
        return float(jnp.sum(jnp.abs(pred - zbuf) * valid)
                     / jnp.maximum(jnp.sum(valid), 1))

    rng = np.random.default_rng(args.seed)
    key = jax.random.PRNGKey(args.seed + 1)
    photo_curve, err_curve = [], [(0, eval_err(dv))]
    print(f"# step 0: heldout abs err {err_curve[0][1]:.4f}",
          file=sys.stderr, flush=True)
    for step in range(1, args.steps + 1):
        t = int(rng.integers(2, M - 2))
        if t == hold:
            t -= 1
        tgt = frames[t]
        x_a = jnp.stack([frames[t - 1][0], frames[t - 2][0],
                         frames[t + 1][0]])
        R_a = jnp.stack([frames[t - 1][2], frames[t - 2][2],
                         frames[t + 1][2]])
        T_a = jnp.stack([frames[t - 1][3], frames[t - 2][3],
                         frames[t + 1][3]])
        key, k = jax.random.split(key)
        dv, dopt, photo, _ = depth_step(dv, dopt, tgt[0], tgt[2], tgt[3],
                                        x_a, R_a, T_a, k)
        photo_curve.append(float(photo))
        if step % args.eval_every == 0:
            err_curve.append((step, eval_err(dv)))
            print(f"# step {step}: photo {photo_curve[-1]:.5f} "
                  f"heldout abs err {err_curve[-1][1]:.4f}",
                  file=sys.stderr, flush=True)

    k = max(3, len(photo_curve) // 10)
    summary = {
        "steps": args.steps, "frames": M,
        "mode": "object" if args.object else f"scene:{args.difficulty}",
        "photometric_first": round(sum(photo_curve[:k]) / k, 5),
        "photometric_last": round(sum(photo_curve[-k:]) / k, 5),
        "heldout_abs_err_first": round(err_curve[0][1], 4),
        "heldout_abs_err_last": round(err_curve[-1][1], 4),
        "heldout_abs_err_best": round(min(e for _, e in err_curve), 4),
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"summary": summary,
                   "photometric_curve": [round(x, 5) for x in photo_curve],
                   "heldout_abs_err": [[s, round(e, 4)]
                                       for s, e in err_curve]}, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
