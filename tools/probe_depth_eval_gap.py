#!/usr/bin/env python
"""Isolate why pretrain-eval depth error and online rollout error differ.

Evaluates a pretrained depth checkpoint on walklet batches of a chosen
scene, rendered with and without per-face colors, across several pose
draws. Round-4 findings recorded from this probe:

* Textures are a non-factor: procgen scenes carry a uniform GRAY face
  color, so textured and plain renders are IDENTICAL — and the reference
  does the same (load_scene_with_texture paints a constant red texture,
  /root/reference/macarons/utility/macarons_utils.py:544-548), so its RGB
  frames are shading-only as well. Its depth stack works because of the
  external pretrained_depth.pth (ImageNet/ShapeNet-scale pretraining),
  not because its frames are richer.
* The remaining pretrain-eval vs online gap is pose/scene variance: the
  same checkpoint scores 2.2-5.9 across random walklet draws on the
  pretraining eval scene and ~8.6 on a MACARONS rollout's visited-pose
  distribution.

Usage: python tools/probe_depth_eval_gap.py --ckpt weights/depth_pre/depth_pre_best.ckpt
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nextbestpath_tpu.utils.jaxcache import enable_cache  # noqa: E402

enable_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="weights/depth_pre/depth_pre_best.ckpt")
    ap.add_argument("--difficulty", default="simple")
    ap.add_argument("--seed", type=int, default=708)
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nextbestpath_tpu.assets import generate_scene, pack_generated_scene
    from nextbestpath_tpu.config import default_params
    from nextbestpath_tpu.geometry.cameras import CameraIntrinsics
    from nextbestpath_tpu.models.manydepth import ManyDepth
    from nextbestpath_tpu.sim.sensor import capture_rgbd
    from nextbestpath_tpu.train.pretrain_depth import (
        _sample_walk,
        depth_scene_from_assets,
        make_eval_fn,
    )
    from nextbestpath_tpu.utils.checkpoint import load_checkpoint

    p = default_params()
    assets = pack_generated_scene(
        generate_scene(args.difficulty, seed=args.seed), params=p)
    scene = depth_scene_from_assets(assets)
    intr = CameraIntrinsics(image_height=256, image_width=456,
                            fov_degrees=float(p.fov_degrees),
                            znear=float(p.camera_znear), zfar=float(p.zfar))
    model = ManyDepth(intr=intr)
    H, W, B = 256, 456, 2
    variables = jax.jit(lambda k: model.init(
        k, jnp.zeros((B, H, W, 3)), jnp.zeros((B, 3, 3)), jnp.zeros((B, 3)),
        jnp.zeros((B, 2, H, W, 3)), jnp.zeros((B, 2, 3, 3)),
        jnp.zeros((B, 2, 3)), train=False))(jax.random.PRNGKey(0))
    variables, _, step, extra = load_checkpoint(args.ckpt, variables)
    print(f"# loaded {args.ckpt} (step {step}, {extra})", flush=True)
    evaluate = make_eval_fn(model)
    tc = jnp.asarray(assets.tri_colors)

    def build(key, textured):
        tgts, Rs, Ts, xas, Ras, Tas, zbufs = [], [], [], [], [], [], []
        for b in range(B):
            kb = jax.random.fold_in(key, b)
            frames = []
            for pose in _sample_walk(scene, kb, assets.n_azim, n_poses=3):
                rgb, zbuf, R, T = capture_rgbd(
                    scene.tri_soa, scene.n_tris, pose, intr,
                    tri_colors=tc if textured else None)
                frames.append((rgb, zbuf, R, T))
            (r0, _, R0, T0), (r1, _, R1, T1), (r2, z2, R2, T2) = frames
            tgts.append(r2)
            Rs.append(R2)
            Ts.append(T2)
            xas.append(jnp.stack([r1, r0]))
            Ras.append(jnp.stack([R1, R0]))
            Tas.append(jnp.stack([T1, T0]))
            zbufs.append(z2)
        st = jnp.stack
        return (st(tgts), st(Rs), st(Ts), st(xas), st(Ras), st(Tas),
                st(zbufs))

    for trial in range(args.trials):
        key = jax.random.PRNGKey(1234 + trial)
        plain = build(key, False)
        tex = build(key, True)
        print(f"trial {trial}: plain err "
              f"{float(evaluate(variables, *plain)):.4f}  textured err "
              f"{float(evaluate(variables, *tex)):.4f}", flush=True)


if __name__ == "__main__":
    main()
