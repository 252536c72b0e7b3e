#!/usr/bin/env python
"""Offline depth-network pretraining CLI (the ImageNet-warm-start substitute).

The reference initializes ManyDepth from a pretrained pickle
(macarons/networks/Macarons.py:15,234) that cannot exist in this offline
image; this trains the same network supervised against rendered zbuf over
many procgen scenes (train/pretrain_depth.py) and saves depth_vars
checkpoints consumable by train_macarons.py --depth-ckpt and
tools/depth_quality_probe.py --depth-ckpt.

Usage:
  python pretrain_depth.py --steps 3000 --procgen simple:4,normal:2,hard:2
  python pretrain_depth.py --tiny --steps 5     (CPU smoke)
"""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--procgen", default="simple:4,normal:2,hard:2",
                    help="training scenes: difficulty[:count] comma list")
    ap.add_argument("--eval-difficulty", default="simple")
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--seed", type=int, default=8)
    ap.add_argument("--out", default="weights/depth_pre")
    ap.add_argument("--eval-every", type=int, default=100)
    ap.add_argument("--resume", default=None,
                    help="warm-start depth variables from this checkpoint")
    ap.add_argument("--max-wall", type=float, default=None)
    ap.add_argument("--tiny", action="store_true",
                    help="64x114 frames (CPU smoke)")
    args = ap.parse_args()

    from nextbestpath_tpu.utils.jaxcache import enable_cache

    enable_cache()

    from nextbestpath_tpu.assets import generate_scene, pack_generated_scene
    from nextbestpath_tpu.config import default_params
    from nextbestpath_tpu.train.pretrain_depth import pretrain_depth
    from train_nbp import parse_procgen

    if args.tiny:
        h, w = 64, 114
        params = default_params(image_height=h, image_width=w,
                                points_per_frame=256,
                                full_pc_capacity=16384,
                                n_gt_surface_points=1024)
    else:
        h, w = 256, 456
        params = default_params()

    scenes = [
        pack_generated_scene(generate_scene(diff, seed=s), params=params)
        for diff, s in parse_procgen(args.procgen, args.seed)
    ]
    # Held-out eval scene: +700 offset, disjoint from training (base 8) and
    # from the NBP held-out recipe (+500).
    eval_scene = pack_generated_scene(
        generate_scene(args.eval_difficulty, seed=args.seed + 700),
        params=params)

    _, best = pretrain_depth(
        scenes, eval_scene, steps=args.steps, batch=args.batch, lr=args.lr,
        seed=args.seed, out_dir=args.out, eval_every=args.eval_every,
        image_height=h, image_width=w, params=params, resume=args.resume,
        max_wall_s=args.max_wall,
    )
    print(f"done; best held-out mean|depth-zbuf| = {best:.4f} "
          f"(weights in {args.out})")


if __name__ == "__main__":
    main()
