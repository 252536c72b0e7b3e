#!/usr/bin/env python
"""MACARONS online training CLI (analog of the reference's
macarons/trainers/train_macarons.py driver).

Usage: python train_macarons.py --procgen simple --poses 20
"""

import argparse
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--procgen", default="simple")
    ap.add_argument("--scene-dirs", default=None)
    ap.add_argument("--poses", type=int, default=100)
    ap.add_argument("--seed", type=int, default=8)
    ap.add_argument("--out", default="weights/macarons")
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(os.path.dirname(__file__), ".jax_cache"))

    import jax

    from nextbestpath_tpu.assets import (generate_scene, load_scene_dir,
                                         pack_generated_scene)
    from nextbestpath_tpu.config import default_params
    from nextbestpath_tpu.train.train_macarons import (
        MacaronsTrainState, train_macarons_online)
    from nextbestpath_tpu.utils.checkpoint import save_checkpoint

    params = default_params()
    if args.scene_dirs:
        scenes = [load_scene_dir(d, params=params)
                  for d in args.scene_dirs.split(",")]
    else:
        scenes = [pack_generated_scene(generate_scene(d.strip(),
                                                      seed=args.seed + i),
                                       params=params)
                  for i, d in enumerate(args.procgen.split(","))]

    state = MacaronsTrainState.create(jax.random.PRNGKey(args.seed),
                                      params=params)
    for assets in scenes:
        logs = train_macarons_online(assets, state, params=params,
                                     n_poses=args.poses, seed=args.seed)
        print(f"{assets.name}: final coverage {logs['coverage'][-1]:.4f} "
              f"occ loss {logs['occ_loss'][-1]:.4f}")
    save_checkpoint(os.path.join(args.out, "scone_occ.ckpt"),
                    state.model.occ_vars)
    save_checkpoint(os.path.join(args.out, "scone_vis.ckpt"),
                    state.model.vis_vars)


if __name__ == "__main__":
    main()
