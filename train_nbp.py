#!/usr/bin/env python
"""NBP training CLI (analog of the reference's train_nbp.py).

Usage: python train_nbp.py -c <config.json> [--procgen simple,normal]
       python train_nbp.py --procgen simple --epochs 2 --poses 10  (smoke)
"""

import argparse
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", default=None,
                    help="JSON config (reference schema, flattened sections)")
    ap.add_argument("--procgen", default=None,
                    help="comma-separated procgen difficulties to train on "
                         "(used when no scene dataset is available)")
    ap.add_argument("--scene-dirs", default=None,
                    help="comma-separated reference-format scene directories")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--poses", type=int, default=None)
    ap.add_argument("--seed", type=int, default=8)
    ap.add_argument("--db", default="nbp_data/replay.npz")
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(os.path.dirname(__file__), ".jax_cache"))

    from nextbestpath_tpu.config import default_params, load_params
    from nextbestpath_tpu.assets import (generate_scene, load_scene_dir,
                                         pack_generated_scene)
    from nextbestpath_tpu.train.driver import run_training_nbp

    params = load_params(args.config) if args.config else default_params()
    for k in ("pc2img_size", "prediction_range", "value_map_size", "n_pieces",
              "full_pc_capacity", "points_per_frame", "max_path_len",
              "fov_degrees", "camera_znear"):
        if k not in params:
            params.update(**{k: default_params().get(k)})

    scenes = []
    if args.scene_dirs:
        for d in args.scene_dirs.split(","):
            scenes.append(load_scene_dir(d, params=params))
    elif args.procgen:
        for i, diff in enumerate(args.procgen.split(",")):
            scenes.append(pack_generated_scene(
                generate_scene(diff.strip(), seed=args.seed + i), params=params))
    else:
        raise SystemExit("provide --scene-dirs or --procgen")

    epochs = args.epochs if args.epochs is not None else int(params.get("epochs", 100))
    poses = args.poses if args.poses is not None else int(
        params.get("n_poses_in_trajectory", 100))
    run_training_nbp(scenes, params=params, epochs=epochs, n_poses=poses,
                     db_path=args.db, seed=args.seed)


if __name__ == "__main__":
    main()
