#!/usr/bin/env python
"""NBP training CLI (analog of the reference's train_nbp.py).

Usage: python train_nbp.py -c <config.json> [--procgen simple,normal]
       python train_nbp.py --procgen simple --epochs 2 --poses 10  (smoke)
       python train_nbp.py --scan --procgen simple:2,normal:2,hard:2,insane:2 \
           --eval-procgen simple,normal,hard,insane --epochs 30 --resume

--scan runs the fully-jitted scan-collection trainer
(train/driver.py:run_training_nbp_scan): one compiled rollout program for all
scenes, bf16 U-Net, full-state checkpoints, chunked resume.
"""

import argparse
import os


def parse_procgen(spec: str, seed_base: int):
    """"simple:2,normal" -> [(difficulty, seed), ...] (default count 1)."""
    out = []
    for i, tok in enumerate(spec.split(",")):
        tok = tok.strip()
        if not tok:
            continue
        if ":" in tok:
            diff, cnt = tok.split(":")
            cnt = int(cnt)
        else:
            diff, cnt = tok, 1
        for j in range(cnt):
            out.append((diff.strip(), seed_base + i * 37 + j))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", default=None,
                    help="JSON config (reference schema, flattened sections)")
    ap.add_argument("--procgen", default=None,
                    help="procgen training scenes: 'simple:2,hard:1' "
                         "(difficulty[:count] comma list)")
    ap.add_argument("--eval-procgen", default=None,
                    help="held-out procgen eval scenes, same syntax "
                         "(seeds disjoint from training)")
    ap.add_argument("--scene-dirs", default=None,
                    help="comma-separated reference-format scene directories")
    ap.add_argument("--mirror", action="store_true",
                    help="double the training set with x-mirrored variants "
                         "of every scene (the reference's mirror "
                         "augmentation, load_scene_with_texture(mirror=True))")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--poses", type=int, default=None)
    ap.add_argument("--seed", type=int, default=8)
    ap.add_argument("--db", default="nbp_data/replay.npz",
                    help="replay persistence path (host-loop trainer)")
    ap.add_argument("--scan", action="store_true",
                    help="use the fully-jitted scan-collection trainer")
    ap.add_argument("--db-dir", default="nbp_data/db",
                    help="replay shard directory (scan trainer)")
    ap.add_argument("--resume", action="store_true",
                    help="resume from the latest checkpoint + replay shards")
    ap.add_argument("--eval-every", type=int, default=3)
    ap.add_argument("--eval-poses", type=int, default=40)
    ap.add_argument("--max-wall", type=float, default=None,
                    help="stop after this many seconds (at an epoch "
                         "boundary); resume later with --resume")
    ap.add_argument("--init-weights", default=None,
                    help="warm-start variables from this checkpoint when "
                         "not resuming (fresh epoch 0, pretrained policy)")
    ap.add_argument("--tag", default="nbp",
                    help="model tag for checkpoint/log names (per-level "
                         "fine-tunes: nbp_simple -> nbp_simple_best_val.ckpt, "
                         "the AiMDoom_<level>_best_val.pth analog)")
    args = ap.parse_args()

    from nextbestpath_tpu.utils.jaxcache import enable_cache

    enable_cache()

    from nextbestpath_tpu.config import default_params, load_params
    from nextbestpath_tpu.assets import (generate_scene, load_scene_dir,
                                         pack_generated_scene)
    from nextbestpath_tpu.assets.scene_assets import pad_assets_to_common
    from nextbestpath_tpu.train.driver import (run_training_nbp,
                                               run_training_nbp_scan)

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
            if args.mirror:
                scenes.append(load_scene_dir(d, params=params,
                                             mirrored_axis=[0]))
    elif args.procgen:
        for diff, s in parse_procgen(args.procgen, args.seed):
            gen = generate_scene(diff, seed=s)
            scenes.append(pack_generated_scene(gen, params=params))
            if args.mirror:
                scenes.append(pack_generated_scene(gen, params=params,
                                                   mirrored_axis=[0]))
    else:
        raise SystemExit("provide --scene-dirs or --procgen")

    epochs = args.epochs if args.epochs is not None else int(params.get("epochs", 100))
    poses = args.poses if args.poses is not None else int(
        params.get("n_poses_in_trajectory", 100))

    if args.scan:
        eval_scenes = None
        if args.eval_procgen:
            # Seed offset 500: held-out scenes never overlap training seeds.
            eval_scenes = [
                pack_generated_scene(generate_scene(diff, seed=s + 500),
                                     params=params)
                for diff, s in parse_procgen(args.eval_procgen, args.seed)
            ]
            eval_scenes = pad_assets_to_common(eval_scenes)
        scenes = pad_assets_to_common(scenes)
        run_training_nbp_scan(
            scenes, eval_scenes=eval_scenes, params=params, epochs=epochs,
            n_poses=poses, db_dir=args.db_dir, seed=args.seed,
            resume=args.resume, eval_every=args.eval_every,
            eval_poses=args.eval_poses, max_wall_s=args.max_wall,
            init_from=args.init_weights, model_tag=args.tag,
        )
    else:
        run_training_nbp(scenes, params=params, epochs=epochs, n_poses=poses,
                         db_path=args.db, seed=args.seed)


if __name__ == "__main__":
    main()
