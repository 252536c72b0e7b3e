#!/usr/bin/env python
"""MACARONS online training CLI (analog of the reference's
macarons/trainers/train_macarons.py driver).

Usage: python train_macarons.py --procgen simple --poses 20
       python train_macarons.py --procgen simple --poses 12 \
           --learn-depth --predicted-depth --memory-dir nbp_data/memory \
           --replay-loops 1   (full online stack: photometric depth,
           predicted-depth mapping, Memory persistence + scone replay)
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
    ap.add_argument("--learn-depth", action="store_true",
                    help="online self-supervised ManyDepth training")
    ap.add_argument("--predicted-depth", action="store_true",
                    help="backproject through the predicted depth instead "
                         "of the rendered zbuf (use_perfect_depth=False)")
    ap.add_argument("--memory-dir", default=None,
                    help="persist frames/depths/snapshots per scene here "
                         "and enable scone memory replay")
    ap.add_argument("--replay-loops", type=int, default=1,
                    help="scone replay steps per pose (with --memory-dir)")
    ap.add_argument("--epoch", type=int, default=0,
                    help="trajectory epoch (selects the Memory slot; replay "
                         "serves only OTHER trajectories)")
    ap.add_argument("--tiny", action="store_true",
                    help="32x56 frames + small buffers (CPU smoke drives)")
    args = ap.parse_args()

    from nextbestpath_tpu.utils.jaxcache import enable_cache

    enable_cache()

    import jax

    from nextbestpath_tpu.assets import (generate_scene, load_scene_dir,
                                         pack_generated_scene)
    from nextbestpath_tpu.config import default_params
    from nextbestpath_tpu.train.train_macarons import (
        MacaronsTrainState, train_macarons_online)
    from nextbestpath_tpu.utils.checkpoint import save_checkpoint

    params = default_params()
    if args.tiny:
        params = default_params(
            image_height=32, image_width=56, points_per_frame=256,
            full_pc_capacity=32768, n_gt_surface_points=1024,
            max_path_len=32, n_proxy_points=512)
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
    memory = None
    mem_paths = []
    if args.memory_dir:
        from nextbestpath_tpu.sim.memory import Memory

        mem_paths = [os.path.join(args.memory_dir, a.name) for a in scenes]
        memory = Memory(mem_paths, n_trajectories=5,
                        current_epoch=args.epoch)
    for i, assets in enumerate(scenes):
        logs = train_macarons_online(
            assets, state, params=params, n_poses=args.poses, seed=args.seed,
            use_perfect_depth=not args.predicted_depth,
            learn_depth=args.learn_depth, memory=memory,
            scene_memory_path=mem_paths[i] if memory else None,
            memory_replay_loops=args.replay_loops if memory else 0)
        msg = (f"{assets.name}: final coverage {logs['coverage'][-1]:.4f} "
               f"occ loss {logs['occ_loss'][-1]:.4f}")
        if logs["depth_loss"]:
            msg += f" depth loss {logs['depth_loss'][-1]:.4f}"
        if logs["replay_occ_loss"]:
            msg += (f" replay occ {logs['replay_occ_loss'][-1]:.4f}"
                    f" ({len(logs['replay_occ_loss'])} steps)")
        if logs["replay_cov_loss"]:
            msg += f" replay cov {logs['replay_cov_loss'][-1]:.4f}"
        if logs.get("replay_depth_loss"):
            msg += (f" replay depth {logs['replay_depth_loss'][-1]:.4f}"
                    f" ({len(logs['replay_depth_loss'])} steps)")
        print(msg, flush=True)
    save_checkpoint(os.path.join(args.out, "scone_occ.ckpt"),
                    state.model.occ_vars)
    save_checkpoint(os.path.join(args.out, "scone_vis.ckpt"),
                    state.model.vis_vars)


if __name__ == "__main__":
    main()
