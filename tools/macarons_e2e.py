#!/usr/bin/env python
"""MACARONS end-to-end quality table: online training -> NBV vs random walk.

The analog of the reference's scene-tester output (testers/scene.py:828-975
after online training train_macarons.py:1054-1410): train the MACARONS
stack online with perfect depth on training scenes, then evaluate the
trained SconeOcc/SconeVis greedy-NBV policy against the random-walk
baseline on HELD-OUT scenes (shared recipe, eval/heldout.py) and print a
coverage table.

Run on the TPU (ambient env):
    python tools/macarons_e2e.py --train-scenes 2 --train-poses 100 \
        --eval-poses 100 --difficulties simple
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
    ap.add_argument("--train-scenes", type=int, default=2)
    ap.add_argument("--train-poses", type=int, default=100)
    ap.add_argument("--eval-poses", type=int, default=100)
    ap.add_argument("--eval-scenes-per-diff", type=int, default=2)
    ap.add_argument("--eval-seeds", type=int, default=2)
    ap.add_argument("--difficulties", default="simple")
    ap.add_argument("--seed", type=int, default=8)
    ap.add_argument("--occ-ckpt", default=None,
                    help="warm-start SconeOcc from this checkpoint")
    ap.add_argument("--vis-ckpt", default=None)
    ap.add_argument("--save", default="weights/macarons",
                    help="save trained scone weights here")
    ap.add_argument("--out", default="data/macarons_e2e.json")
    ap.add_argument("--tiny", action="store_true",
                    help="32x56 frames (CPU smoke)")
    args = ap.parse_args()
    diffs = tuple(d.strip() for d in args.difficulties.split(",") if d.strip())

    import jax
    import numpy as np

    from nextbestpath_tpu.assets import generate_scene, pack_generated_scene
    from nextbestpath_tpu.config import default_params
    from nextbestpath_tpu.eval.heldout import held_out_assets
    from nextbestpath_tpu.eval.macarons_nbv import macarons_nbv_rollout
    from nextbestpath_tpu.eval.random_walk import ScanRandomWalk
    from nextbestpath_tpu.train.train_macarons import (
        MacaronsTrainState,
        train_macarons_online,
    )
    from nextbestpath_tpu.utils.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )

    if args.tiny:
        params = default_params(
            image_height=32, image_width=56, points_per_frame=256,
            full_pc_capacity=32768, n_gt_surface_points=1024,
            max_path_len=32, n_proxy_points=512)
    else:
        params = default_params()

    # -- Phase 1: online training (perfect depth), training-seed scenes ----
    state = MacaronsTrainState.create(jax.random.PRNGKey(args.seed),
                                      params=params)
    if args.occ_ckpt and os.path.exists(args.occ_ckpt):
        state.model.occ_vars, *_ = load_checkpoint(args.occ_ckpt,
                                                   state.model.occ_vars)
        print(f"# warm-started occ from {args.occ_ckpt}", file=sys.stderr)
    if args.vis_ckpt and os.path.exists(args.vis_ckpt):
        state.model.vis_vars, *_ = load_checkpoint(args.vis_ckpt,
                                                   state.model.vis_vars)
        print(f"# warm-started vis from {args.vis_ckpt}", file=sys.stderr)

    train_logs = {}
    for i in range(args.train_scenes):
        for j, diff in enumerate(diffs):
            assets = pack_generated_scene(
                generate_scene(diff, seed=args.seed + j * 37 + i),
                params=params)
            logs = train_macarons_online(
                assets, state, params=params, n_poses=args.train_poses,
                seed=args.seed + i, use_perfect_depth=True, verbose=True)
            train_logs[assets.name] = {
                "final_coverage": round(logs["coverage"][-1], 4),
                "occ_loss_first": round(float(np.mean(logs["occ_loss"][:5])), 4),
                "occ_loss_last": round(float(np.mean(logs["occ_loss"][-5:])), 4),
                "cov_loss_first": round(float(np.mean(logs["cov_loss"][:5])), 4),
                "cov_loss_last": round(float(np.mean(logs["cov_loss"][-5:])), 4),
            }
            print(f"# trained on {assets.name}: {train_logs[assets.name]}",
                  file=sys.stderr, flush=True)
    if args.save:
        os.makedirs(args.save, exist_ok=True)
        save_checkpoint(os.path.join(args.save, "scone_occ.ckpt"),
                        state.model.occ_vars)
        save_checkpoint(os.path.join(args.save, "scone_vis.ckpt"),
                        state.model.vis_vars)

    # -- Phase 2: held-out NBV vs random walk ------------------------------
    eval_assets = held_out_assets(params,
                                  scenes_per_diff=args.eval_scenes_per_diff,
                                  difficulties=diffs)
    rw = ScanRandomWalk(eval_assets, params=params)
    table = {a.name: {"nbv_auc": [], "rw_auc": [], "nbv_final": [],
                      "rw_final": []} for a in eval_assets}
    for s in range(args.eval_seeds):
        for a in eval_assets:
            res = macarons_nbv_rollout(
                a, state.model.scone_occ, state.model.occ_vars,
                state.model.scone_vis, state.model.vis_vars,
                params=params, n_poses=args.eval_poses,
                seed=1000 + 97 * s)
            table[a.name]["nbv_auc"].append(res.auc)
            table[a.name]["nbv_final"].append(res.coverage_evolution[-1])
            print(f"# nbv {a.name} seed{s}: final "
                  f"{res.coverage_evolution[-1]:.4f} auc {res.auc:.4f}",
                  file=sys.stderr, flush=True)
        for a, r in zip(eval_assets, rw.run(n_poses=args.eval_poses,
                                            seed=1000 + 97 * s)):
            table[a.name]["rw_auc"].append(r.auc)
            table[a.name]["rw_final"].append(r.coverage_evolution[-1])

    per_diff = {}
    for k, diff in enumerate(diffs):
        names = [a.name for a in eval_assets if f"_{diff}_" in a.name]
        per_diff[diff] = {
            "nbv_auc": round(float(np.mean([np.mean(table[n]["nbv_auc"])
                                            for n in names])), 4),
            "rw_auc": round(float(np.mean([np.mean(table[n]["rw_auc"])
                                           for n in names])), 4),
            "nbv_final": round(float(np.mean([np.mean(table[n]["nbv_final"])
                                              for n in names])), 4),
            "rw_final": round(float(np.mean([np.mean(table[n]["rw_final"])
                                             for n in names])), 4),
        }
        per_diff[diff]["nbv_wins"] = bool(
            per_diff[diff]["nbv_auc"] > per_diff[diff]["rw_auc"])

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"train_poses": args.train_poses,
                   "eval_poses": args.eval_poses, "train": train_logs,
                   "per_scene": table, "per_difficulty": per_diff}, f,
                  indent=2)

    print("\n| difficulty | NBV AUC | random AUC | NBV final | rw final | NBV wins |")
    print("|---|---|---|---|---|---|")
    for diff in diffs:
        t = per_diff[diff]
        print(f"| {diff} | {t['nbv_auc']} | {t['rw_auc']} | {t['nbv_final']} "
              f"| {t['rw_final']} | {'YES' if t['nbv_wins'] else 'no'} |")


if __name__ == "__main__":
    main()
