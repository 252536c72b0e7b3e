#!/usr/bin/env python
"""Per-level NBP fine-tuning in ONE process.

The reference ships one weight file per AiMDoom difficulty
(weights/nbp/AiMDoom_<level>_best_val.pth, README.md:73-80); the round-2 main
run trains one policy across all four levels. This tool warm-starts a
per-level fine-tune from that shared policy for each requested level and
saves nbp_<level>_best_val.ckpt — all inside one process so the jitted
collection/eval programs (scene arrays are runtime args) compile ONCE: every
level's scenes are padded to one common shape set up front.

Run on the TPU: python tools/finetune_per_level.py --epochs 6
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nextbestpath_tpu.utils.jaxcache import enable_cache  # noqa: E402

enable_cache()

DIFFS = ("simple", "normal", "hard", "insane")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default=",".join(DIFFS))
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--poses", type=int, default=100)
    ap.add_argument("--scenes-per-level", type=int, default=2)
    ap.add_argument("--init", default="weights/nbp/nbp_best_val.ckpt")
    ap.add_argument("--eval-every", type=int, default=3)
    ap.add_argument("--max-wall", type=float, default=None,
                    help="per-level wall budget (seconds)")
    ap.add_argument("--eval-scenes-per-level", type=int, default=2)
    ap.add_argument("--eval-seeds", type=int, default=2)
    ap.add_argument("--out", default="data/eval_vs_random_ft.json")
    args = ap.parse_args()
    levels = [l.strip() for l in args.levels.split(",") if l.strip()]

    from nextbestpath_tpu.assets import generate_scene, pack_generated_scene
    from nextbestpath_tpu.assets.scene_assets import pad_assets_to_common
    from nextbestpath_tpu.config import default_params
    from nextbestpath_tpu.train.driver import run_training_nbp_scan

    params = default_params()
    # Same seed scheme as train_nbp.py parse_procgen(base=8): training seeds
    # 8 + i*37 + j, held-out eval seeds +500.
    train_sets, eval_sets = {}, {}
    everything = []
    for i, diff in enumerate(DIFFS):
        if diff not in levels:
            continue
        tr = [pack_generated_scene(generate_scene(diff, seed=8 + i * 37 + j),
                                   params=params)
              for j in range(args.scenes_per_level)]
        # Held-out seeds, same scheme as tools/eval_vs_random_r2.py.
        ev = [pack_generated_scene(
                  generate_scene(diff, seed=8 + i * 37 + j + 500),
                  params=params)
              for j in range(args.eval_scenes_per_level)]
        train_sets[diff], eval_sets[diff] = tr, ev
        everything.extend(tr + ev)
    # One global pad -> one compiled collection program + one eval program
    # for every level (module-level program caches key on shapes).
    everything = pad_assets_to_common(everything)
    it = iter(everything)
    ordered = [d for d in DIFFS if d in levels]  # the build order above
    for diff in ordered:
        train_sets[diff] = [next(it) for _ in train_sets[diff]]
        eval_sets[diff] = [next(it) for _ in eval_sets[diff]]

    for diff in ordered:
        print(f"=== fine-tune {diff} ===", flush=True)
        run_training_nbp_scan(
            train_sets[diff], eval_scenes=eval_sets[diff], params=params,
            epochs=args.epochs, n_poses=args.poses,
            db_dir=f"nbp_data/db_ft_{diff}", model_tag=f"nbp_{diff}",
            seed=8, resume=False, eval_every=args.eval_every,
            eval_poses=40, max_wall_s=args.max_wall, init_from=args.init,
        )

    # Final per-level table: fine-tuned NBP vs random walk on the held-out
    # scenes, inside this process (the eval programs are already compiled).
    import json

    import jax
    import jax.numpy as jnp
    import numpy as np

    from nextbestpath_tpu.eval.random_walk import ScanRandomWalk
    from nextbestpath_tpu.eval.scan_rollout import BatchedScanRollout
    from nextbestpath_tpu.models import NBP
    from nextbestpath_tpu.utils.checkpoint import load_checkpoint

    model = NBP(dtype=jnp.bfloat16)
    template = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 5)))
    table = {}
    for diff in ordered:
        # Prefer the rollout-AUC-selected checkpoint (driver round 4: val
        # loss is uncorrelated with rollout AUC, Spearman 0.018). NOTE this
        # in-process table scores the SAME scenes selection saw; the
        # unbiased verdict is compare_ckpts.py --scene-offset 1.
        w = f"weights/nbp/nbp_{diff}_best_auc.ckpt"
        if not os.path.exists(w):
            w = f"weights/nbp/nbp_{diff}_best_val.ckpt"
        variables, _, ep, _ = load_checkpoint(w, template)
        nbp_r = BatchedScanRollout(eval_sets[diff], model, variables,
                                   params=params)
        rw_r = ScanRandomWalk(eval_sets[diff], params=params)
        nbp_auc, rw_auc, nbp_f, rw_f = [], [], [], []
        for s in range(args.eval_seeds):
            for r in nbp_r.run(n_poses=40, seed=1000 + 97 * s):
                nbp_auc.append(r.auc)
                nbp_f.append(r.coverage_evolution[-1])
            for r in rw_r.run(n_poses=40, seed=1000 + 97 * s):
                rw_auc.append(r.auc)
                rw_f.append(r.coverage_evolution[-1])
        table[diff] = dict(
            nbp_auc=round(float(np.mean(nbp_auc)), 4),
            rw_auc=round(float(np.mean(rw_auc)), 4),
            nbp_final=round(float(np.mean(nbp_f)), 4),
            rw_final=round(float(np.mean(rw_f)), 4),
            nbp_wins=bool(np.mean(nbp_auc) > np.mean(rw_auc)),
            weights_epoch=int(ep),
        )
        print(f"{diff}: NBP {table[diff]['nbp_auc']} vs "
              f"random {table[diff]['rw_auc']} "
              f"({'WIN' if table[diff]['nbp_wins'] else 'loss'})", flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"per_difficulty": table}, f, indent=2)
    print("| difficulty | NBP AUC | random AUC | NBP final | rw final | NBP wins |")
    print("|---|---|---|---|---|---|")
    for diff in ordered:
        t = table[diff]
        print(f"| {diff} | {t['nbp_auc']} | {t['rw_auc']} | {t['nbp_final']} "
              f"| {t['rw_final']} | {'YES' if t['nbp_wins'] else 'no'} |")


if __name__ == "__main__":
    main()
