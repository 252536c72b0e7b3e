#!/usr/bin/env python
"""Held-out NBP-vs-random-walk comparison across the 4 difficulty levels.

The round-2 north-star check (VERDICT #2): coverage AUC of the trained NBP
policy vs the random-walk baseline on held-out procgen scenes (seeds
disjoint from training) at simple/normal/hard/insane. Both policies run the
same fully-jitted mapping/coverage harness; results land in
data/eval_vs_random_r2.json and a markdown table on stdout.

Run on the TPU (ambient env): python tools/eval_vs_random_r2.py
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nextbestpath_tpu.utils.jaxcache import enable_cache  # noqa: E402

enable_cache()

DIFFS = ("simple", "normal", "hard", "insane")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--poses", type=int, default=40)
    ap.add_argument("--scenes-per-diff", type=int, default=2)
    ap.add_argument("--seeds", type=int, default=2,
                    help="rollout seeds per scene (AUCs are averaged)")
    ap.add_argument("--weights", default="weights/nbp/nbp_best_val.ckpt")
    ap.add_argument("--out", default="data/eval_vs_random_r2.json")
    ap.add_argument("--difficulties", default=",".join(DIFFS),
                    help="comma list (per-level fine-tune evals)")
    args = ap.parse_args()
    diffs = tuple(d.strip() for d in args.difficulties.split(",") if d.strip())

    import jax
    import jax.numpy as jnp

    from nextbestpath_tpu.config import default_params
    from nextbestpath_tpu.eval.heldout import held_out_assets
    from nextbestpath_tpu.eval.random_walk import ScanRandomWalk
    from nextbestpath_tpu.eval.scan_rollout import BatchedScanRollout
    from nextbestpath_tpu.models import NBP
    from nextbestpath_tpu.utils.checkpoint import load_checkpoint

    params = default_params()
    # Shared held-out recipe (eval/heldout.py): same scenes as the
    # promotion gate in tools/compare_ckpts.py, by construction.
    assets = held_out_assets(params, scenes_per_diff=args.scenes_per_diff,
                             difficulties=diffs)

    model = NBP(dtype=jnp.bfloat16)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 5)))
    variables, _, epoch, _ = load_checkpoint(args.weights, variables)
    print(f"# weights {args.weights} (epoch {epoch})", file=sys.stderr,
          flush=True)

    nbp_rollout = BatchedScanRollout(assets, model, variables, params=params)
    rw_rollout = ScanRandomWalk(assets, params=params)

    results = {a.name: {"nbp_auc": [], "rw_auc": [], "nbp_final": [],
                        "rw_final": []} for a in assets}
    for s in range(args.seeds):
        print(f"# NBP rollouts, seed block {s}", file=sys.stderr, flush=True)
        for a, r in zip(assets, nbp_rollout.run(n_poses=args.poses,
                                                seed=1000 + 97 * s)):
            results[a.name]["nbp_auc"].append(r.auc)
            results[a.name]["nbp_final"].append(r.coverage_evolution[-1])
        print(f"# random-walk rollouts, seed block {s}", file=sys.stderr,
              flush=True)
        for a, r in zip(assets, rw_rollout.run(n_poses=args.poses,
                                               seed=1000 + 97 * s)):
            results[a.name]["rw_auc"].append(r.auc)
            results[a.name]["rw_final"].append(r.coverage_evolution[-1])

    import numpy as np

    table = {}
    for diff in diffs:
        names = [a.name for a in assets if f"_{diff}_" in a.name]
        nbp = float(np.mean([np.mean(results[n]["nbp_auc"]) for n in names]))
        rw = float(np.mean([np.mean(results[n]["rw_auc"]) for n in names]))
        nbp_f = float(np.mean([np.mean(results[n]["nbp_final"])
                               for n in names]))
        rw_f = float(np.mean([np.mean(results[n]["rw_final"])
                              for n in names]))
        table[diff] = dict(nbp_auc=round(nbp, 4), rw_auc=round(rw, 4),
                           nbp_final=round(nbp_f, 4),
                           rw_final=round(rw_f, 4),
                           nbp_wins=bool(nbp > rw))

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"poses": args.poses, "weights_epoch": int(epoch),
                   "per_scene": results, "per_difficulty": table}, f,
                  indent=2)

    print(f"\n| difficulty | NBP AUC | random AUC | NBP final | rw final | NBP wins |")
    print("|---|---|---|---|---|---|")
    for diff in diffs:
        t = table[diff]
        print(f"| {diff} | {t['nbp_auc']} | {t['rw_auc']} | "
              f"{t['nbp_final']} | {t['rw_final']} | "
              f"{'YES' if t['nbp_wins'] else 'no'} |")


if __name__ == "__main__":
    main()
