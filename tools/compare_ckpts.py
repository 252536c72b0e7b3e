#!/usr/bin/env python
"""Head-to-head checkpoint comparison on held-out scenes, one compile.

Promotion gate for continued-training runs: evaluates two NBP checkpoints
through the SAME BatchedScanRollout program (weights are runtime args, so
both checkpoints share one compiled executable) on the held-out procgen
scenes used by tools/eval_vs_random_r2.py, and prints per-difficulty AUC
plus an overall PROMOTE/KEEP verdict (mean AUC across difficulties).

Run on the TPU (ambient env):
    python tools/compare_ckpts.py --ckpt-a weights/nbp/nbp_best_val.ckpt \
        --ckpt-b weights/nbp/nbp_r2c_best_val.ckpt
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
    ap.add_argument("--ckpt-a", default="weights/nbp/nbp_best_val.ckpt")
    ap.add_argument("--ckpt-b", default=None)
    ap.add_argument("--ckpt-b-per-level", default=None,
                    help="candidate B as a PER-DIFFICULTY checkpoint set: a "
                         "format string with {level}, e.g. "
                         "'weights/nbp/nbp_{level}_best_auc.ckpt' — the "
                         "reference's own deployment shape (one weight file "
                         "per AiMDoom difficulty, README.md:73-80). Each "
                         "difficulty's scenes are scored with that level's "
                         "checkpoint; levels whose file is missing fall "
                         "back to --ckpt-a. Forces sequential mode (one "
                         "program, weights as runtime args).")
    ap.add_argument("--poses", type=int, default=40)
    ap.add_argument("--scenes-per-diff", type=int, default=2)
    ap.add_argument("--seeds", type=int, default=2)
    ap.add_argument("--out", default="data/compare_ckpts.json")
    ap.add_argument("--min-margin", type=float, default=0.005,
                    help="minimum mean-AUC improvement required for a "
                         "PROMOTE verdict (noise floor at 2x2 per level)")
    ap.add_argument("--mode", choices=("batched", "sequential"),
                    default="sequential",
                    help="sequential (default) = one single-scene program "
                         "reused across scenes — per-scene trajectories "
                         "match deployment exactly; batched = one vmapped "
                         "program over all scenes (DEPRECATED for gates: on "
                         "TPU bf16 batch-B trajectories drift from "
                         "single-scene runs, VERDICT r4 weak #3 — the A/B "
                         "comparison stays fair but scores a perturbed "
                         "workload)")
    ap.add_argument("--segment", type=int, default=26,
                    help="segment_len for chunked execution: keeps every "
                         "device execution short — minutes-long single "
                         "executions crash the tunneled worker (round-4 "
                         "bisect). 0 disables.")
    ap.add_argument("--scene-offset", type=int, default=0,
                    help="per-difficulty held-out scene offset; use >= 1 "
                         "when the candidate was SELECTED on the j=0 eval "
                         "scenes so the gate scores unseen scenes")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from nextbestpath_tpu.config import default_params
    from nextbestpath_tpu.eval.heldout import held_out_assets
    from nextbestpath_tpu.eval.scan_rollout import (BatchedScanRollout,
                                                    ScanRollout)
    from nextbestpath_tpu.models import NBP
    from nextbestpath_tpu.utils.checkpoint import load_checkpoint

    params = default_params()
    # Shared held-out recipe (eval/heldout.py) — the same scenes as the
    # random-walk baseline table in eval_vs_random_r2.py, by construction.
    assets = held_out_assets(params, scenes_per_diff=args.scenes_per_diff,
                             scene_offset=args.scene_offset)
    seg = args.segment or None

    model = NBP(dtype=jnp.bfloat16)
    init = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 5)))
    var_a, _, ep_a, _ = load_checkpoint(args.ckpt_a, init)
    if args.ckpt_b_per_level:
        if args.mode != "sequential":
            print("# per-level candidate forces sequential mode",
                  file=sys.stderr, flush=True)
            args.mode = "sequential"
        var_b_by_diff, ckpt_b_names = {}, {}
        for diff in DIFFS:
            path = args.ckpt_b_per_level.format(level=diff)
            if os.path.exists(path):
                var_b_by_diff[diff], _, ep, _ = load_checkpoint(path, init)
                ckpt_b_names[diff] = f"{path} (epoch {ep})"
            else:
                var_b_by_diff[diff] = var_a
                ckpt_b_names[diff] = f"MISSING {path} -> ckpt_a"
        ep_b = -1
        ckpt_b_label = {d: ckpt_b_names[d] for d in DIFFS}
        print(f"# A = {args.ckpt_a} (epoch {ep_a}), B per-level = "
              f"{ckpt_b_label}", file=sys.stderr, flush=True)
    else:
        if not args.ckpt_b:
            raise SystemExit("provide --ckpt-b or --ckpt-b-per-level")
        var_b, _, ep_b, _ = load_checkpoint(args.ckpt_b, init)
        var_b_by_diff = {d: var_b for d in DIFFS}
        ckpt_b_label = args.ckpt_b
        print(f"# A = {args.ckpt_a} (epoch {ep_a}), "
              f"B = {args.ckpt_b} (epoch {ep_b})", file=sys.stderr, flush=True)

    def _diff_of(name: str) -> str:
        for d in DIFFS:
            if f"_{d}_" in name:
                return d
        raise ValueError(name)

    aucs = {"a": {a.name: [] for a in assets},
            "b": {a.name: [] for a in assets}}
    if args.mode == "batched":
        # The batched branch scores every scene with ONE candidate-B weight
        # set, which is only correct in single-ckpt mode (per-level mode
        # forces sequential above — keep that invariant explicit).
        assert args.ckpt_b_per_level is None, (
            "per-level candidates require --mode sequential")
        rollout = BatchedScanRollout(assets, model, var_a, params=params)
        for s in range(args.seeds):
            for key, var in (("a", var_a), ("b", var_b)):
                for a, r in zip(assets, rollout.run(n_poses=args.poses,
                                                    seed=1000 + 97 * s,
                                                    variables=var,
                                                    segment_len=seg)):
                    aucs[key][a.name].append(r.auc)
                print(f"# seed block {s}, ckpt {key} done", file=sys.stderr,
                      flush=True)
    else:
        # One single-scene program, module-cached by configuration signature:
        # every (scene, checkpoint, seed) combination reuses the same
        # executable with scene + weights as runtime args.
        rollouts = [ScanRollout(a, model, var_a, params=params)
                    for a in assets]
        for s in range(args.seeds):
            for key in ("a", "b"):
                for a, r in zip(assets, rollouts):
                    var = (var_a if key == "a"
                           else var_b_by_diff[_diff_of(a.name)])
                    res = r.run(n_poses=args.poses, seed=1000 + 97 * s,
                                variables=var, segment_len=seg)
                    aucs[key][a.name].append(res.auc)
                print(f"# seed block {s}, ckpt {key} done", file=sys.stderr,
                      flush=True)

    # Verdict from UNROUNDED means with a minimum margin: at 2 scenes x 2
    # seeds per difficulty a rounding tie or a noise-level win must not
    # decide a promotion.
    table, means = {}, {}
    for k in ("a", "b"):
        per_diff = []
        for diff in DIFFS:
            names = [a.name for a in assets if f"_{diff}_" in a.name]
            per_diff.append(float(np.mean([np.mean(aucs[k][n])
                                           for n in names])))
        means[k] = float(np.mean(per_diff))
        for diff, v in zip(DIFFS, per_diff):
            table.setdefault(diff, {})[k] = round(v, 4)
    mean_a, mean_b = means["a"], means["b"]
    verdict = "PROMOTE" if mean_b > mean_a + args.min_margin else "KEEP"

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"poses": args.poses, "ckpt_a": args.ckpt_a,
                   "ckpt_b": ckpt_b_label, "epoch_a": int(ep_a),
                   "epoch_b": int(ep_b), "per_difficulty": table,
                   "mean_auc_a": round(mean_a, 4),
                   "mean_auc_b": round(mean_b, 4),
                   "verdict": verdict}, f, indent=2)

    print("\n| difficulty | AUC (A) | AUC (B) |")
    print("|---|---|---|")
    for diff in DIFFS:
        print(f"| {diff} | {table[diff]['a']} | {table[diff]['b']} |")
    print(f"\nmean AUC: A {mean_a:.4f} vs B {mean_b:.4f} -> {verdict}")


if __name__ == "__main__":
    main()
