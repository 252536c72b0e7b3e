#!/usr/bin/env python
"""Reference-protocol evaluation: 101 poses, per-difficulty batches.

Runs tools/eval_vs_random_r2.py once per difficulty (4 scenes x N seeds
each) instead of one 16-scene batch: per-difficulty batches keep each
compiled program at its own lattice size (no padding every scene to the
insane lattice) and bound device memory — the single 16-scene 101-pose
program crashed the TPU worker. Merges the per-difficulty JSONs into
data/eval_vs_random_r3_101.json with the combined table.

Run on the TPU (ambient env): python tools/eval101_all.py
"""

import argparse
import json
import os
import subprocess
import sys

DIFFS = ("simple", "normal", "hard", "insane")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--poses", type=int, default=101)
    ap.add_argument("--scenes-per-diff", type=int, default=4)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--weights", default="weights/nbp/nbp_best_val.ckpt",
                    help="single checkpoint, or a per-difficulty pattern "
                         "with {level} (e.g. "
                         "'weights/nbp/nbp_{level}_best_auc.ckpt' — the "
                         "reference's per-level weight files); levels whose "
                         "file is missing fall back to the default ckpt")
    ap.add_argument("--out", default="data/eval_vs_random_r3_101.json")
    ap.add_argument("--difficulties", default=",".join(DIFFS))
    args = ap.parse_args()
    diffs = [d.strip() for d in args.difficulties.split(",") if d.strip()]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    merged = {"poses": args.poses, "scenes_per_diff": args.scenes_per_diff,
              "seeds": args.seeds, "per_scene": {}, "per_difficulty": {}}
    for diff in diffs:
        part = os.path.join(repo, "data", f"eval101_{diff}.json")
        w = args.weights.format(level=diff)
        if not os.path.exists(os.path.join(repo, w)) and not os.path.exists(w):
            fallback = "weights/nbp/nbp_best_val.ckpt"
            print(f"# {w} missing -> {fallback}", file=sys.stderr, flush=True)
            w = fallback
        cmd = [sys.executable, os.path.join(repo, "tools",
                                            "eval_vs_random_r2.py"),
               "--poses", str(args.poses),
               "--scenes-per-diff", str(args.scenes_per_diff),
               "--seeds", str(args.seeds),
               "--weights", w,
               "--difficulties", diff,
               "--out", part]
        print(f"# running {diff} ...", file=sys.stderr, flush=True)
        rc = subprocess.run(cmd, cwd=repo).returncode
        if rc != 0:
            print(f"# {diff} FAILED rc={rc}", file=sys.stderr, flush=True)
            continue
        with open(part) as f:
            d = json.load(f)
        merged["per_scene"].update(d["per_scene"])
        merged["per_difficulty"].update(d["per_difficulty"])
        merged["weights_epoch"] = d.get("weights_epoch")

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(merged, f, indent=2)

    print("\n| difficulty | NBP AUC | random AUC | NBP final | rw final | NBP wins |")
    print("|---|---|---|---|---|---|")
    for diff in diffs:
        t = merged["per_difficulty"].get(diff)
        if not t:
            print(f"| {diff} | FAILED | | | | |")
            continue
        print(f"| {diff} | {t['nbp_auc']} | {t['rw_auc']} | {t['nbp_final']} "
              f"| {t['rw_final']} | {'YES' if t['nbp_wins'] else 'no'} |")


if __name__ == "__main__":
    main()
