#!/usr/bin/env python
"""Value-target label noise: split-half reliability of Boltzmann suffix labels.

VERDICT r4 item 1 (falsification arm): if the diversity retrain KEEPs again,
the data-scale hypothesis is dead and the question becomes label QUALITY.
The NBP value targets are path-suffix gains — for state i, every later pose
j on the same planned path contributes gain = max(0, 100*(cov_j - cov_i))
at pose_j's pixel (nbp_utils.py:654-687). Those labels depend on what the
beta=0.5 Boltzmann policy happened to do AFTER pose i, so the same state can
receive very different labels across rollouts. This probe quantifies that
directly:

1. Run a collection prefix to pose t (one program, ScanCollection).
2. Branch K continuations from the IDENTICAL mid-state (fresh RNG keys,
   path cleared so each continuation replans at the branch — the
   collection step never consumes the pose index, so a fresh scan from the
   mid-state is exactly a continued rollout).
3. Mine the branch pose's suffix labels per continuation and measure:
   - per-pixel gain std across continuations (same state, same pixel),
   - split-half reliability: Spearman between mean-gain maps of two
     disjoint halves of the continuations on jointly-labeled pixels,
   - label sparsity: fraction of labeled pixels seen by only one
     continuation.

Split-half reliability ~0 means the supervised target at this state is
mostly continuation noise — more data averages it out only at a rate the
retrains have already probed; the fix would be label construction (e.g.
oracle gains), not scale.

Run on the TPU: python tools/probe_label_quality.py
Output: data/label_quality.json
"""

import argparse
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nextbestpath_tpu.utils.jaxcache import enable_cache  # noqa: E402

enable_cache()


def _avg_ranks(x):
    """Average-rank (scipy rankdata 'average') — positional tie-breaking
    would make the zero-inflated suffix-gain labels (many exact 0.0 ties)
    read as spuriously high or low rank agreement depending on iteration
    order."""
    import numpy as np

    order = np.argsort(x, kind="stable")
    xs = np.asarray(x)[order]
    ranks = np.empty(len(x), np.float64)
    i = 0
    while i < len(xs):
        j = i
        while j + 1 < len(xs) and xs[j + 1] == xs[i]:
            j += 1
        ranks[order[i:j + 1]] = (i + j) / 2.0
        i = j + 1
    return ranks


def spearman(a, b):
    import numpy as np

    if len(a) < 3:
        return float("nan")
    ra = _avg_ranks(a)
    rb = _avg_ranks(b)
    ra = ra - ra.mean()
    rb = rb - rb.mean()
    denom = np.sqrt((ra ** 2).sum() * (rb ** 2).sum())
    return float((ra * rb).sum() / denom) if denom > 0 else float("nan")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--difficulty", default="simple")
    ap.add_argument("--scene-seed", type=int, default=8)
    ap.add_argument("--branch-poses", type=int, nargs="+",
                    default=[5, 20, 40])
    ap.add_argument("--continuations", type=int, default=8)
    ap.add_argument("--cont-poses", type=int, default=30)
    ap.add_argument("--ckpt", default="weights/nbp/nbp_best_val.ckpt")
    ap.add_argument("--out", default="data/label_quality.json")
    ap.add_argument("--quick", action="store_true",
                    help="small frames/buffers (CPU smoke)")
    args = ap.parse_args()

    import dataclasses  # noqa: F401

    import jax
    import jax.numpy as jnp
    import numpy as np

    from nextbestpath_tpu.assets import generate_scene, pack_generated_scene
    from nextbestpath_tpu.config import default_params
    from nextbestpath_tpu.models import NBP
    from nextbestpath_tpu.models.fold import fold_bn_variables
    from nextbestpath_tpu.train.scan_collection import (
        ScanCollection,
        suffix_labels_from_out,
    )
    from nextbestpath_tpu.utils.checkpoint import load_checkpoint

    if args.quick:
        p = default_params(image_height=32, image_width=56,
                           points_per_frame=256, full_pc_capacity=32768,
                           n_gt_surface_points=1024, max_path_len=32)
    else:
        p = default_params()
    assets = pack_generated_scene(
        generate_scene(args.difficulty, seed=args.scene_seed), params=p)
    model = NBP(dtype=jnp.bfloat16)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 5)))
    if os.path.exists(args.ckpt) and not args.quick:
        variables, _, ep, _ = load_checkpoint(args.ckpt, variables)
        print(f"# ckpt {args.ckpt} (epoch {ep})", file=sys.stderr,
              flush=True)

    col = ScanCollection([assets], model, params=p)
    folded = fold_bn_variables(variables)
    # run() folds internally; use the raw program so the mid-state is ours.
    vms = int(p.value_map_size[0])
    grid_range = tuple(p.prediction_range)

    report = {"difficulty": args.difficulty, "scene_seed": args.scene_seed,
              "continuations": args.continuations,
              "cont_poses": args.cont_poses, "branches": []}

    # ONE compiled program for everything: a 5-pose collection segment.
    # The collection step never consumes the pose index, so iterating the
    # segment program continues the rollout exactly; branch poses must be
    # multiples of SEG. Distinct scan lengths would each pay a multi-minute
    # compile through the remote-TPU compiler.
    SEG = 5
    seg_fn = col._rollout_fn(SEG)

    def run_segments(state, n):
        outs = []
        for _ in range(n // SEG):
            state, out = seg_fn(col.scenes[0], folded, state)
            outs.append(out)
        out = jax.tree.map(
            lambda *xs: np.concatenate([np.asarray(x) for x in xs]), *outs)
        return state, out

    # One trajectory-buffer capacity for every branch: buffer shapes are
    # part of the program signature, and the capacity must hold the longest
    # prefix + continuation (a saturated TrajectoryBuffer would corrupt the
    # model input's trajectory channel).
    cap_poses = max(args.branch_poses) + args.cont_poses

    for t in args.branch_poses:
        assert t % SEG == 0, f"branch pose {t} must be a multiple of {SEG}"
        state0 = col.initial_state(0, seed=777, n_poses=cap_poses)
        mid, _ = run_segments(state0, t)
        # Force a replan at the branch: the suffix segment then starts at
        # the branch pose for every continuation.
        mid = mid._replace(path_len=jnp.int32(0),
                           path_record=jnp.int32(0),
                           done=jnp.bool_(False))

        per_cont = []  # list of dict pixel -> gain for the branch pose
        label_counts = []
        for k in range(args.continuations):
            st = mid._replace(key=jax.random.PRNGKey(10_000 + 97 * k))
            _, out = run_segments(st, args.cont_poses)
            labels = suffix_labels_from_out(out, vms, grid_range)
            row = {}
            for pose_i, pixels, gains in labels:
                if pose_i != 0:
                    continue
                for (r_, y, x), g in zip(pixels, gains):
                    row[(int(r_), int(y), int(x))] = float(g)
            per_cont.append(row)
            label_counts.append(len(row))

        by_pixel = defaultdict(list)
        for ci, row in enumerate(per_cont):
            for px, g in row.items():
                by_pixel[px].append((ci, g))

        multi = {px: v for px, v in by_pixel.items() if len(v) >= 2}
        singles = sum(1 for v in by_pixel.values() if len(v) == 1)
        stds = [float(np.std([g for _, g in v])) for v in multi.values()]
        means = [float(np.mean([g for _, g in v])) for v in multi.values()]

        # Split-half reliability on pixels labeled by both halves.
        half = args.continuations // 2
        a_vals, b_vals = [], []
        for px, v in by_pixel.items():
            ga = [g for ci, g in v if ci < half]
            gb = [g for ci, g in v if ci >= half]
            if ga and gb:
                a_vals.append(float(np.mean(ga)))
                b_vals.append(float(np.mean(gb)))
        rel = spearman(np.asarray(a_vals), np.asarray(b_vals))

        noise = float(np.mean(stds)) if stds else float("nan")
        signal = float(np.std(means)) if means else float("nan")
        entry = {
            "branch_pose": t,
            "labels_per_continuation": label_counts,
            "n_pixels_total": len(by_pixel),
            "n_pixels_multi": len(multi),
            "frac_single_continuation": round(
                singles / max(len(by_pixel), 1), 4),
            "mean_within_pixel_std": round(noise, 4),
            "across_pixel_signal_std": round(signal, 4),
            "noise_to_signal": round(noise / signal, 4)
            if signal and signal > 0 else None,
            "split_half_spearman": round(rel, 4),
            "n_split_half_pixels": len(a_vals),
        }
        report["branches"].append(entry)
        print(f"# t={t}: {entry}", file=sys.stderr, flush=True)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({"label_quality": report["branches"]}))


if __name__ == "__main__":
    main()
