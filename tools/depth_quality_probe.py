#!/usr/bin/env python
"""ManyDepth learning evidence: photometric curve + depth error + coverage.

Round-2 shipped the online self-supervised depth path but recorded no
quality numbers ("trains without NaN" is not "learns depth"). This drive
produces the three numbers VERDICT asked for (contract:
apply_depth_model + photometric supervision, reference
macarons_utils.py:1089-1388):

1. the online photometric-loss curve over a trajectory
   (learn_depth=True),
2. mean |predicted depth - rendered zbuf| over valid pixels, early vs late
   in training (the depth_abs_err log),
3. rollout coverage with use_perfect_depth=False (mapping driven by the
   PREDICTED depth) vs the perfect-depth run on the same scene/seed.

The depth encoder is randomly initialized (the reference warm-starts from
an ImageNet-pretrained ResNet pickle that is not available offline,
Macarons.py:15,234), so the expectation is a falling loss/error curve and
a predicted-depth coverage that lands within striking distance of perfect
depth — not photorealistic-depth parity.

Run on the TPU (ambient env): python tools/depth_quality_probe.py
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nextbestpath_tpu.utils.jaxcache import enable_cache  # noqa: E402

enable_cache()


def _mean(xs):
    return sum(xs) / max(len(xs), 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--poses", type=int, default=60)
    ap.add_argument("--difficulty", default="simple")
    ap.add_argument("--seed", type=int, default=8)
    ap.add_argument("--tiny", action="store_true",
                    help="32x56 frames (CPU smoke)")
    ap.add_argument("--depth-ckpt", default=None,
                    help="warm-start depth variables (pretrain_depth.py "
                         "output) — the ImageNet-warm-start substitute")
    ap.add_argument("--freeze-depth", action="store_true",
                    help="skip the online photometric fine-tuning in both "
                         "phases: measures the --depth-ckpt weights as-is "
                         "(isolates pretrained quality from online drift; "
                         "the reference always keeps learning online)")
    # Staged-unfreeze recipe (VERDICT r4 item 4): keep the warm start
    # frozen for K poses, then learn with a much lower LR, gradient
    # clipping, and loss-spike rejection (rollback to the last good
    # snapshot). The r4 finding was that naive learn_depth=True destroys a
    # pretrained model within poses; this measures whether controlled
    # online learning can match or beat the frozen recipe.
    ap.add_argument("--unfreeze-after", type=int, default=0,
                    help="poses before the first online depth update")
    ap.add_argument("--depth-lr", type=float, default=1e-4)
    ap.add_argument("--depth-clip", type=float, default=0.0,
                    help="global-norm gradient clip for online updates "
                         "(0 = off)")
    ap.add_argument("--reject-factor", type=float, default=0.0,
                    help="reject/rollback updates when the photometric "
                         "loss exceeds this factor x median of recent "
                         "accepted losses (0 = off)")
    ap.add_argument("--out", default="data/depth_quality.json")
    args = ap.parse_args()

    import jax

    from nextbestpath_tpu.assets import generate_scene, pack_generated_scene
    from nextbestpath_tpu.config import default_params
    from nextbestpath_tpu.train.train_macarons import (
        MacaronsTrainState,
        train_macarons_online,
    )

    if args.tiny:
        params = default_params(
            image_height=32, image_width=56, points_per_frame=256,
            full_pc_capacity=65536, n_gt_surface_points=2048,
            n_proxy_points=512)
    else:
        params = default_params(
            image_height=256, image_width=456, points_per_frame=4096,
            full_pc_capacity=1048576)
    assets = pack_generated_scene(
        generate_scene(args.difficulty, seed=args.seed), params=params)

    # Phase 1: online depth learning under perfect-depth mapping, logging
    # the inference-vs-zbuf error every pose (train_macarons.py:1089-1388).
    state = MacaronsTrainState.create(jax.random.PRNGKey(args.seed),
                                      params=params,
                                      depth_lr=args.depth_lr,
                                      depth_clip=args.depth_clip)
    if args.depth_ckpt:
        from nextbestpath_tpu.utils.checkpoint import load_checkpoint

        state.model.depth_vars, _, at_step, extra = load_checkpoint(
            args.depth_ckpt, state.model.depth_vars)
        print(f"# warm-started depth from {args.depth_ckpt} "
              f"(step {at_step}, {extra})", file=sys.stderr, flush=True)
    learn = not args.freeze_depth
    logs = train_macarons_online(
        assets, state, params=params, n_poses=args.poses, seed=args.seed,
        use_perfect_depth=True, learn_depth=learn,
        unfreeze_depth_after=args.unfreeze_after,
        depth_reject_factor=args.reject_factor, log_depth_error=True,
        verbose=True)
    dl = logs["depth_loss"]
    de = logs["depth_abs_err"]
    k = max(3, len(dl) // 5)
    summary = {
        "poses": args.poses,
        "photometric_first": round(_mean(dl[:k]), 5),
        "photometric_last": round(_mean(dl[-k:]), 5),
        "depth_abs_err_first": round(_mean(de[:k]), 4),
        "depth_abs_err_last": round(_mean(de[-k:]), 4),
        "coverage_perfect_depth": round(logs["coverage"][-1], 4),
        # The mapping store is fed by zbuf_used: this is the number that
        # actually moves when predicted depth replaces the rendered zbuf.
        "store_coverage_perfect_depth": round(
            logs["store_coverage"][-1], 4),
        "unfreeze_after": args.unfreeze_after,
        "depth_lr": args.depth_lr,
        "depth_clip": args.depth_clip,
        "reject_factor": args.reject_factor,
        "rejected_updates": len(logs.get("depth_rejected_poses", [])),
    }
    print(f"# phase1: {summary}", file=sys.stderr, flush=True)

    # Phase 2: SAME trained depth weights drive the mapping
    # (use_perfect_depth=False) on the same scene/seed; coverage vs the
    # perfect-depth curve isolates what predicted depth costs the mapper.
    logs_pred = train_macarons_online(
        assets, state, params=params, n_poses=args.poses, seed=args.seed,
        use_perfect_depth=False, learn_depth=learn,
        unfreeze_depth_after=args.unfreeze_after,
        depth_reject_factor=args.reject_factor, log_depth_error=True,
        verbose=True)
    summary["coverage_predicted_depth"] = round(logs_pred["coverage"][-1], 4)
    summary["store_coverage_predicted_depth"] = round(
        logs_pred["store_coverage"][-1], 4)
    summary["depth_abs_err_predicted_run"] = round(
        _mean(logs_pred["depth_abs_err"][-k:]), 4)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"summary": summary,
                   "photometric_curve": [round(x, 5) for x in dl],
                   "depth_abs_err_curve": [round(x, 4) for x in de],
                   "coverage_perfect": [round(x, 4)
                                        for x in logs["coverage"]],
                   "coverage_predicted": [round(x, 4)
                                          for x in logs_pred["coverage"]],
                   "store_coverage_perfect": [
                       round(x, 4) for x in logs["store_coverage"]],
                   "store_coverage_predicted": [
                       round(x, 4) for x in logs_pred["store_coverage"]]},
                  f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
