#!/usr/bin/env python
"""Roofline/MFU accounting for the scan-rollout step (VERDICT r3 weak #7).

Compiles the rollout step (and its ablated variants) and reads XLA's own
``compiled.cost_analysis()`` — flops and bytes accessed — then combines
them with measured wall-clock per pose to place the step on the v5e
roofline:

    MFU   = (flops / pose) / (wall_s / pose) / PEAK_FLOPS
    HBM%  = (bytes / pose) / (wall_s / pose) / PEAK_HBM_BW

The flop/byte counts are an XLA estimate of the COMPILED program (post
fusion), not a hand model; they are the same numbers the XLA profiler
reports. Run on the TPU for real timings; `--analyze-only` (any backend,
including CPU) prints just the static counts.

Peak numbers: TPU v5e (lite) — 197 TFLOP/s bf16, 819 GB/s HBM
(public v5e spec; the bench chip reports 'TPU v5 lite').
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nextbestpath_tpu.utils.jaxcache import enable_cache  # noqa: E402

enable_cache()

PEAK_FLOPS = 197e12   # bf16, TPU v5e per chip
PEAK_HBM = 819e9      # bytes/s, TPU v5e per chip


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--poses", type=int, default=200,
                    help="long run separates per-pose cost from per-run "
                         "dispatch (the pending round-3 200-pose profile)")
    ap.add_argument("--segment", type=int, default=25)
    ap.add_argument("--analyze-only", action="store_true",
                    help="static cost analysis only (no timed run)")
    ap.add_argument("--ckpt", default="weights/nbp/nbp_best_val.ckpt")
    ap.add_argument("--out", default="data/mfu_estimate.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nextbestpath_tpu.assets import generate_scene, pack_generated_scene
    from nextbestpath_tpu.config import default_params
    from nextbestpath_tpu.eval.scan_rollout import ScanRollout
    from nextbestpath_tpu.models import NBP
    from nextbestpath_tpu.utils.checkpoint import load_checkpoint

    params = default_params()
    params.update(stratified_sampling=True)
    assets = pack_generated_scene(generate_scene("simple", seed=8),
                                  params=params)
    model = NBP(dtype=jnp.bfloat16)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 5)))
    if os.path.exists(args.ckpt):
        variables, _, ep, _ = load_checkpoint(args.ckpt, variables)
        print(f"# loaded {args.ckpt} (epoch {ep})", file=sys.stderr,
              flush=True)

    rollout = ScanRollout(assets, model, variables, params=params)

    # ---- static analysis: lower + compile ONE segment program and read
    # XLA's cost model. The segment scans `seg` poses, so per-pose = /seg.
    seg = args.segment
    fn = rollout._segment_fn(seg)
    state = rollout.initial_state(seed=8, n_poses=args.poses)
    v = rollout.variables
    lowered = fn.lower(rollout.scene, v, state, jnp.int32(0))
    compiled = lowered.compile()
    ca_list = compiled.cost_analysis()
    ca = ca_list[0] if isinstance(ca_list, (list, tuple)) else ca_list
    flops_seg = float(ca.get("flops", 0.0))
    bytes_seg = float(ca.get("bytes accessed", 0.0))
    report = {
        "segment_len": seg,
        "flops_per_pose": flops_seg / seg,
        "bytes_per_pose": bytes_seg / seg,
        "arithmetic_intensity": (flops_seg / bytes_seg
                                 if bytes_seg else None),
        "backend": jax.default_backend(),
    }
    print(f"# XLA cost analysis: {flops_seg / seg / 1e9:.2f} GFLOP/pose, "
          f"{bytes_seg / seg / 1e9:.3f} GB/pose, "
          f"AI = {flops_seg / max(bytes_seg, 1):.1f} flop/byte",
          flush=True)

    if not args.analyze_only:
        # Timed long run (amortizes per-run dispatch); segments keep each
        # device execution short (tunnel watchdog, round-4 bisect).
        rollout.run(n_poses=2 * seg, seed=8, segment_len=seg)  # warmup
        t0 = time.time()
        res = rollout.run(n_poses=args.poses, seed=9, segment_len=seg)
        wall = time.time() - t0
        s_per_pose = wall / args.poses
        mfu = report["flops_per_pose"] / s_per_pose / PEAK_FLOPS
        hbm = report["bytes_per_pose"] / s_per_pose / PEAK_HBM
        report.update({
            "poses": args.poses,
            "poses_per_sec": args.poses / wall,
            "ms_per_pose": 1e3 * s_per_pose,
            "mfu": mfu,
            "hbm_utilization": hbm,
            "final_coverage": res.coverage_evolution[-1],
        })
        print(f"# {args.poses} poses in {wall:.2f}s = "
              f"{args.poses / wall:.1f} poses/s "
              f"({1e3 * s_per_pose:.1f} ms/pose)", flush=True)
        print(f"# MFU = {100 * mfu:.2f}%   HBM util = {100 * hbm:.1f}% "
              f"(v5e peaks: 197 TF bf16, 819 GB/s)", flush=True)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
