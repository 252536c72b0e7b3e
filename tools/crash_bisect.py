#!/usr/bin/env python
"""Bisect the batched-101-pose TPU worker crash (VERDICT r3 weak #3).

Round-3 observation: the 8-scene 101-pose BatchedScanRollout repeatably
crashed the TPU worker through the axon tunnel ("kernel fault") while the
same scenes at 40 poses and single-scene 101-pose programs ran fine.

Competing hypotheses this tool separates:
  (a) per-execution DURATION: the tunnel kills executions past a wall-clock
      watchdog — onset should track wall time, and a long SINGLE-scene
      program (--mode single-long) should crash the same way;
  (b) batched-program specific (Pallas kernel under vmap, memory): onset
      should track the batch config regardless of wall time, and stage
      ablations (--ablate) should move it.

Each trial prints one JSON line; on a worker crash the process dies, so the
last printed line identifies the failing config. Run trials ascending.

Usage:
  python tools/crash_bisect.py --mode batched --scenes 8 --poses 40,60,80,101
  python tools/crash_bisect.py --mode single-long --poses 2000,5000
  python tools/crash_bisect.py --mode batched --scenes 8 --poses 101 \
      --ablate coverage
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["batched", "single-long"],
                    default="batched")
    ap.add_argument("--scenes", type=int, default=8)
    ap.add_argument("--poses", default="40,60,80,101")
    ap.add_argument("--difficulty", default="simple")
    ap.add_argument("--seed", type=int, default=8)
    ap.add_argument("--ablate", default="",
                    help="comma list: coverage,plan,observe,moves,logic,rng")
    ap.add_argument("--segment", type=int, default=None,
                    help="segment_len. Default None = the production "
                         "AUTO-segmentation (25-pose segments past 50 "
                         "poses — the round-5 watchdog fix under test); "
                         "pass 0 to force a MONOLITHIC program and "
                         "reproduce the original duration crash")
    args = ap.parse_args()

    from nextbestpath_tpu.utils.jaxcache import enable_cache

    enable_cache(verbose=True)

    import jax
    import jax.numpy as jnp

    from nextbestpath_tpu.assets import generate_scene, pack_generated_scene
    from nextbestpath_tpu.assets.scene_assets import pad_assets_to_common
    from nextbestpath_tpu.config import default_params
    from nextbestpath_tpu.eval.scan_rollout import (BatchedScanRollout,
                                                    ScanRollout)
    from nextbestpath_tpu.models import NBP
    from nextbestpath_tpu.utils.checkpoint import load_checkpoint

    ablate = tuple(a for a in args.ablate.split(",") if a)
    params = default_params()
    params.update(stratified_sampling=True)
    n_scenes = args.scenes if args.mode == "batched" else 1
    assets = pad_assets_to_common([
        pack_generated_scene(generate_scene(args.difficulty,
                                            seed=args.seed + i),
                             params=params)
        for i in range(n_scenes)
    ])
    model = NBP(dtype=jnp.bfloat16)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 5)))
    ckpt = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "weights", "nbp", "nbp_best_val.ckpt")
    if os.path.exists(ckpt):
        variables, _, _, _ = load_checkpoint(ckpt, variables)

    for n_poses in [int(x) for x in args.poses.split(",")]:
        t0 = time.time()
        if args.mode == "batched":
            r = BatchedScanRollout(assets, model, variables, params=params)
            if ablate:
                for ro in r.rollouts:
                    ro.ablate = ablate
            print(f"# trial batched x{n_scenes} poses={n_poses} "
                  f"ablate={ablate} (compiling)", file=sys.stderr, flush=True)
            res = r.run(n_poses=n_poses, seed=args.seed + 100,
                        segment_len=args.segment)
            covs = [round(x.coverage_evolution[-1], 4) for x in res]
            wall = res[0].wall_time_s
        else:
            r = ScanRollout(assets[0], model, variables, params=params,
                            ablate=ablate)
            print(f"# trial single poses={n_poses} ablate={ablate} "
                  "(compiling)", file=sys.stderr, flush=True)
            res = r.run(n_poses=n_poses, seed=args.seed + 100,
                        segment_len=args.segment)
            covs = [round(res.coverage_evolution[-1], 4)]
            wall = res.wall_time_s
        print(json.dumps({
            "mode": args.mode, "scenes": n_scenes, "poses": n_poses,
            "ablate": list(ablate), "exec_wall_s": round(wall, 2),
            "total_wall_s": round(time.time() - t0, 2),
            "final_cov": covs, "ok": True,
        }), flush=True)


if __name__ == "__main__":
    main()
