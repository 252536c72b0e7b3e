#!/usr/bin/env python
"""Benchmark: NBP eval-rollout env-steps/sec on the available accelerator.

Prints ONE JSON line:
    {"metric": "env_steps_per_sec", "value": N, "unit": "poses/s",
     "vs_baseline": N / REFERENCE_POSES_PER_SEC}

REFERENCE_POSES_PER_SEC is the reference pipeline's estimated throughput on
its own hardware (BASELINE.md: the repo publishes no numbers; the reference
renders 5 PyTorch3D frames + per-candidate host Dijkstra per pose — measured
runs of comparable PyTorch3D pipelines land near ~0.5 poses/s, used here as
the provisional denominator until the reference can be timed directly).
"""

import argparse
import json
import os
import sys
import time

REFERENCE_POSES_PER_SEC = 0.5


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--poses", type=int, default=30)
    ap.add_argument("--warmup-poses", type=int, default=3)
    ap.add_argument("--difficulty", default="simple")
    ap.add_argument("--quick", action="store_true",
                    help="small camera + few poses (CI smoke)")
    ap.add_argument("--batch", type=int, default=1,
                    help="number of scenes rolled out in parallel (vmap)")
    ap.add_argument("--seed", type=int, default=8)
    # The HEADLINE mode is the reference-faithful iid pixel gather
    # (compute_partial_point_cloud, macarons_utils.py:2811-2847): since the
    # round-4 pinhole-kernel work it is both the parity mode and the faster
    # one (BENCH_r04: faithful 50.20 > stratified 46.46 poses/s), so the
    # contract `value` now measures it (VERDICT r4 weak #5). Stratified
    # sampling (one random valid pixel per stratum — O(n) masked argmin,
    # delta documented in sim/sensor.py) is recorded as the secondary
    # `stratified_value` field; --stratified swaps the two roles back.
    ap.add_argument("--stratified", action="store_true", default=False,
                    help="use stratified sampling as the PRIMARY headline "
                         "(default: reference-faithful iid gather)")
    # The contract line additionally carries the other sampling mode so
    # every round's BENCH_r*.json records both; --no-secondary skips the
    # second program.
    ap.add_argument("--secondary", action="store_true", default=True)
    ap.add_argument("--no-secondary", dest="secondary", action="store_false")
    # Opt-in batched substep capture (sim/rollout.py move_and_capture
    # batched=True): fused append, no scan carry; selection-identical,
    # one-ulp float delta. Benchmark mode only.
    ap.add_argument("--batched-capture", action="store_true", default=False)
    args = ap.parse_args()

    import jax

    # Persistent cache scoped by the live runtime fingerprint (libtpu build
    # etc.) so a stale AOT executable from an older build can never load
    # (utils/jaxcache.py; MULTICHIP_r02.json failure mode).
    from nextbestpath_tpu.utils.jaxcache import enable_cache

    enable_cache(verbose=True)

    from nextbestpath_tpu.assets import generate_scene, pack_generated_scene
    from nextbestpath_tpu.config import default_params
    from nextbestpath_tpu.eval import NBPPlanningRollout
    from nextbestpath_tpu.eval.scan_rollout import BatchedScanRollout, ScanRollout
    from nextbestpath_tpu.models import NBP
    import jax.numpy as jnp

    if args.quick:
        params = default_params(image_height=64, image_width=114,
                                points_per_frame=1024,
                                full_pc_capacity=262144,
                                n_gt_surface_points=4096)
        poses = min(args.poses, 10)
    else:
        params = default_params()
        poses = args.poses
    if args.stratified:
        params.update(stratified_sampling=True)
    if args.batched_capture:
        params.update(batched_capture=True)

    all_assets = [
        pack_generated_scene(generate_scene(args.difficulty,
                                            seed=args.seed + i),
                             params=params)
        for i in range(args.batch)
    ]
    assets = all_assets[0]
    # bf16 conv compute (the reference trains under fp16 AMP,
    # nbp_utils.py:342-345); BatchNorm and outputs stay f32.
    model = NBP(dtype=jnp.bfloat16)
    # Jit the init: eager flax init dispatches each conv separately, which is
    # minutes-slow over the remote-TPU tunnel.
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 5)))
    ckpt = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "weights", "nbp", "nbp_best_val.ckpt")
    if os.path.exists(ckpt):
        # The benchmark measures the TRAINED workload (the plan branch's
        # frequency is regeneration-dependent, so the policy matters).
        from nextbestpath_tpu.utils.checkpoint import load_checkpoint

        variables, _, epoch, _ = load_checkpoint(ckpt, variables)
        print(f"# loaded trained weights {ckpt} (epoch {epoch})",
              file=sys.stderr, flush=True)
    else:
        # Fallback: free-space-optimistic init. An untrained obstacle
        # decoder outputs sigmoid(~0) = 0.5 >= threshold 0.13 ('everything
        # blocked'), so the agent would only rotate in place; biasing the
        # final conv to -4 opens the layout so the benchmark still
        # exercises the full navigate+plan path.
        print(f"# WARNING: {ckpt} missing — benchmarking a biased-init "
              "(untrained) policy", file=sys.stderr, flush=True)
        params_dict = dict(variables["params"])
        params_dict["final2"]["Conv_0"]["bias"] = (
            params_dict["final2"]["Conv_0"]["bias"] - 4.0
        )
        variables = dict(variables)
        variables["params"] = params_dict

    # Fully-jitted scan rollout (one device program per rollout); vmapped
    # over scenes when --batch > 1.
    print("# init done, building scan rollout", file=sys.stderr, flush=True)
    def warmup(r):
        """First compile, with one cold retry: if a poisoned persistent-cache
        entry fails to load (AOT/libtpu/machine-feature skew), disable the
        cache, clear in-memory caches and recompile from scratch."""
        try:
            r.run(n_poses=poses, seed=args.seed)
        except Exception as e:  # noqa: BLE001 — retry cold on any load skew
            print(f"# warmup failed ({type(e).__name__}: {e}); retrying with "
                  "persistent compilation cache disabled", file=sys.stderr,
                  flush=True)
            jax.config.update("jax_compilation_cache_dir", None)
            jax.clear_caches()
            r.run(n_poses=poses, seed=args.seed)

    if args.batch > 1:
        rollout = BatchedScanRollout(all_assets, model, variables,
                                     params=params)
        print("# batched rollout constructed; warmup (compiles)",
              file=sys.stderr, flush=True)
        warmup(rollout)
        print("# warmup done", file=sys.stderr, flush=True)
        res = rollout.run(n_poses=poses, seed=args.seed + 100)[0]
    else:
        rollout = ScanRollout(assets, model, variables, params=params)
        print("# scan rollout constructed; warmup (compiles)", file=sys.stderr,
              flush=True)
        warmup(rollout)  # compile + warmup
        print("# warmup done", file=sys.stderr, flush=True)
        res = rollout.run(n_poses=poses, seed=args.seed + 1)

    value = res.steps_per_sec
    line = {
        "metric": "env_steps_per_sec",
        "value": round(value, 4),
        "unit": "poses/s",
        "vs_baseline": round(value / REFERENCE_POSES_PER_SEC, 4),
    }

    # Second measurement in the OTHER sampling mode so the per-round record
    # carries both (BASELINE.md round-4/5 policy). Same scene, weights and
    # protocol; only the subsampler differs, so the delta is the sampling
    # mode itself. The two modes also measure visibly different coverage on
    # the bench scene (the sampling statistics change which pixels seed the
    # map) — the coverage lines on stderr record both.
    if args.secondary and args.batch == 1:
        from nextbestpath_tpu.config import Params

        params_f = Params(params.as_dict(), flatten=False)
        params_f.update(stratified_sampling=not args.stratified)
        tag = "stratified" if not args.stratified else "faithful"
        rollout_f = ScanRollout(assets, model, variables, params=params_f)
        print(f"# secondary ({tag}-sampling) rollout constructed; warmup",
              file=sys.stderr, flush=True)
        warmup(rollout_f)
        res_f = rollout_f.run(n_poses=poses, seed=args.seed + 1)
        line[f"{tag}_value"] = round(res_f.steps_per_sec, 4)
        line[f"{tag}_vs_baseline"] = round(
            res_f.steps_per_sec / REFERENCE_POSES_PER_SEC, 4)
        print(f"# {tag} coverage final={res_f.coverage_evolution[-1]:.4f} "
              f"auc={res_f.auc:.4f}", file=sys.stderr)

    print(json.dumps(line))
    # Secondary detail on stderr (not part of the contract line).
    print(f"# coverage final={res.coverage_evolution[-1]:.4f} "
          f"auc={res.auc:.4f} points={res.n_points} "
          f"wall={res.wall_time_s:.1f}s backend={jax.default_backend()}",
          file=sys.stderr)


def _is_transient_backend_failure(e: BaseException) -> bool:
    msg = f"{type(e).__name__}: {e}"
    return ("UNAVAILABLE" in msg or "crashed or restarted" in msg
            or "DEADLINE_EXCEEDED" in msg)


if __name__ == "__main__":
    # The tunneled TPU worker occasionally crashes mid-run (observed
    # 2026-08-19: "UNAVAILABLE: TPU worker process crashed or restarted").
    # After that the in-process JAX client is dead, so recovery = re-exec
    # the whole benchmark, bounded to 2 retries via an env marker.
    try:
        main()
    except Exception as e:  # noqa: BLE001 — classify, then re-exec or re-raise
        retries = int(os.environ.get("_BENCH_TRANSIENT_RETRY", "0"))
        if _is_transient_backend_failure(e) and retries < 2:
            print(f"# transient backend failure ({type(e).__name__}); "
                  f"re-exec attempt {retries + 1}/2 in 30s", file=sys.stderr,
                  flush=True)
            time.sleep(30)
            os.environ["_BENCH_TRANSIENT_RETRY"] = str(retries + 1)
            os.execv(sys.executable, [sys.executable] + sys.argv)
        raise
