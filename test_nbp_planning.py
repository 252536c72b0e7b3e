#!/usr/bin/env python
"""NBP planning evaluation CLI (analog of the reference's test_nbp_planning.py).

Usage: python test_nbp_planning.py --procgen simple --poses 101 \
           [--weights weights/nbp/nbp_best_val.ckpt] [--out results.json]
"""

import argparse
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", default=None)
    ap.add_argument("--procgen", default="simple")
    ap.add_argument("--scene-dirs", default=None)
    ap.add_argument("--weights", default=None)
    ap.add_argument("--poses", type=int, default=101)
    ap.add_argument("--seed", type=int, default=8)
    ap.add_argument("--out", default="data/nbp_results.json")
    ap.add_argument("--quick", action="store_true",
                    help="small camera/buffers for smoke runs")
    ap.add_argument("--scan", action="store_true",
                    help="use the fully-jitted lax.scan rollout (fast path; "
                         "one compile per scene shape)")
    args = ap.parse_args()

    from nextbestpath_tpu.utils.jaxcache import enable_cache

    enable_cache()

    import jax
    import jax.numpy as jnp

    from nextbestpath_tpu.config import default_params, load_params
    from nextbestpath_tpu.assets import (generate_scene, load_scene_dir,
                                         pack_generated_scene)
    from nextbestpath_tpu.eval import test_nbp_planning
    from nextbestpath_tpu.models import NBP
    from nextbestpath_tpu.utils.checkpoint import load_checkpoint

    params = load_params(args.config) if args.config else default_params()
    for k in ("pc2img_size", "prediction_range", "value_map_size", "n_pieces",
              "full_pc_capacity", "points_per_frame", "max_path_len",
              "fov_degrees", "camera_znear"):
        if k not in params:
            params.update(**{k: default_params().get(k)})
    if args.quick:
        params.update(image_height=64, image_width=114, points_per_frame=1024,
                      full_pc_capacity=262144, n_gt_surface_points=4096)

    def scenes_from_spec(spec: str, base_seed: int):
        """Config test_scenes entry: 'procgen:<difficulty>:<count>' generates
        held-out scenes (seed offset 900); anything else is a reference-format
        scene directory (possibly relative to dataset_path)."""
        if spec.startswith("procgen:"):
            parts = spec.split(":")
            diff = parts[1]
            count = int(parts[2]) if len(parts) > 2 else 1
            return [
                pack_generated_scene(
                    generate_scene(diff, seed=base_seed + 900 + k),
                    params=params)
                for k in range(count)
            ]
        root = params.get("dataset_path", ".")
        path = spec if os.path.isdir(spec) else os.path.join(root, spec)
        return [load_scene_dir(path, params=params)]

    scenes = []
    if args.scene_dirs:
        for d in args.scene_dirs.split(","):
            scenes.append(load_scene_dir(d, params=params))
    elif args.config and params.get("test_scenes"):
        for spec in params.get("test_scenes"):
            scenes.extend(scenes_from_spec(spec, args.seed))
    else:
        for i, diff in enumerate(args.procgen.split(",")):
            scenes.append(pack_generated_scene(
                generate_scene(diff.strip(), seed=args.seed + i), params=params))

    if args.config and params.get("results_json_name") and \
            args.out == "data/nbp_results.json":
        args.out = os.path.join("data", params.get("results_json_name"))

    model = NBP(dtype=jnp.bfloat16)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 5)))
    weights = args.weights or (params.get("nbp_weights")
                               if args.config else None)
    if not weights and os.path.exists("weights/nbp/nbp_best_val.ckpt"):
        weights = "weights/nbp/nbp_best_val.ckpt"
    if weights and os.path.exists(weights):
        variables, _, epoch, _ = load_checkpoint(weights, variables)
        print(f"# loaded {weights} (epoch {epoch})")
    elif weights:
        print(f"# WARNING: weights {weights} not found, using random init")

    if args.scan:
        import json as _json
        import os as _os

        from nextbestpath_tpu.eval.scan_rollout import ScanRollout

        results = {}
        for assets in scenes:
            rollout = ScanRollout(assets, model, variables, params=params)
            res = rollout.run(n_poses=args.poses, seed=args.seed)
            results[assets.name] = {
                "coverage_evolution": res.coverage_evolution,
                "auc": res.auc,
                "cam_positions": res.cam_positions.tolist(),
                "wall_time_s": res.wall_time_s,
                "steps_per_sec": res.steps_per_sec,
            }
            print(f"{assets.name}: final coverage "
                  f"{res.coverage_evolution[-1]:.4f} auc {res.auc:.4f} "
                  f"({res.steps_per_sec:.2f} poses/s)")
        _os.makedirs(_os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            _json.dump(results, f)
    else:
        test_nbp_planning(scenes, model, variables, params=params,
                          n_poses=args.poses, results_path=args.out,
                          seed=args.seed)


if __name__ == "__main__":
    main()
