"""Head-to-head: trained NBP planner vs random-walk baseline on one scene.

The reference's headline benchmark shape: coverage evolution + AUC at a fixed
pose budget (test_nbp_planning.py vs random_walk_planning.py). Writes a
comparison JSON + coverage-curve plot.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, "/root/repo")

from nextbestpath_tpu.utils.jaxcache import enable_cache  # noqa: E402

enable_cache()

import jax
import jax.numpy as jnp

from nextbestpath_tpu.assets import generate_scene, pack_generated_scene
from nextbestpath_tpu.config import default_params
from nextbestpath_tpu.eval import random_walk_rollout
from nextbestpath_tpu.eval.scan_rollout import ScanRollout
from nextbestpath_tpu.models import NBP
from nextbestpath_tpu.utils.checkpoint import load_checkpoint
from nextbestpath_tpu.utils.plotting import plot_coverage_curves

ap = argparse.ArgumentParser()
ap.add_argument("--weights", default="weights/nbp/nbp_best_val.ckpt")
ap.add_argument("--difficulty", default="simple")
ap.add_argument("--scene-seed", type=int, default=8)
ap.add_argument("--poses", type=int, default=40)
ap.add_argument("--out", default="data/compare_nbp_vs_random.json")
args = ap.parse_args()

params = default_params()
assets = pack_generated_scene(
    generate_scene(args.difficulty, seed=args.scene_seed), params=params)

model = NBP()
variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
    jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 5)))
tag = "random-init"
if os.path.exists(args.weights):
    variables, _, epoch, _ = load_checkpoint(args.weights, variables)
    tag = f"trained(e{epoch})"
print(f"# NBP weights: {tag}", flush=True)

rollout = ScanRollout(assets, model, variables, params=params)
nbp_res = rollout.run(n_poses=args.poses, seed=123)
print(f"# NBP: final {nbp_res.coverage_evolution[-1]:.4f} "
      f"auc {nbp_res.auc:.4f} ({nbp_res.steps_per_sec:.1f} poses/s)",
      flush=True)

rw_res = random_walk_rollout(assets, params=params, n_poses=args.poses,
                             seed=123)
print(f"# RW:  final {rw_res.coverage_evolution[-1]:.4f} "
      f"auc {rw_res.auc:.4f}", flush=True)

os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
with open(args.out, "w") as f:
    json.dump({
        "weights": tag,
        "scene": assets.name,
        "poses": args.poses,
        "nbp": {"coverage_evolution": nbp_res.coverage_evolution,
                "auc": nbp_res.auc,
                "steps_per_sec": nbp_res.steps_per_sec},
        "random_walk": {"coverage_evolution": rw_res.coverage_evolution,
                        "auc": rw_res.auc},
    }, f)
plot_coverage_curves(
    {"nbp": nbp_res.coverage_evolution,
     "random_walk": rw_res.coverage_evolution},
    os.path.splitext(args.out)[0] + ".png",
)
print(json.dumps({"nbp_auc": round(nbp_res.auc, 4),
                  "rw_auc": round(rw_res.auc, 4)}))
