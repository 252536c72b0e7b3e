#!/usr/bin/env python
"""Tiny end-to-end smoke of run_training_nbp_scan (CPU-friendly sizes).

Exercises: scan collection -> db shards -> validation split -> inner training
-> best-val checkpoint -> batched held-out eval -> resume from checkpoint.
"""

import os
import shutil
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # ambient env says axon; force CPU

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nextbestpath_tpu.utils.jaxcache import enable_cache  # noqa: E402

enable_cache()

from nextbestpath_tpu.assets import generate_scene, pack_generated_scene
from nextbestpath_tpu.assets.scene_assets import pad_assets_to_common
from nextbestpath_tpu.config import default_params
from nextbestpath_tpu.train.driver import run_training_nbp_scan

TMP = "/tmp/smoke_scan_trainer"


def main():
    shutil.rmtree(TMP, ignore_errors=True)
    params = default_params(
        image_height=32, image_width=56, points_per_frame=256,
        full_pc_capacity=32768, n_gt_surface_points=1024, max_path_len=32,
        pc2img_size=[64, 64], value_map_size=[16, 16], nbp_batch_size=8,
    )
    scenes = pad_assets_to_common([
        pack_generated_scene(generate_scene("simple", seed=s), params=params)
        for s in (0, 1)
    ])
    eval_scenes = pad_assets_to_common([
        pack_generated_scene(generate_scene("simple", seed=500),
                             params=params)
    ])
    kw = dict(
        scenes=scenes, eval_scenes=eval_scenes, params=params,
        n_poses=8, db_dir=f"{TMP}/db", weights_dir=f"{TMP}/weights",
        log_dir=f"{TMP}/log", seed=8, eval_every=2, eval_poses=4,
    )
    run_training_nbp_scan(epochs=3, **kw)
    print("=== resume ===")
    run_training_nbp_scan(epochs=4, resume=True, **kw)
    print("SMOKE OK")


if __name__ == "__main__":
    main()
