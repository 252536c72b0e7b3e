"""Epoch driver for NBP training (run_training_nbp,
next_best_path/trainers/train_nbp_model.py:40-158).

Epoch 0 only collects rollouts and extracts the validation split
(:112-114); epochs >= 1 collect then train (:116-118). Checkpoints: best-val
+ every save_model_every_n_epoch epochs (:124-149); loss log JSON (:152-157).
"""

from __future__ import annotations

import json
import os
import time
from typing import List, Optional, Sequence

import jax

from ..assets.scene_assets import SceneAssets
from ..config import Params, default_params
from ..models.unet import NBP
from ..utils.checkpoint import save_checkpoint
from .collection import collect_trajectory
from .replay import ReplayDB
from .train_nbp import TrainState, init_train_state, train_nbp


def run_training_nbp(
    scenes: Sequence[SceneAssets],
    params: Optional[Params] = None,
    epochs: int = 100,
    n_poses: int = 100,
    db_path: Optional[str] = None,
    weights_dir: str = "weights/nbp",
    log_dir: str = "training_log",
    model_tag: str = "nbp",
    seed: int = 8,
    verbose: bool = True,
    interpret: Optional[bool] = None,
) -> TrainState:
    p = params or default_params()
    model = NBP()
    state = init_train_state(model, jax.random.PRNGKey(seed),
                             lr=float(p.nbp_lr))
    db = ReplayDB(db_path)
    validation_data: List = []
    best_val = float("inf")
    log = {"train": [], "val": [], "coverage_after_trajectory": []}

    for epoch in range(epochs):
        t0 = time.time()
        if verbose:
            print(f"=== epoch {epoch} ===")
        for i, assets in enumerate(scenes):
            cov = collect_trajectory(
                assets, model, state.variables, db, params=p,
                seed=seed * 1000 + epoch * len(scenes) + i,
                n_poses=n_poses, interpret=interpret, verbose=False,
            )
            log["coverage_after_trajectory"].append(cov[-1] if cov else 0.0)
            if verbose:
                print(f"  collected {assets.name}: final coverage "
                      f"{cov[-1] if cov else 0:.4f}, db size {len(db)}")

        if epoch == 0:
            validation_data = db.extract_validation(num=1200)
            if verbose:
                print(f"  validation split: {len(validation_data)} entries")
        else:
            state, tl, vl = train_nbp(model, state, db, validation_data,
                                      current_epoch=epoch, params=p,
                                      verbose=verbose)
            log["train"].append(tl)
            log["val"].append(vl)
            if vl < best_val:
                best_val = vl
                save_checkpoint(
                    os.path.join(weights_dir, f"{model_tag}_best_val.ckpt"),
                    state.variables, epoch=epoch,
                )
            if epoch % int(p.save_model_every_n_epoch) == 0:
                save_checkpoint(
                    os.path.join(weights_dir, f"{model_tag}_epoch_{epoch}.ckpt"),
                    state.variables, epoch=epoch,
                )
            os.makedirs(log_dir, exist_ok=True)
            with open(os.path.join(log_dir, f"{model_tag}_loss.json"), "w") as f:
                json.dump(log, f)
        if db_path:
            db.save()
        if verbose:
            print(f"  epoch wall time {time.time() - t0:.1f}s")
    return state
