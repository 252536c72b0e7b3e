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
import numpy as np

from ..assets.scene_assets import SceneAssets
from ..config import Params, default_params
from ..models.unet import NBP
from ..utils.checkpoint import load_checkpoint, save_checkpoint
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
                                      seed=seed * 131 + epoch,
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


def run_training_nbp_scan(
    scenes: Sequence[SceneAssets],
    eval_scenes: Optional[Sequence[SceneAssets]] = None,
    params: Optional[Params] = None,
    epochs: int = 100,
    n_poses: int = 100,
    db_dir: Optional[str] = None,
    weights_dir: str = "weights/nbp",
    log_dir: str = "training_log",
    model_tag: str = "nbp",
    seed: int = 8,
    verbose: bool = True,
    resume: bool = False,
    eval_every: int = 3,
    eval_poses: int = 40,
    max_wall_s: Optional[float] = None,
    interpret: Optional[bool] = None,
    init_from: Optional[str] = None,
) -> TrainState:
    """Reference-scale NBP training on the scan-collection fast path.

    Same recipe as run_training_nbp (epoch-0 collect + validation split,
    5 inner epochs, plateau LR, best-val checkpoints — train_nbp_model.py
    :92-157) but with: fully-jitted collection rollouts (one program for all
    same-shape scenes), bf16 U-Net compute (the reference trains under fp16
    AMP, nbp_utils.py:342-345), periodic held-out scan evaluation, full
    optimizer-state checkpointing, and chunked resume (--resume restarts
    from the latest checkpoint + on-disk replay shards — the process can be
    killed between epochs without losing the run).
    """
    import jax.numpy as jnp

    from ..eval.scan_rollout import BatchedScanRollout
    from .scan_collection import ScanCollection, collect_trajectory_scan

    p = params or default_params()
    model = NBP(dtype=jnp.bfloat16)
    state = init_train_state(model, jax.random.PRNGKey(seed),
                             lr=float(p.nbp_lr))
    if init_from and os.path.exists(init_from):
        # Warm start: seed the variables (not the optimizer) from a prior
        # checkpoint. Used after a machine restart wipes the resume state
        # (latest.ckpt + replay shards) but a committed best-val survives:
        # the run restarts at epoch 0 (fresh collection + validation split)
        # with a policy that already explores well.
        import dataclasses as _dc
        variables, _, ck_epoch, _ = load_checkpoint(init_from, state.variables)
        state = _dc.replace(state, variables=variables)
        if verbose:
            print(f"warm start from {init_from} (saved at epoch {ck_epoch})")
    collection = ScanCollection(scenes, model, params=p, interpret=interpret)
    evaluator = None
    if eval_scenes:
        evaluator = BatchedScanRollout(eval_scenes, model, state.variables,
                                       params=p, interpret=interpret)

    db = ReplayDB()
    validation_data: List = []
    best_val = float("inf")
    best_auc = float("-inf")
    start_epoch = 0
    db_high_water = 0
    log = {"train": [], "val": [], "coverage_after_trajectory": [],
           "eval_auc": []}

    latest_path = os.path.join(weights_dir, f"{model_tag}_latest.ckpt")
    val_path = os.path.join(db_dir, "validation.npz") if db_dir else None
    log_path = os.path.join(log_dir, f"{model_tag}_loss.json")

    if resume and os.path.exists(latest_path):
        variables, opt_state, epoch, extra = load_checkpoint(
            latest_path, state.variables, state.opt_state)
        import dataclasses as _dc
        import jax.numpy as _jnp

        # Clamp the resumed LR: the plateau scheduler can decay it to
        # nothing on a noisy validation set; a resumed run gets at least
        # resume_min_lr back (the scheduler will re-decay if warranted).
        resume_min_lr = 1e-4
        lr = max(float(extra.get("lr", state.lr)), resume_min_lr)
        opt_state.inner_opt_state.hyperparams["learning_rate"] = (
            _jnp.asarray(lr))
        state = _dc.replace(state, variables=variables, opt_state=opt_state,
                            lr=lr)
        best_val = float(extra.get("best_val", best_val))
        best_auc = float(extra.get("best_auc", best_auc))
        start_epoch = int(epoch) + 1
        if not db_dir:
            raise ValueError(
                "resume=True needs db_dir: resuming past epoch 0 with an "
                "empty replay DB cannot train")
        # Only shards from epochs the checkpoint has seen are valid; later
        # ones are leftovers from a longer previous run (or an epoch whose
        # checkpoint never landed) — delete them so neither this resume nor
        # a later one mixes stale off-policy data into the store.
        for fname in sorted(os.listdir(db_dir)) if os.path.isdir(db_dir) else []:
            if fname.startswith("epoch_") and fname.endswith(".npz"):
                try:
                    shard_epoch = int(fname[len("epoch_"):-len(".npz")])
                except ValueError:
                    continue
                if shard_epoch > int(epoch):
                    os.remove(os.path.join(db_dir, fname))
                    if verbose:
                        print(f"resume: deleted stale shard {fname} "
                              f"(> checkpoint epoch {int(epoch)})")
        db_high_water = db.load_dir(db_dir, max_epoch=int(epoch))
        if val_path and os.path.exists(val_path):
            val_db = ReplayDB()
            val_db.load(val_path)
            validation_data = val_db.entries
        else:
            raise ValueError(
                f"resume=True but the validation split {val_path} is "
                "missing: an empty validation set returns loss 0.0 and "
                "would clobber the best-val checkpoint every epoch")
        if os.path.exists(log_path):
            with open(log_path) as f:
                prev = json.load(f)
            for k in log:
                log[k] = prev.get(k, [])
        if verbose:
            print(f"resumed from {latest_path}: epoch {start_epoch}, "
                  f"db {len(db)}, val {len(validation_data)}, "
                  f"lr {state.lr:.2e}, best_val {best_val:.4f}")

    t_start = time.time()
    db_stat_mark = len(db.entries)
    for epoch in range(start_epoch, epochs):
        t0 = time.time()
        if verbose:
            print(f"=== epoch {epoch} ===", flush=True)
        for i in range(len(scenes)):
            cov = collect_trajectory_scan(
                collection, i, state.variables, db,
                seed=seed * 1000 + epoch * len(scenes) + i, n_poses=n_poses,
            )
            log["coverage_after_trajectory"].append(cov[-1] if cov else 0.0)
            if verbose:
                print(f"  collected {scenes[i].name}: "
                      f"{len(cov)} poses, final coverage "
                      f"{cov[-1] if cov else 0:.4f}, db size {len(db)}",
                      flush=True)

        # Value-target statistics per collection epoch (plateau diagnosis,
        # VERDICT r3 weak #2): scale drift or a collapsing gain distribution
        # across epochs would decouple the supervised MSE from rollout AUC.
        new_gains = np.concatenate(
            [e.gains for e in db.entries[db_stat_mark:]]) if (
                len(db.entries) > db_stat_mark) else np.zeros((0,))
        db_stat_mark = len(db.entries)
        if new_gains.size:
            gstats = {
                "epoch": epoch, "n_labels": int(new_gains.size),
                "mean": round(float(new_gains.mean()), 4),
                "p50": round(float(np.percentile(new_gains, 50)), 4),
                "p90": round(float(np.percentile(new_gains, 90)), 4),
                "max": round(float(new_gains.max()), 4),
                "frac_zero": round(float((new_gains == 0).mean()), 4),
            }
            log.setdefault("gain_stats", []).append(gstats)
            if verbose:
                print(f"  gain stats: {gstats}", flush=True)

        if epoch == 0:
            validation_data = db.extract_validation(num=1200)
            # extract_validation REMOVES entries from db.entries; re-mark the
            # gain-stats high-water so epoch 1's slice doesn't silently skip
            # as many new labels as were moved to validation.
            db_stat_mark = len(db.entries)
            if val_path:
                db.save_entries(val_path, validation_data)
            if verbose:
                print(f"  validation split: {len(validation_data)} entries")
        else:
            state, tl, vl = train_nbp(model, state, db, validation_data,
                                      current_epoch=epoch, params=p,
                                      seed=seed * 131 + epoch,
                                      verbose=verbose)
            log["train"].append(tl)
            log["val"].append(vl)
            if vl < best_val:
                best_val = vl
                save_checkpoint(
                    os.path.join(weights_dir, f"{model_tag}_best_val.ckpt"),
                    state.variables, epoch=epoch,
                )

        if db_dir:
            db_high_water = db.save_epoch(db_dir, epoch, db_high_water)

        if evaluator is not None and epoch > 0 and epoch % eval_every == 0:
            # Checkpoint selection runs on held-out ROLLOUT AUC, not val
            # loss: across 11 checkpoints of the 33-epoch round-2 run the
            # Spearman correlation between val loss and mean rollout AUC is
            # 0.018 — statistically nothing — so best-val selection was
            # selecting on noise (round-4 plateau diagnosis, BASELINE.md).
            # Two rollout seeds per scene cut the selection noise; the
            # batched evaluator reuses one compiled program so the extra
            # seed costs seconds.
            import numpy as _np

            per_seed = []
            for si, s in enumerate((999, 1999)):
                results = evaluator.run(n_poses=eval_poses, seed=s,
                                        variables=state.variables)
                per_seed.append([r.auc for r in results])
            mean_per_scene = _np.mean(_np.asarray(per_seed), axis=0)
            aucs = {a.name: round(float(m), 4)
                    for a, m in zip(eval_scenes, mean_per_scene)}
            mean_auc = float(mean_per_scene.mean())
            log["eval_auc"].append({"epoch": epoch, "auc": aucs,
                                    "mean": round(mean_auc, 4)})
            if verbose:
                print(f"  eval AUC @ {eval_poses} poses (2 seeds): {aucs} "
                      f"mean {mean_auc:.4f}", flush=True)
            if mean_auc > best_auc:
                best_auc = mean_auc
                save_checkpoint(
                    os.path.join(weights_dir, f"{model_tag}_best_auc.ckpt"),
                    state.variables, epoch=epoch,
                    extra={"mean_auc": mean_auc})
                if verbose:
                    print(f"  new best eval AUC {mean_auc:.4f} -> "
                          f"{model_tag}_best_auc.ckpt", flush=True)

        save_checkpoint(latest_path, state.variables,
                        opt_state=state.opt_state, epoch=epoch,
                        extra={"lr": state.lr, "best_val": best_val,
                               "best_auc": best_auc})

        os.makedirs(log_dir, exist_ok=True)
        with open(log_path, "w") as f:
            json.dump(log, f)
        # Per-epoch GC: the remote-TPU client frees transferred buffers
        # lazily; together with the explicit deletes in train_nbp /
        # ScanCollection.run this keeps host RSS flat across epochs
        # (a 19-epoch run previously accumulated to a 130 GB host OOM).
        import gc

        gc.collect()
        if verbose:
            print(f"  epoch wall time {time.time() - t0:.1f}s", flush=True)
        if max_wall_s is not None and time.time() - t_start > max_wall_s:
            if verbose:
                print(f"wall-clock budget reached after epoch {epoch}; "
                      "resume with resume=True", flush=True)
            break
    return state


def run_training_nbp_dp(
    scenes: Sequence[SceneAssets],
    mesh,
    eval_scenes: Optional[Sequence[SceneAssets]] = None,
    params: Optional[Params] = None,
    epochs: int = 10,
    n_poses: int = 100,
    weights_dir: str = "weights/nbp",
    log_dir: str = "training_log",
    model_tag: str = "nbp_dp",
    seed: int = 8,
    verbose: bool = True,
    model: Optional[NBP] = None,
    interpret: Optional[bool] = None,
    mesh_axis: str = "data",
) -> TrainState:
    """Distributed NBP training over a device mesh (the reference's full
    DDP trainer, macarons_utils.py:177-326 + train_nbp_model.py:40-158).

    Collection runs one scene per device via shard_map (each device's plan
    gate fires independently — parallel/spmd.py); the inner training loop
    shards every micro batch over the mesh axis with replicated state and
    XLA-inserted gradient reduction (parallel/dp.py). The scene list must
    be a multiple of the mesh size; groups of n_devices scenes share one
    compiled collection program.

    The single-chip production path is run_training_nbp_scan (resume,
    wall-clock budget, held-out eval); this driver is the multi-chip
    capability, exercised by tests/test_multichip.py and the driver's
    dryrun on a virtual CPU mesh, and sized for a real pod slice.
    """
    import jax.numpy as jnp

    from ..parallel.dp import train_nbp_dp
    from ..parallel.spmd import ShardedScanCollection, ShardedScanRollout

    p = params or default_params()
    model = model or NBP(dtype=jnp.bfloat16)
    n_dev = mesh.devices.size
    if len(scenes) % n_dev != 0:
        raise ValueError(
            f"scene count {len(scenes)} must be a multiple of the mesh "
            f"size {n_dev} (one scene per device per collection launch)")
    state = init_train_state(model, jax.random.PRNGKey(seed),
                             lr=float(p.nbp_lr))
    groups = [list(scenes[i: i + n_dev])
              for i in range(0, len(scenes), n_dev)]
    collections = [
        ShardedScanCollection(g, model, mesh, mesh_axis=mesh_axis,
                              params=p, interpret=interpret)
        for g in groups
    ]
    evaluator = None
    if eval_scenes:
        evaluator = ShardedScanRollout(
            list(eval_scenes), model, state.variables, mesh,
            mesh_axis=mesh_axis, params=p, interpret=interpret)

    db = ReplayDB()
    validation_data: List = []
    best_val = float("inf")
    log = {"train": [], "val": [], "coverage_after_trajectory": [],
           "eval_auc": []}

    for epoch in range(epochs):
        t0 = time.time()
        if verbose:
            print(f"=== [dp x{n_dev}] epoch {epoch} ===", flush=True)
        for gi, col in enumerate(collections):
            covs = col.collect_all(
                state.variables, db,
                seed=seed * 1000 + epoch * len(scenes) + gi * n_dev,
                n_poses=n_poses)
            for s, cov in enumerate(covs):
                log["coverage_after_trajectory"].append(
                    cov[-1] if cov else 0.0)
                if verbose:
                    print(f"  collected {groups[gi][s].name}: {len(cov)} "
                          f"poses, final coverage "
                          f"{cov[-1] if cov else 0:.4f}, db {len(db)}",
                          flush=True)

        if epoch == 0:
            validation_data = db.extract_validation(num=1200)
            if verbose:
                print(f"  validation split: {len(validation_data)} entries")
        else:
            state, tl, vl = train_nbp_dp(
                model, state, db, validation_data, current_epoch=epoch,
                mesh=mesh, axis=mesh_axis, params=p,
                seed=seed * 131 + epoch, verbose=verbose)
            log["train"].append(tl)
            log["val"].append(vl)
            if vl < best_val:
                best_val = vl
                save_checkpoint(
                    os.path.join(weights_dir, f"{model_tag}_best_val.ckpt"),
                    state.variables, epoch=epoch)

        if evaluator is not None and epoch > 0:
            results = evaluator.run(n_poses=min(n_poses, 40), seed=999,
                                    variables=state.variables)
            aucs = {a.name: round(r.auc, 4)
                    for a, r in zip(eval_scenes, results)}
            log["eval_auc"].append({"epoch": epoch, "auc": aucs})
            if verbose:
                print(f"  eval AUC: {aucs}", flush=True)

        os.makedirs(log_dir, exist_ok=True)
        with open(os.path.join(log_dir, f"{model_tag}_loss.json"), "w") as f:
            json.dump(log, f)
        if verbose:
            print(f"  epoch wall time {time.time() - t0:.1f}s", flush=True)
    return state
