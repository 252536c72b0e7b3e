"""Data-parallel NBP training step over a device mesh.

The reference's distributed layer is DDP: parameters replicated per GPU,
per-rank batches, NCCL gradient all-reduce, SyncBatchNorm
(macarons_utils.py:177-326, 483-494). TPU-native equivalent: one jitted
train step whose input shardings (batch split over the mesh axis, weights
replicated) make XLA insert the gradient psum automatically; the BatchNorm
batch-stat reduction rides the same program (the U-Net's BN takes an
``axis_name`` hook — models/unet.py).

Used by __graft_entry__.dryrun_multichip (the driver's multi-chip dry run)
and tests/test_multichip.py (8 virtual CPU devices).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.unet import NBP, nbp_loss
from .mesh import make_mesh


def make_dp_train_step(model: NBP, tx, mesh: Mesh, axis: str = "data"):
    """Jitted train step: batch sharded over `axis`, state replicated.

    Returns step(variables, opt_state, batch) -> (variables, opt_state, loss)
    with explicit in/out shardings; XLA lowers the gradient reduction to a
    psum over ICI.
    """
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis))

    def train_step(variables, opt_state, batch):
        def loss_fn(params):
            (vm, om), mutated = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                batch["x"], train=True, mutable=["batch_stats"],
            )
            b_idx = jnp.arange(vm.shape[0])[:, None]
            pv = vm[b_idx, batch["pixels"][..., 1], batch["pixels"][..., 2],
                    batch["pixels"][..., 0]]
            loss = nbp_loss(params["log_vars"], pv, batch["gains"], om,
                            batch["layout"], value_weight=batch["weights"])
            return loss, mutated

        (loss, mutated), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"]
        )
        updates, new_opt = tx.update(grads, opt_state, variables["params"])
        params = optax.apply_updates(variables["params"], updates)
        return (
            {"params": params, "batch_stats": mutated["batch_stats"]},
            new_opt,
            loss,
        )

    batch_spec = {k: data for k in
                  ("x", "layout", "pixels", "gains", "weights")}
    return jax.jit(
        train_step,
        in_shardings=(repl, repl, batch_spec),
        out_shardings=(repl, repl, repl),
    )


def dp_train_demo(n_devices: int, image_size: int = 64,
                  n_steps: int = 1, axis: str = "data",
                  mesh: Optional[Mesh] = None, width: int = 8,
                  verbose: bool = True) -> Tuple[float, Mesh]:
    """Build + run the sharded NBP train step on tiny shapes.

    One sample per device, `image_size`^2 inputs, a narrow U-Net
    (width=8: same topology/shardings as the 55M flagship, ~1% of the
    FLOPs). The narrowness matters on the virtual CPU mesh: XLA's CPU
    collectives abort with a hard 40 s rendezvous timeout when all
    n_devices partitions time-share one core and each takes seconds to
    reach the gradient all-gather. Returns (loss, mesh).
    """
    mesh = mesh or make_mesh(n_devices, axis=axis)
    model = NBP(width=width)

    B, S = n_devices, image_size
    x = jnp.zeros((B, S, S, 5), jnp.float32)
    variables = jax.jit(lambda k, xx: model.init(k, xx, train=True))(
        jax.random.PRNGKey(0), x)
    tx = optax.adamw(1e-3, weight_decay=0.01)
    opt_state = tx.init(variables["params"])

    K = 8
    # Rows DIFFER per device on purpose: with identical rows every device
    # computes identical gradients and a missing gradient psum would be
    # invisible to any parity check. Distinct rows make per-device grads
    # distinct, so the dryrun's 8-dev-vs-1-dev post-update loss comparison
    # (__graft_entry__._dryrun_multichip_impl) actually discriminates.
    row = (1.0 + jnp.arange(B, dtype=jnp.float32) / B)[:, None, None, None]
    batch = dict(
        x=jnp.ones((B, S, S, 5), jnp.float32) * row,
        layout=jnp.zeros((B, S, S, 1), jnp.float32),
        pixels=jnp.zeros((B, K, 3), jnp.int32),
        gains=jnp.arange(B * K, dtype=jnp.float32).reshape(B, K) / (B * K),
        weights=jnp.ones((B, K), jnp.float32),
    )

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis))
    variables = jax.device_put(variables, repl)
    opt_state = jax.device_put(opt_state, repl)
    batch = {k: jax.device_put(v, data) for k, v in batch.items()}

    step = make_dp_train_step(model, tx, mesh, axis=axis)
    loss = None
    for _ in range(n_steps):
        variables, opt_state, loss = step(variables, opt_state, batch)
    jax.block_until_ready(loss)
    if verbose:
        print(f"dp_train_demo({n_devices}): loss = {float(loss):.4f}")
    return float(loss), mesh


def dp_grad_parity(n_devices: int, image_size: int = 64, width: int = 16,
                   axis: str = "data"):
    """Loss + gradient parity between an n-device and a 1-device mesh.

    The DDP invariant (reference: DDP all-reduce semantics,
    macarons_utils.py:235-240, 483-494): the same GLOBAL batch must produce
    the same loss and the same mean gradient whether it is sharded over n
    devices (GSPMD inserts the psum) or lives on one. Batch rows are
    per-device distinct — with identical rows a missing reduction is
    invisible. Returns dict(loss_n, loss_1, norm_n, norm_1, cosine).

    The whole check runs under jax.default_matmul_precision("highest"):
    at this build's default bf16 conv precision the reduction-order noise
    alone reaches ~2e-4 on the loss and pushes the gradient cosine to
    ~0.998 (measured), which would drown real defects; at f32 the
    legitimate noise is ~1e-6 while a lost/duplicated gradient reduction
    still shifts the norm by tens of percent.
    """
    import numpy as np

    model = NBP(width=width)
    B, S, K = n_devices, image_size, 8
    # RANDOM pixels, not constant rows: per-row-constant images make the
    # BatchNorm channel variance collapse toward zero and its E[x^2]-mu^2
    # form amplifies benign reduction-order noise by orders of magnitude
    # (measured: constant rows put the 8-dev/1-dev gradient cosine at
    # ~0.998 with no bug; random inputs restore ~1e-6-level agreement).
    kx, kg = jax.random.split(jax.random.PRNGKey(7))
    batch = dict(
        x=jax.random.normal(kx, (B, S, S, 5), jnp.float32),
        layout=jnp.zeros((B, S, S, 1), jnp.float32),
        pixels=jnp.zeros((B, K, 3), jnp.int32),
        gains=jax.random.uniform(kg, (B, K), jnp.float32),
        weights=jnp.ones((B, K), jnp.float32),
    )
    variables = jax.jit(lambda k, xx: model.init(k, xx, train=True))(
        jax.random.PRNGKey(0), batch["x"])

    def run(mesh: Mesh):
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P(axis))

        def loss_fn(params, bstats, b):
            (vm, om), _ = model.apply(
                {"params": params, "batch_stats": bstats},
                b["x"], train=True, mutable=["batch_stats"])
            b_idx = jnp.arange(vm.shape[0])[:, None]
            pv = vm[b_idx, b["pixels"][..., 1], b["pixels"][..., 2],
                    b["pixels"][..., 0]]
            return nbp_loss(params["log_vars"], pv, b["gains"], om,
                            b["layout"], value_weight=b["weights"])

        batch_spec = {k: data for k in batch}
        fn = jax.jit(jax.value_and_grad(loss_fn),
                     in_shardings=(repl, repl, batch_spec),
                     out_shardings=(repl, repl))
        v = jax.device_put(variables, repl)
        bb = {k: jax.device_put(x, data) for k, x in batch.items()}
        loss, grads = fn(v["params"], v["batch_stats"], bb)
        flat = jnp.concatenate([jnp.ravel(g).astype(jnp.float64)
                                if jax.config.jax_enable_x64
                                else jnp.ravel(g)
                                for g in jax.tree.leaves(grads)])
        return float(loss), np.asarray(flat)

    with jax.default_matmul_precision("highest"):
        loss_n, g_n = run(make_mesh(n_devices, axis=axis))
        loss_1, g_1 = run(make_mesh(1, axis=axis))
    norm_n = float(np.linalg.norm(g_n))
    norm_1 = float(np.linalg.norm(g_1))
    cos = float(np.dot(g_n, g_1) / max(norm_n * norm_1, 1e-30))
    return dict(loss_n=loss_n, loss_1=loss_1, norm_n=norm_n, norm_1=norm_1,
                cosine=cos)


def dp_rollout_demo(mesh: Mesh, n_scenes: int = 2, n_poses: int = 3,
                    axis: str = "data", verbose: bool = True):
    """Shard a BatchedScanRollout's scene axis over the mesh and run it.

    Tiny config (64x114 frames, small buffers) so the dry run compiles in
    reasonable time on a CPU mesh. The scene count must divide the mesh axis
    or vice versa; scenes are replicated up to the device count.
    """
    from ..assets import generate_scene, pack_generated_scene
    from ..assets.scene_assets import pad_assets_to_common
    from ..config import default_params
    from ..eval.scan_rollout import BatchedScanRollout
    from ..models.unet import NBP

    n_dev = mesh.devices.size
    n_scenes = max(n_scenes, n_dev)
    params = default_params(
        image_height=64, image_width=114, points_per_frame=512,
        full_pc_capacity=65536, n_gt_surface_points=2048,
        pc2img_size=[64, 64], value_map_size=[16, 16],
    )
    assets = pad_assets_to_common([
        pack_generated_scene(generate_scene("simple", seed=i), params=params)
        for i in range(n_scenes)
    ])
    model = NBP(width=8)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 5)))
    rollout = BatchedScanRollout(assets, model, variables, params=params,
                                 mesh=mesh, mesh_axis=axis)
    results = rollout.run(n_poses=n_poses, seed=8)
    if verbose:
        covs = [round(r.coverage_evolution[-1], 4) for r in results]
        print(f"dp_rollout_demo({n_dev} devices, {n_scenes} scenes, "
              f"{n_poses} poses): final coverage {covs}")
    return results


# ---------------------------------------------------------------------------
# DP over the real replay pipeline: the sharded analog of
# train/train_nbp.train_nbp (device-staged dataset, micro-step index gathers,
# MultiSteps accumulation, plateau LR). Collection side: parallel/spmd.py.
# ---------------------------------------------------------------------------

# key (id(model), id(optimizer), id(mesh), axis) -> (jitted_step, pins).
# The value PINS the keyed objects: as long as an entry lives, its model/
# optimizer/mesh cannot be garbage-collected, so a freed id() can never be
# recycled by a new object and alias a stale jitted step (the id()-keyed
# cache bug class from the round-2 correctness sweep; optax
# GradientTransformations are NamedTuples and don't support weakrefs, so
# pinning is the airtight variant of weak-keying here).
_DP_STEP_CACHE = {}


def make_dp_train_step_ds(model: NBP, optimizer, mesh: Mesh,
                          axis: str = "data"):
    """Sharded version of train_nbp._train_step_ds.

    The staged dataset stays replicated (a few GB — fits every chip's HBM
    next to the 55M model; gathering from a row-sharded dataset by
    device-local indices would lower to a per-step all-gather of the whole
    store). The micro-batch INDEX vector is sharded over the mesh axis, so
    each device gathers and differentiates its own rows; the out-sharding
    on the replicated state makes XLA insert the gradient psum (NCCL
    all-reduce analog), and the BatchNorm batch statistics are computed
    over the GLOBAL micro batch by GSPMD (the SyncBatchNorm analog,
    macarons_utils.py:484-489)."""
    from ..models.unet import nbp_loss as _nbp_loss
    from ..train.train_nbp import _gather_pred_values

    key = (id(model), id(optimizer), id(mesh), axis)
    hit = _DP_STEP_CACHE.get(key)
    if hit is not None:
        return hit[0]

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis))

    def step(variables, opt_state, ds, idx, sw):
        x = ds["x"][idx].astype(jnp.float32)
        layout = ds["layout"][idx].astype(jnp.float32)[..., None]
        pixels = ds["pixels"][idx]
        gains = ds["gains"][idx]
        weights = ds["pweights"][idx] * sw[:, None]

        def loss_fn(params):
            (vm, om), mutated = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
            )
            pred_vals = _gather_pred_values(vm, pixels)
            loss = _nbp_loss(params["log_vars"], pred_vals, gains, om,
                             layout, value_weight=weights, sample_weight=sw)
            return loss, mutated

        (loss, mutated), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"])
        updates, new_opt = optimizer.update(grads, opt_state,
                                            variables["params"])
        params = optax.apply_updates(variables["params"], updates)
        return ({"params": params, "batch_stats": mutated["batch_stats"]},
                new_opt, loss)

    ds_spec = {k: repl for k in ("x", "layout", "pixels", "gains",
                                 "pweights")}
    jitted = jax.jit(
        step,
        in_shardings=(repl, repl, ds_spec, data, data),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1),
    )
    _DP_STEP_CACHE[key] = (jitted, (model, optimizer, mesh))
    return jitted


def train_nbp_dp(model: NBP, state, db, validation_data,
                 current_epoch: int, mesh: Mesh, axis: str = "data",
                 params=None, num_epochs: int = 5, seed: int = 0,
                 verbose: bool = True):
    """Mesh-sharded inner training: the DDP analog of train_nbp
    (nbp_utils.py:430-467 under DistributedDataParallel).

    Same recipe — 5 inner epochs over the combined replay slice, plateau
    LR, MultiSteps accumulation — with every micro step's batch split
    across the mesh axis. Validation runs on the replicated staged set
    (metric only; the reference all-reduces it, reduce_tensor
    macarons_utils.py:235-240 — here the full set is scored identically on
    every host). Returns (state, mean_train_loss, mean_val_loss) like
    train_nbp."""
    import dataclasses
    import random as _random

    import numpy as np

    from ..config import default_params
    from ..train.train_nbp import (
        MICRO_BATCH,
        PlateauScheduler,
        _epoch_pool,
        _micro_chunks,
        build_device_dataset,
        release_device_dataset,
        validate,
    )

    p = params or default_params()
    n_dev = mesh.devices.size
    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P(axis))
    rng = _random.Random(seed)
    if current_epoch == 1:
        data = db.read_combined(last_n=None)
    else:
        data = db.read_combined(last_n=4608, sample_size=2048, rng=rng)
    sched = PlateauScheduler()
    lr = state.lr
    train_losses, val_losses = [], []
    ds, _ = build_device_dataset(data)
    ds = jax.device_put(ds, repl)
    pool = _epoch_pool(data, current_epoch)
    # The micro batch must tile the mesh axis; keep at least one row per
    # device and round up to the axis size.
    micro = min(MICRO_BATCH, int(p.nbp_batch_size))
    micro = max(micro, n_dev)
    micro = (micro + n_dev - 1) // n_dev * n_dev
    step = make_dp_train_step_ds(model, state.optimizer, mesh, axis=axis)
    variables = jax.device_put(state.variables, repl)
    opt_state = jax.device_put(state.opt_state, repl)
    for e in range(num_epochs):
        shuffled = list(pool)
        rng.shuffle(shuffled)
        losses = []
        for idx, sw in _micro_chunks(shuffled, micro, rng=rng):
            idx = jax.device_put(idx, data_sh)
            sw = jax.device_put(sw, data_sh)
            variables, opt_state, loss = step(variables, opt_state, ds,
                                              idx, sw)
            losses.append(loss)
        tl = float(np.mean([float(l) for l in losses])) if losses else 0.0
        state = dataclasses.replace(state, variables=variables,
                                    opt_state=opt_state)
        vl = validate(model, state, validation_data, int(p.nbp_batch_size))
        train_losses.append(tl)
        val_losses.append(vl)
        new_lr = sched.step(vl, lr)
        if new_lr != lr:
            lr = new_lr
            opt_state.inner_opt_state.hyperparams["learning_rate"] = (
                jnp.asarray(lr))
        if verbose:
            print(f"  [dp x{n_dev}] inner epoch {e + 1}: train {tl:.4f} "
                  f"val {vl:.4f} lr {lr:.2e}")
    state = dataclasses.replace(state, variables=variables,
                                opt_state=opt_state, lr=lr)
    release_device_dataset(ds)
    return state, (float(np.mean(train_losses)) if train_losses else 0.0), (
        float(np.mean(val_losses)) if val_losses else 0.0)


def dp_collection_demo(mesh: Mesh, n_poses: int = 2, axis: str = "data",
                       verbose: bool = True):
    """One-scene-per-device shard_map collection on tiny shapes (the dry-run
    proof of the distributed trainer's collection half; parallel/spmd.py).
    No collectives inside — each device runs its scene's Boltzmann rollout
    with an independent scalar plan gate."""
    from ..assets import generate_scene, pack_generated_scene
    from ..assets.scene_assets import pad_assets_to_common
    from ..config import default_params
    from ..train.replay import ReplayDB
    from .spmd import ShardedScanCollection

    n_dev = mesh.devices.size
    params = default_params(
        image_height=64, image_width=114, points_per_frame=512,
        full_pc_capacity=65536, n_gt_surface_points=2048,
        pc2img_size=[64, 64], value_map_size=[16, 16],
    )
    assets = pad_assets_to_common([
        pack_generated_scene(generate_scene("simple", seed=i), params=params)
        for i in range(n_dev)
    ])
    model = NBP(width=8)
    variables = jax.jit(lambda k, x: model.init(k, x, train=True))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 5)))
    col = ShardedScanCollection(assets, model, mesh, mesh_axis=axis,
                                params=params)
    db = ReplayDB()
    covs = col.collect_all(variables, db, seed=3, n_poses=n_poses)
    if verbose:
        print(f"dp_collection_demo({n_dev} devices, {n_poses} poses): "
              f"final coverage {[round(c[-1], 4) for c in covs]}, "
              f"db {len(db)}")
    return covs
