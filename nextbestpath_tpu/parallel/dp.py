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
    batch = dict(
        x=jnp.ones((B, S, S, 5), jnp.float32),
        layout=jnp.zeros((B, S, S, 1), jnp.float32),
        pixels=jnp.zeros((B, K, 3), jnp.int32),
        gains=jnp.zeros((B, K), jnp.float32),
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
