"""Device-mesh helpers (the torch.distributed/NCCL analog).

The reference's only parallelism is data parallel: one scene per GPU with
DDP-wrapped models and all-reduced metrics (macarons_utils.py:177-326,
SURVEY.md §2.3). TPU-native equivalent: a 1-D `jax.sharding.Mesh` whose axis
shards scenes (rollouts) or the batch (training); parameters are replicated
and gradients are reduced by XLA collectives inserted from the shardings.
TP/PP/SP/EP are deliberately absent — the largest model is the ~55M-param
U-Net, which fits on any chip (documented parity with the reference).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            # Silent truncation would label an n-way run that actually ran
            # on fewer chips — fail at the source instead.
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} devices are visible "
                "(set --xla_force_host_platform_device_count for CPU "
                "testing)")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch/scene) dimension across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """Place every array in the pytree with its batch dim sharded."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
