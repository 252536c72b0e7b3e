"""Multi-host initialization (the SLURM/idr_torch + NCCL env-init analog).

The reference initializes torch.distributed from SLURM env vars
(macarons/utility/idr_torch.py:1-29, macarons_utils.py:199-213). The JAX
equivalent is jax.distributed.initialize() from coordinator env vars; scene
lists shard per process (assets.dataset.SceneDataset.shard_for_process) and
metrics reduce with psum over the mesh.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp


def maybe_initialize_distributed(coordinator_address: Optional[str] = None,
                                 num_processes: Optional[int] = None,
                                 process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when multi-host env vars are present.

    Honors explicit args, then JAX_COORDINATOR_ADDRESS/NUM_PROCESSES/
    PROCESS_ID, then SLURM_* variables. Returns True when initialized.
    """
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr is None and "SLURM_JOB_NODELIST" in os.environ:
        # First node of the SLURM allocation acts as coordinator.
        node = os.environ["SLURM_JOB_NODELIST"].split(",")[0].split("[")[0]
        addr = f"{node}:12345"
    if addr is None:
        return False
    n = num_processes or int(os.environ.get(
        "JAX_NUM_PROCESSES", os.environ.get("SLURM_NTASKS", "1")))
    pid = process_id if process_id is not None else int(os.environ.get(
        "JAX_PROCESS_ID", os.environ.get("SLURM_PROCID", "0")))
    jax.distributed.initialize(coordinator_address=addr, num_processes=n,
                               process_id=pid)
    return True


def reduce_mean(x: jnp.ndarray, axis_name: str = "data") -> jnp.ndarray:
    """Cross-replica metric mean (reduce_tensor analog,
    macarons_utils.py:235-240). Use inside pmapped/shard_mapped code."""
    return jax.lax.pmean(x, axis_name)
