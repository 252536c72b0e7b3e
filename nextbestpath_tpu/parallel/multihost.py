"""Multi-host initialization (the SLURM/idr_torch + NCCL env-init analog).

The reference initializes torch.distributed from SLURM env vars
(macarons/utility/idr_torch.py:1-29, macarons_utils.py:199-213). The JAX
equivalent is jax.distributed.initialize() from coordinator env vars; scene
lists shard per process (assets.dataset.SceneDataset.shard_for_process) and
metrics reduce with psum over the mesh.
"""

from __future__ import annotations

import os
import re
import subprocess
from typing import Optional

import jax
import jax.numpy as jnp


def _first_slurm_host(nodelist: str) -> str:
    """First hostname of a SLURM nodelist, expanding the compressed form.

    'nid[001234-001237]' -> 'nid001234' (NOT the bare prefix 'nid', which
    is what naive split-on-'[' yields — a nonexistent hostname that hangs
    every rank's initialize()). Prefers `scontrol show hostnames` like the
    reference's idr_torch setup; falls back to parsing the first bracket
    range (zero-padding preserved)."""
    try:
        out = subprocess.run(["scontrol", "show", "hostnames", nodelist],
                             capture_output=True, text=True, timeout=10)
        if out.returncode == 0 and out.stdout.strip():
            return out.stdout.split()[0]
    except (OSError, subprocess.TimeoutExpired):
        pass
    m = re.match(r"([^\[,]+)(?:\[([^\]]+)\])?", nodelist)
    prefix, inner = m.group(1), m.group(2)
    if not inner:
        return prefix
    first = inner.split(",")[0].split("-")[0]
    return prefix + first


def maybe_initialize_distributed(coordinator_address: Optional[str] = None,
                                 num_processes: Optional[int] = None,
                                 process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when multi-host env vars are present.

    Honors explicit args, then JAX_COORDINATOR_ADDRESS/NUM_PROCESSES/
    PROCESS_ID, then SLURM_* variables. Returns True when initialized.
    """
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    from_slurm = False
    if addr is None and "SLURM_JOB_NODELIST" in os.environ:
        # First node of the SLURM allocation acts as coordinator; the port
        # carries a per-job component so two jobs sharing a first node
        # don't collide (idr_torch's MASTER_PORT scheme).
        node = _first_slurm_host(os.environ["SLURM_JOB_NODELIST"])
        port = 12345 + int(os.environ.get("SLURM_JOB_ID", "0")) % 20000
        addr = f"{node}:{port}"
        from_slurm = True
    if addr is None:
        return False
    n_env = os.environ.get("JAX_NUM_PROCESSES",
                           os.environ.get("SLURM_NTASKS"))
    pid_env = os.environ.get("JAX_PROCESS_ID",
                             os.environ.get("SLURM_PROCID"))
    if num_processes is None and n_env is None and not from_slurm:
        # A coordinator address with no process count/rank means every
        # host would claim rank 0 of a 1-process job and hang — fail fast.
        raise ValueError(
            "JAX_COORDINATOR_ADDRESS is set but JAX_NUM_PROCESSES/"
            "JAX_PROCESS_ID are not; export both (or run under SLURM)")
    n = num_processes or int(n_env or "1")
    pid = process_id if process_id is not None else int(pid_env or "0")
    if not 0 <= pid < n:
        raise ValueError(f"process_id {pid} out of range for {n} processes")
    jax.distributed.initialize(coordinator_address=addr, num_processes=n,
                               process_id=pid)
    return True


def reduce_mean(x: jnp.ndarray, axis_name: str = "data") -> jnp.ndarray:
    """Cross-replica metric mean (reduce_tensor analog,
    macarons_utils.py:235-240). Use inside pmapped/shard_mapped code."""
    return jax.lax.pmean(x, axis_name)
