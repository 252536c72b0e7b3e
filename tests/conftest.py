"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated without TPU hardware via
``xla_force_host_platform_device_count`` (SURVEY.md §4).

Self-hardening against the ambient remote-TPU environment: the ambient
sitecustomize (PYTHONPATH=/root/.axon_site) imports jax and registers the
axon PJRT plugin at interpreter startup, under ``JAX_PLATFORMS=axon``. By
the time this conftest runs, jax is therefore ALREADY IMPORTED and
``os.environ["JAX_PLATFORMS"] = "cpu"`` alone does nothing (the config
value was baked at import) — that is what broke bare ``pytest`` in round 2
(jax.devices() returned the TPU). The fix is to override the live config
(`jax.config.update("jax_platforms", "cpu")`) BEFORE any backend
initializes; the registered plugin then never creates its client.
``XLA_FLAGS`` is still read from the environment at CPU-client creation,
so setting it here (pre-backend-init) works.

The env vars are also exported so that subprocesses spawned by tests (e.g.
the __graft_entry__ multichip child) inherit a CPU-first configuration.
"""

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402  (already imported by the ambient sitecustomize)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")

# Persist compiled executables across test runs, scoped by the runtime
# fingerprint so entries from a different jaxlib/host never load
# (utils/jaxcache.py).
from nextbestpath_tpu.utils.jaxcache import enable_cache  # noqa: E402

enable_cache()
