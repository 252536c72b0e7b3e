"""Runtime-fingerprinted JAX persistent-compilation-cache management.

Why this exists: the persistent cache stores AOT-serialized executables. An
entry compiled under one runtime build can be *loaded* under another — and
both failure modes have actually bitten this repo's driver artifacts:

- TPU (remote/axon): the terminal rejects an AOT executable serialized under
  a different libtpu build with FAILED_PRECONDITION "libtpu version
  mismatch" (MULTICHIP_r01/r02.json).
- CPU: ``cpu_aot_loader.cc`` rejects entries produced on a host with
  different machine features (cross-machine cache reuse).

A single shared ``.jax_cache`` directory therefore poisons any process whose
runtime differs from the one that populated it. The fix is to scope cache
entries by a *runtime fingerprint* so a skewed process simply sees an empty
directory and compiles cold instead of crashing:

    .jax_cache/<platform>-<digest(jaxlib, platform_version, cpu flags)>/

Two entry points:

- :func:`cache_env_dir` — fingerprint computable WITHOUT importing jax
  (jaxlib wheel version + /proc/cpuinfo flags). Safe to put in a child
  process's ``JAX_COMPILATION_CACHE_DIR``. Only used for ``cpu``, where the
  wheel version pins the runtime.
- :func:`enable_cache` — call AFTER importing jax in a live process. Includes
  the initialized backend's ``platform_version`` (for the axon/TPU plugin
  this carries the libtpu build string, the exact axis of the observed
  skew) in the fingerprint, then points ``jax_compilation_cache_dir`` at the
  scoped subdirectory.

Set ``NBPT_NO_CACHE=1`` to disable persistent caching entirely (the cold
retry path in __graft_entry__.py).

Known-benign noise: ``cpu_aot_loader.cc`` prints "Target machine feature
+prefer-no-scatter/+prefer-no-gather is not supported on the host machine
... could lead to execution errors such as SIGILL" on EVERY reload of a CPU
AOT entry — including entries the very same machine wrote seconds earlier
(reproduced round 3 with a fresh cache dir and two back-to-back runs of a
trivial jit). Those two flags are XLA CPU tuning *preferences* recorded in
the compile-time target features but never present in the loader's
host-feature detection, so the mismatch is tautological. Execution is
correct; the message cannot be silenced by fingerprinting. Real skew (a
different jaxlib or genuinely different CPU features) still lands in a
separate fingerprint directory and compiles cold.
"""

from __future__ import annotations

import hashlib
import os

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
DEFAULT_BASE = os.path.join(_REPO, ".jax_cache")


def _cpu_flags_digest() -> str:
    """Digest of the host CPU feature flags (cpu_aot_loader compatibility)."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:8]
    except OSError:
        pass
    import platform

    return hashlib.sha1(platform.machine().encode()).hexdigest()[:8]


def _jaxlib_version() -> str:
    try:
        from importlib.metadata import version

        return version("jaxlib")
    except Exception:
        return "unknown"


def cache_env_dir(platform: str = "cpu", base: str = DEFAULT_BASE) -> str:
    """Fingerprinted cache dir for a child process, computed without jax."""
    digest = hashlib.sha1(
        f"{platform}|{_jaxlib_version()}|{_cpu_flags_digest()}".encode()
    ).hexdigest()[:12]
    return os.path.join(base, f"{platform}-{digest}")


def enable_cache(base: str = DEFAULT_BASE, verbose: bool = False) -> str | None:
    """Enable the persistent cache scoped by the LIVE runtime fingerprint.

    Initializes the backend (jax.devices()) to read platform_version — for
    remote-TPU plugins that string carries the libtpu build, so a libtpu
    upgrade lands in a fresh, empty cache subdirectory instead of loading a
    stale AOT executable. Returns the cache dir, or None when disabled.
    """
    if os.environ.get("NBPT_NO_CACHE"):
        return None
    import jax

    backend = jax.default_backend()
    try:
        pv = jax.devices()[0].client.platform_version
    except Exception:
        pv = "unknown"
    digest = hashlib.sha1(
        f"{backend}|{_jaxlib_version()}|{pv}|{_cpu_flags_digest()}".encode()
    ).hexdigest()[:12]
    d = os.path.join(base, f"{backend}-{digest}")
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    if verbose:
        import sys

        print(f"# jax cache: {d}", file=sys.stderr, flush=True)
    return d
