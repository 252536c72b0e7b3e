"""Attribute scan-rollout per-pose cost by stage ablation (debug utility).

Each configuration compiles its own program (~minutes through the remote
compiler), so this is a coarse but reliable profiler for the tunnel setup
where jax.profiler traces are unavailable.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from nextbestpath_tpu.utils.jaxcache import enable_cache  # noqa: E402

enable_cache()

import jax
import jax.numpy as jnp

from nextbestpath_tpu.assets import generate_scene, pack_generated_scene
from nextbestpath_tpu.config import default_params
from nextbestpath_tpu.eval.scan_rollout import ScanRollout
from nextbestpath_tpu.models import NBP

POSES = int(os.environ.get("PROFILE_POSES", "20"))
params = default_params()
assets = pack_generated_scene(generate_scene("simple", seed=8), params=params)
# PROFILE_BF16=1 + PROFILE_CKPT=<path> reproduce the bench configuration
# (trained policy, bf16 conv compute) so the attribution matches bench.py.
model = NBP(dtype=jnp.bfloat16) if os.environ.get("PROFILE_BF16") else NBP()
variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
    jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 5)))
ckpt = os.environ.get("PROFILE_CKPT")
if ckpt:
    from nextbestpath_tpu.utils.checkpoint import load_checkpoint
    variables, _, _ep, _ = load_checkpoint(ckpt, variables)
    print(f"# loaded {ckpt} (epoch {_ep})", flush=True)

import sys as _sys
CONFIGS = [(), ("coverage",), ("plan",), ("model_input",), ("observe",),
           ("moves",),
           ("coverage", "plan", "model_input", "observe", "moves")]
if len(_sys.argv) > 1:
    # Each CLI arg is one config: 'none' or '+'-joined stage names,
    # e.g. `profile_scan.py none coverage+plan`.
    CONFIGS = [() if a == "none" else tuple(a.split("+"))
               for a in _sys.argv[1:]]
for ablate in CONFIGS:
    r = ScanRollout(assets, model, variables, params=params, ablate=ablate)
    r.run(n_poses=POSES, seed=8)  # compile
    t0 = time.time()
    res = r.run(n_poses=POSES, seed=9)
    dt = time.time() - t0
    print(f"ablate={ablate!r:45s} {POSES / dt:7.2f} poses/s "
          f"({1000 * dt / POSES:6.1f} ms/pose)", flush=True)
