"""Probe: jitted NBP init timing + save initial weights (debug utility)."""
import os
import time

import sys

sys.path.insert(0, "/root/repo")
from nextbestpath_tpu.utils.jaxcache import enable_cache  # noqa: E402

enable_cache()
import jax
import jax.numpy as jnp

from nextbestpath_tpu.models import NBP

print("backend:", jax.default_backend(), flush=True)
model = NBP()
t0 = time.time()
v = jax.jit(lambda k, x: model.init(k, x, train=False))(
    jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 5)))
jax.block_until_ready(v)
print("jit init 64:", time.time() - t0, flush=True)
t0 = time.time()
v = jax.jit(lambda k, x: model.init(k, x, train=False))(
    jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 5)))
jax.block_until_ready(v)
print("jit init 256:", time.time() - t0, flush=True)
from nextbestpath_tpu.utils.checkpoint import save_checkpoint

save_checkpoint("/root/repo/weights/nbp/init_256.ckpt", v, epoch=0)
print("saved init weights", flush=True)
