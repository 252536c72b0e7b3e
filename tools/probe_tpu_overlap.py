#!/usr/bin/env python
"""3-minute TPU busy-loop probe: verifies the tunnel stays healthy while
axon-free CPU JAX processes run concurrently (round-1's wedge came from the
axon plugin initializing in every process via sitecustomize)."""

import os
import time

import sys

sys.path.insert(0, "/root/repo")
from nextbestpath_tpu.utils.jaxcache import enable_cache  # noqa: E402

enable_cache()
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)
x = jnp.ones((2048, 2048), jnp.bfloat16)

@jax.jit
def f(x):
    for _ in range(8):
        x = jnp.tanh(x @ x) * 0.01
    return x

t0 = time.time()
f(x).block_until_ready()
print(f"compiled in {time.time() - t0:.1f}s", flush=True)
while time.time() - t0 < 180:
    t1 = time.time()
    f(x).block_until_ready()
    print(f"step {time.time() - t1:.3f}s at t={time.time() - t0:.0f}s",
          flush=True)
    time.sleep(5)
print("probe done: tunnel healthy", flush=True)
