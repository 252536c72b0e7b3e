"""Learning-rate schedules as optax schedule functions.

Ports of the reference's custom optimizers (macarons/utility/utils.py):
- NoamOpt (:263-306): lr = factor * d_model^-0.5 * min(step^-0.5,
  step * warmup^-1.5),
- WarmupConstantOpt (:308-350): lr = factor * min(1, step / warmup),
- WarmupExponentialOpt (:352-401): linear warmup then exponential decay.
"""

from __future__ import annotations

import jax.numpy as jnp


def noam_schedule(d_model: int, warmup: int, factor: float = 1.0):
    def schedule(step):
        s = jnp.maximum(step, 1).astype(jnp.float32)
        return factor * (d_model ** -0.5) * jnp.minimum(
            s ** -0.5, s * (warmup ** -1.5)
        )
    return schedule


def warmup_constant_schedule(lr: float, warmup: int):
    def schedule(step):
        s = jnp.maximum(step, 1).astype(jnp.float32)
        return lr * jnp.minimum(1.0, s / warmup)
    return schedule


def warmup_exponential_schedule(lr: float, warmup: int, gamma: float = 0.9999):
    def schedule(step):
        s = jnp.maximum(step, 1).astype(jnp.float32)
        warm = lr * jnp.minimum(1.0, s / warmup)
        decay = gamma ** jnp.maximum(s - warmup, 0.0)
        return warm * decay
    return schedule
