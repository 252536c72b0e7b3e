"""BatchNorm folding for NBP inference.

The reference evaluates the U-Net in eval() mode, where BatchNorm is a
per-channel affine transform with frozen running stats
(next_best_path/testers/nbp_planning.py:406-409 loads weights and never
trains). On TPU the batch-1 eval forward is HBM-bound, and every BN layer
costs an extra full-resolution f32 read+write between the conv and the ReLU.
Folding the affine into the preceding conv --

    y = (W*x + b - mean) / sqrt(var + eps) * scale + bias
      = (W * s) * x + (b - mean) * s + bias,   s = scale / sqrt(var + eps)

-- removes all ~30 BN ops from the forward at zero cost in accuracy
(exact in f32; parity-tested in tests/test_unet.py).

Pairing rule: within every block of this model (ConvBlock, UpConv,
AttentionGate) the BN that consumes TorchConv_i's output is named
BatchNorm_i in the same scope; modules without BNs (final1/final2) pass
through unchanged.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp


def _fold_pair(conv_params: Dict[str, Any], bn_params: Dict[str, Any],
               bn_stats: Dict[str, Any], eps: float):
    kernel = jnp.asarray(conv_params["Conv_0"]["kernel"], jnp.float32)
    bias = jnp.asarray(conv_params["Conv_0"]["bias"], jnp.float32)
    s = jnp.asarray(bn_params["scale"], jnp.float32) / jnp.sqrt(
        jnp.asarray(bn_stats["var"], jnp.float32) + eps)
    shift = jnp.asarray(bn_params["bias"], jnp.float32) - jnp.asarray(
        bn_stats["mean"], jnp.float32) * s
    out_dtype = conv_params["Conv_0"]["kernel"].dtype
    return {"Conv_0": {
        "kernel": (kernel * s).astype(out_dtype),
        "bias": (bias * s + shift).astype(out_dtype),
    }}


def _fold_tree(params: Dict[str, Any], stats: Dict[str, Any], eps: float):
    out: Dict[str, Any] = {}
    for key, val in params.items():
        if key.startswith("BatchNorm_"):
            continue  # consumed by its paired conv below
        if key.startswith("TorchConv_"):
            idx = key.split("_", 1)[1]
            bn_key = f"BatchNorm_{idx}"
            if bn_key in params:
                out[key] = _fold_pair(val, params[bn_key],
                                      stats[bn_key], eps)
            else:
                out[key] = val
        elif isinstance(val, dict):
            out[key] = _fold_tree(val, stats.get(key, {}), eps)
        else:
            out[key] = val
    return out


def fold_bn_variables(variables: Dict[str, Any],
                      eps: float = 1e-5) -> Dict[str, Any]:
    """Fold ``batch_stats`` into conv weights; result is for NBP(fold_bn=True).

    Idempotent detection is the caller's job: variables without a
    ``batch_stats`` collection are returned unchanged (already folded).
    """
    if "batch_stats" not in variables:
        return variables
    params = _fold_tree(variables["params"], variables["batch_stats"], eps)
    return {"params": params}


def fold_model_and_variables(model, variables):
    """(NBP, train variables) -> (NBP(fold_bn=True), folded variables).

    No-op (returns inputs) when the variables carry no batch_stats — either
    already folded or the model has no BN.
    """
    if "batch_stats" not in variables:
        return model, variables
    return model.clone(fold_bn=True), fold_bn_variables(variables)
