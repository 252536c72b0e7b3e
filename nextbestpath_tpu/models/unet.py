"""NBP dual-decoder attention U-Net (Flax).

Exact topology of the reference model (next_best_path/networks/nbp_model.py):

* input 5 x 256 x 256 (4 height-sliced point-cloud projections + 1 trajectory
  image) — here NHWC: (B, 256, 256, 5),
* encoder conv blocks 64 -> 128 -> 256 -> 512 -> 1024 with 2x2 max-pooling
  (:70-74),
* decoder 1 (value map): two up-conv stages with attention-gated skips,
  1x1 conv to 8 azimuth channels at 64 x 64 (:85,126-135),
* decoder 2 (obstacle map): four up-conv stages, 1x1 conv + sigmoid at
  256 x 256 (:104-107,137-158),
* homoscedastic-uncertainty two-task loss combining pixel MSE and layout BCE
  with learned log-variances (:108,162-173).

BatchNorm keeps the reference's semantics (running stats with torch's
update rate: torch BatchNorm2d momentum 0.1 == flax momentum 0.9, since
flax computes ra = m*ra + (1-m)*batch; batch 56 train /
batch 1 eval). Under data parallelism use `axis_name` so BN reduces across
replicas (the SyncBatchNorm analog, macarons_utils.py:484-489).

Init matches torch's Conv2d default (kaiming_uniform(a=sqrt(5)) == uniform
variance scaling 1/3 fan_in; bias uniform(+-1/sqrt(fan_in))).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

KernelInit = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def _torch_bias_init(key, shape, dtype, fan_in: int):
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class TorchConv(nn.Module):
    """Conv2d with torch-default init."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1] * self.kernel_size[0] * self.kernel_size[1]
        return nn.Conv(
            self.features,
            self.kernel_size,
            padding="SAME",
            use_bias=True,
            kernel_init=KernelInit,
            bias_init=lambda k, s, d=jnp.float32: _torch_bias_init(k, s, d, fan_in),
            dtype=self.dtype,
        )(x)


class ConvBlock(nn.Module):
    """conv_block (nbp_model.py:8-21): (Conv3x3 -> BN -> ReLU) x 2."""

    features: int
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        for _ in range(2):
            x = TorchConv(self.features, dtype=self.dtype)(x)
            if not self.fold_bn:
                x = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, axis_name=self.axis_name,
                                 dtype=jnp.float32)(x)
            x = nn.relu(x)
        return x


class UpConv(nn.Module):
    """up_conv (nbp_model.py:23-34): 2x nearest upsample -> Conv -> BN -> ReLU."""

    features: int
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")
        x = TorchConv(self.features, dtype=self.dtype)(x)
        if not self.fold_bn:
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=0.9, axis_name=self.axis_name,
                             dtype=jnp.float32)(x)
        return nn.relu(x)


class AttentionGate(nn.Module):
    """Attention_block (nbp_model.py:36-62)."""

    f_int: int
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None
    fold_bn: bool = False

    @nn.compact
    def __call__(self, g, x, train: bool):
        def bn(h):
            if self.fold_bn:
                return h
            return nn.BatchNorm(use_running_average=not train,
                                momentum=0.9, axis_name=self.axis_name,
                                dtype=jnp.float32)(h)

        g1 = bn(TorchConv(self.f_int, (1, 1), dtype=self.dtype)(g))
        x1 = bn(TorchConv(self.f_int, (1, 1), dtype=self.dtype)(x))
        psi = nn.relu(g1 + x1)
        psi = nn.sigmoid(bn(TorchConv(1, (1, 1), dtype=self.dtype)(psi)))
        return x * psi


class NBP(nn.Module):
    """Dual-decoder attention U-Net (nbp_model.py:64-160). NHWC.

    __call__(x (B, 256, 256, 5)) -> (value_map (B, 64, 64, 8),
                                      obstacle_map (B, 256, 256, 1)).
    """

    img_ch: int = 5
    output_ch1: int = 8
    output_ch2: int = 1
    width: int = 64  # encoder base width (reference: 64 -> ... -> 1024)
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None
    # Inference mode: BatchNorm folded into the preceding conv's kernel/bias
    # (use with variables from models.fold.fold_bn_variables). Removes every
    # BN op (f32 scale/shift over full-res activations) from the eval forward.
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, axis_name=self.axis_name,
                  fold_bn=self.fold_bn)
        pool = lambda h: nn.max_pool(h, (2, 2), strides=(2, 2))
        w = self.width

        x1 = ConvBlock(w, **kw)(x, train)
        x2 = ConvBlock(2 * w, **kw)(pool(x1), train)
        x3 = ConvBlock(4 * w, **kw)(pool(x2), train)
        x4 = ConvBlock(8 * w, **kw)(pool(x3), train)
        x5 = ConvBlock(16 * w, **kw)(pool(x4), train)

        # Decoder 1 -> value map at 64 x 64 with 8 orientation channels.
        d5 = UpConv(8 * w, **kw)(x5, train)
        a4 = AttentionGate(4 * w, **kw)(d5, x4, train)
        d5 = ConvBlock(8 * w, **kw)(jnp.concatenate([a4, d5], axis=-1), train)
        d4 = UpConv(4 * w, **kw)(d5, train)
        a3 = AttentionGate(2 * w, **kw)(d4, x3, train)
        d4 = ConvBlock(4 * w, **kw)(jnp.concatenate([a3, d4], axis=-1), train)
        out1 = TorchConv(self.output_ch1, (1, 1), dtype=self.dtype,
                         name="final1")(d4)

        # Decoder 2 -> obstacle map at full resolution.
        e5 = UpConv(8 * w, **kw)(x5, train)
        b4 = AttentionGate(4 * w, **kw)(e5, x4, train)
        e5 = ConvBlock(8 * w, **kw)(jnp.concatenate([b4, e5], axis=-1), train)
        e4 = UpConv(4 * w, **kw)(e5, train)
        b3 = AttentionGate(2 * w, **kw)(e4, x3, train)
        e4 = ConvBlock(4 * w, **kw)(jnp.concatenate([b3, e4], axis=-1), train)
        e3 = UpConv(2 * w, **kw)(e4, train)
        b2 = AttentionGate(w, **kw)(e3, x2, train)
        e3 = ConvBlock(2 * w, **kw)(jnp.concatenate([b2, e3], axis=-1), train)
        e2 = UpConv(w, **kw)(e3, train)
        b1 = AttentionGate(w // 2, **kw)(e2, x1, train)
        e2 = ConvBlock(w, **kw)(jnp.concatenate([b1, e2], axis=-1), train)
        out2 = nn.sigmoid(TorchConv(self.output_ch2, (1, 1), dtype=self.dtype,
                                    name="final2")(e2))

        log_vars = self.param("log_vars", nn.initializers.zeros, (2,))
        del log_vars  # registered here; consumed by nbp_loss via params
        return out1.astype(jnp.float32), out2.astype(jnp.float32)


def nbp_loss(log_vars: jnp.ndarray, pred_values: jnp.ndarray,
             target_values: jnp.ndarray, pred_layout: jnp.ndarray,
             target_layout: jnp.ndarray,
             value_weight: Optional[jnp.ndarray] = None,
             sample_weight: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Homoscedastic two-task loss (nbp_model.py:162-173).

    loss = MSE(values) / (2 sigma1^2) + lv0 + BCE(layout) / sigma2^2 + lv1,
    sigma_i^2 = exp(2 lv_i). `value_weight` masks padded value-pixel slots;
    `sample_weight` (B,) masks padded batch rows in the layout BCE.
    """
    sigma1_sq = jnp.exp(2.0 * log_vars[0])
    sigma2_sq = jnp.exp(2.0 * log_vars[1])
    se = (pred_values - target_values) ** 2
    if value_weight is not None:
        mse = jnp.sum(se * value_weight) / jnp.maximum(jnp.sum(value_weight), 1.0)
    else:
        mse = jnp.mean(se)
    eps = 1e-7
    p = jnp.clip(pred_layout, eps, 1.0 - eps)
    bce_map = -(target_layout * jnp.log(p)
                + (1.0 - target_layout) * jnp.log(1.0 - p))
    if sample_weight is not None:
        per_sample = jnp.mean(bce_map.reshape(bce_map.shape[0], -1), axis=-1)
        bce = jnp.sum(per_sample * sample_weight) / jnp.maximum(
            jnp.sum(sample_weight), 1.0)
    else:
        bce = jnp.mean(bce_map)
    loss1 = mse / (2.0 * sigma1_sq) + log_vars[0]
    loss2 = bce / sigma2_sq + log_vars[1]
    return loss1 + loss2
