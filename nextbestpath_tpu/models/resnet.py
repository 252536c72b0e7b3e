"""ResNet-18 building blocks (Flax, NHWC).

The reference composes ManyDepth from torchvision ResNet-18 pieces
(macarons/networks/ManyDepth.py:33-50,421-424): the stem (conv1/bn1/relu/
maxpool) + layer1 as the feature extractor, and layer2-4 as the cost-volume
encoder. ImageNet pretraining is unavailable offline; the blocks initialize
randomly (documented delta — the reference loads pretrained weights from a
bundled file).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=(self.strides,) * 2,
                    padding="SAME", use_bias=False, dtype=self.dtype)(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features, (1, 1),
                               strides=(self.strides,) * 2, use_bias=False,
                               dtype=self.dtype)(residual)
            residual = nn.BatchNorm(use_running_average=not train,
                                    dtype=jnp.float32)(residual)
        return nn.relu(y + residual)


class ResNetLayer(nn.Module):
    """Two BasicBlocks, the first possibly strided (ResNet-18 layout)."""

    features: int
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BasicBlock(self.features, self.strides, dtype=self.dtype)(x, train)
        x = BasicBlock(self.features, 1, dtype=self.dtype)(x, train)
        return x


class ResNetStem(nn.Module):
    """conv1 (7x7 s2) + bn + relu; maxpool applied by the caller."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(x)
        return nn.relu(x)


def maxpool_stem(x):
    """torch's maxpool(3, stride 2, padding 1)."""
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
