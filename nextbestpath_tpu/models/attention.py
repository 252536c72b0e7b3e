"""Point-cloud attention blocks (Flax).

Port of macarons/networks/Attention.py with identical quirks:
- attention scores are scaled by 1/sqrt(d) AFTER the optional mask fill
  (mask fill value -1e3, not -inf) (:8-37),
- Embedding computes its inner/feature dims by subtracting the optional
  global-feature/additional-feature/raw-input concat dims (:39-129),
- MultiHeadSelfAttention applies the output projection only when
  n_heads > 1 (:131-205),
- pre-LayerNorm residual Encoder with optional FeedForward (:239-298).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.knn import knn_indices


def attention(q, k, v, mask=None):
    scores = jnp.einsum("...nd,...md->...nm", q, k)
    if mask is not None:
        scores = jnp.where(mask == 0, -1e3, scores)
    scores = scores / math.sqrt(q.shape[-1])
    scores = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("...nm,...md->...nd", scores, v)


class Embedding(nn.Module):
    input_dim: int
    output_dim: int
    gelu: bool = True
    global_feature: bool = False
    additional_feature_dim: int = 0
    concatenate_input: bool = True
    k_for_knn: int = 0

    @nn.compact
    def __call__(self, x, additional_feature=None):
        feature_dim = self.output_dim
        if self.additional_feature_dim > 0:
            feature_dim -= self.additional_feature_dim
        if self.concatenate_input:
            feature_dim -= self.input_dim
        if self.global_feature:
            feature_dim //= 2
        inner_dim = feature_dim if (
            self.additional_feature_dim > 0 or self.concatenate_input
            or self.global_feature
        ) else self.output_dim // 2

        act = nn.gelu if self.gelu else nn.relu
        res = act(nn.Dense(inner_dim)(x))
        res = nn.Dense(feature_dim)(res)

        if self.k_for_knn > 0:
            idx = knn_indices(x[..., :3], x[..., :3], self.k_for_knn)
            gathered = jax.vmap(lambda r, i: r[i])(res, idx)  # (B, N, k, F)
            res = jnp.max(gathered, axis=-2)

        if self.global_feature:
            g = jnp.max(res, axis=-2, keepdims=True)
            res = jnp.concatenate(
                [res, jnp.broadcast_to(g, res.shape)], axis=-1
            )
        if self.additional_feature_dim > 0:
            res = jnp.concatenate([res, additional_feature], axis=-1)
        if self.concatenate_input:
            res = jnp.concatenate([res, x], axis=-1)
        return res


class MultiHeadSelfAttention(nn.Module):
    n_heads: int
    in_dim: int
    qk_dim: int

    @nn.compact
    def __call__(self, x, mask=None):
        B = x.shape[0]
        q = nn.Dense(self.qk_dim)(x)
        k = nn.Dense(self.qk_dim)(x)
        v = nn.Dense(self.in_dim)(x)
        h = self.n_heads
        q = q.reshape(B, -1, h, self.qk_dim // h).swapaxes(1, 2)
        k = k.reshape(B, -1, h, self.qk_dim // h).swapaxes(1, 2)
        v = v.reshape(B, -1, h, self.in_dim // h).swapaxes(1, 2)
        scores = attention(q, k, v, mask)
        scores = scores.swapaxes(1, 2).reshape(B, -1, self.in_dim)
        if self.n_heads > 1:
            scores = nn.Dense(self.in_dim)(scores)
        return scores


class FeedForward(nn.Module):
    input_dim: int
    inner_dim: int
    gelu: bool = True

    @nn.compact
    def __call__(self, x):
        act = nn.gelu if self.gelu else nn.relu
        return nn.Dense(self.input_dim)(act(nn.Dense(self.inner_dim)(x)))


class Encoder(nn.Module):
    embedding_dim: int
    qk_dim: int
    n_heads: int = 1
    gelu: bool = True
    use_ff: bool = True

    @nn.compact
    def __call__(self, x, mask=None):
        res = nn.LayerNorm()(x)
        res = MultiHeadSelfAttention(self.n_heads, self.embedding_dim,
                                     self.qk_dim)(res, mask=mask)
        res = x + res
        if self.use_ff:
            res2 = nn.LayerNorm()(res)
            res2 = FeedForward(self.embedding_dim, 2 * self.embedding_dim,
                               gelu=self.gelu)(res2)
            res = res + res2
        return res
