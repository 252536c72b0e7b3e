"""SCONE occupancy & visibility networks (Flax).

Ports of macarons/networks/SconeOcc.py and SconeVis.py:

* ``XEmbedding`` (:7-43): 3-layer GELU MLP query-point embedding.
* ``PCTransformer`` (:45-130): point embedding + n_code pre-LN self-attention
  encoders + LayerNorm + Dense, then concat(max-pool, avg-pool) -> a global
  feature per cloud.
* ``SconeOcc`` (:133-346): global transformer on a <= seq_len downsample +
  n_scale local kNN transformers on progressively downsampled clouds (offset
  coordinates), query embedding, 64-d view harmonics, 3-layer GELU MLP head.
* ``SconeVis`` (:6-162): embedding (+ optional global feature) + n_code
  encoders + MLP -> 64 spherical-harmonic coefficients per point;
  ``compute_visibilities`` / ``compute_coverage_gain`` (:164-252) evaluate the
  SH toward candidate cameras (sigmoid, mean over points).

Random downsampling (torch.randperm in the reference) takes an explicit PRNG
key. All shapes static; masks handle shorter clouds.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.spherical import get_spherical_coords
from ..ops.knn import knn_points
from .attention import Embedding, Encoder
from .harmonics import harmonics_up_to_rank


class XEmbedding(nn.Module):
    x_embedding_dim: int = 512
    gelu: bool = True

    @nn.compact
    def __call__(self, x):
        act = nn.gelu if self.gelu else nn.relu
        d = self.x_embedding_dim
        res = act(nn.Dense(d // 4)(x))
        res = act(nn.Dense(d // 2)(res))
        return act(nn.Dense(d)(res))


class PCTransformer(nn.Module):
    pts_dim: int = 3
    pts_embedding_dim: int = 256
    feature_dim: int = 512
    concatenate_input: bool = True
    n_code: int = 2
    n_heads: int = 4
    use_ff: bool = True
    gelu: bool = True

    @nn.compact
    def __call__(self, pc, mask=None):
        n_clouds, seq_len = pc.shape[0], pc.shape[1]
        x = Embedding(self.pts_dim, self.pts_embedding_dim, gelu=self.gelu,
                      concatenate_input=self.concatenate_input)(pc)
        for _ in range(self.n_code):
            x = Encoder(self.pts_embedding_dim, self.pts_embedding_dim // 4,
                        n_heads=self.n_heads, gelu=self.gelu,
                        use_ff=self.use_ff)(x, mask=mask)
        feats = nn.LayerNorm()(x)
        feats = nn.Dense(self.feature_dim // 2)(feats)
        pooled = jnp.concatenate(
            [jnp.max(feats, axis=1), jnp.mean(feats, axis=1)], axis=-1
        )
        return pooled.reshape(n_clouds, self.feature_dim)


class SconeOcc(nn.Module):
    """Occupancy-probability implicit field."""

    seq_len: int = 2048
    pts_dim: int = 3
    pts_embedding_dim: int = 128
    concatenate_input: bool = True
    n_code: int = 2
    n_heads: int = 4
    use_ff: bool = True
    gelu: bool = True
    global_feature_dim: int = 512
    n_scale: int = 3
    local_feature_dim: int = 256
    k_for_knn: int = 16
    x_embedding_dim: int = 512
    n_harmonics: int = 64
    output_dim: int = 1

    @nn.compact
    def __call__(self, pc, x, view_harmonics, key: Optional[jax.Array] = None):
        """pc (B, N, 3), x (B, M, 3), view_harmonics (B, M, n_harmonics)."""
        n_clouds, full_seq_len = pc.shape[0], pc.shape[1]
        n_sample = x.shape[1]
        if key is None:
            key = jax.random.PRNGKey(0)

        # Global encoding on a random <= seq_len downsample (:269-275).
        k_global, k_ds = jax.random.split(key)
        take = min(self.seq_len, full_seq_len)
        perm = jax.random.permutation(k_global, full_seq_len)[:take]
        global_pc = pc[:, perm]
        global_features = PCTransformer(
            pts_dim=self.pts_dim, pts_embedding_dim=self.pts_embedding_dim,
            feature_dim=self.global_feature_dim,
            concatenate_input=self.concatenate_input, n_code=self.n_code,
            n_heads=self.n_heads, use_ff=self.use_ff, gelu=self.gelu,
        )(global_pc)

        # Multi-scale local kNN features (:280-318).
        if self.n_scale > 1:
            ds_factor = int(
                np.power(full_seq_len / (self.k_for_knn * 8),
                         1.0 / (self.n_scale - 1))
            )
            ds_factor = max(ds_factor, 2)
        else:
            ds_factor = 1

        down_pc = pc
        locals_ = []
        for s in range(self.n_scale):
            nbrs, _ = knn_points(x, down_pc, self.k_for_knn)
            local_pc = nbrs - x[:, :, None, :]  # offset coords
            feats = PCTransformer(
                pts_dim=self.pts_dim, pts_embedding_dim=self.pts_embedding_dim,
                feature_dim=self.local_feature_dim,
                concatenate_input=self.concatenate_input, n_code=self.n_code,
                n_heads=self.n_heads, use_ff=self.use_ff, gelu=self.gelu,
            )(local_pc.reshape(-1, self.k_for_knn, 3))
            locals_.append(feats)
            if s < self.n_scale - 1:
                ds_len = max(down_pc.shape[1] // ds_factor, self.k_for_knn)
                perm = jax.random.permutation(
                    jax.random.fold_in(k_ds, s), down_pc.shape[1]
                )[:ds_len]
                down_pc = down_pc[:, perm]

        local_features = jnp.concatenate(locals_, axis=-1).reshape(
            n_clouds, n_sample, self.n_scale * self.local_feature_dim
        )

        x_features = XEmbedding(self.x_embedding_dim, gelu=self.gelu)(x)
        g = jnp.broadcast_to(
            global_features[:, None, :],
            (n_clouds, n_sample, self.global_feature_dim),
        )
        res = jnp.concatenate([g, local_features, x_features, view_harmonics],
                              axis=-1)
        act = nn.gelu if self.gelu else nn.relu
        res = act(nn.Dense(512)(res))
        res = act(nn.Dense(256)(res))
        res = act(nn.Dense(self.output_dim)(res))
        return res.reshape(n_clouds, n_sample, self.output_dim)


class SconeVis(nn.Module):
    """Visibility-gain field as spherical harmonics."""

    pts_dim: int = 4
    pts_embedding_dim: int = 256
    n_heads: int = 4
    n_code: int = 3
    n_harmonics: int = 64
    max_harmonic_rank: int = 8
    use_ff: bool = True
    gelu: bool = True
    use_view_state: bool = True
    use_global_feature: bool = True
    view_state_mode: str = "end"
    concatenate_input: bool = True
    use_sigmoid: bool = True

    @nn.compact
    def __call__(self, pts, mask=None, view_harmonics=None):
        n_clouds, seq_len = pts.shape[0], pts.shape[1]
        add_dim = (self.n_harmonics
                   if self.use_view_state and self.view_state_mode == "start"
                   else 0)
        x = Embedding(self.pts_dim, self.pts_embedding_dim, gelu=self.gelu,
                      global_feature=self.use_global_feature,
                      additional_feature_dim=add_dim,
                      concatenate_input=self.concatenate_input)(
            pts,
            additional_feature=(view_harmonics if add_dim else None),
        )
        for _ in range(self.n_code):
            x = Encoder(self.pts_embedding_dim, self.pts_embedding_dim // 4,
                        n_heads=self.n_heads, gelu=self.gelu,
                        use_ff=self.use_ff)(x, mask=mask)
        res = nn.LayerNorm()(x)

        inner = 3 if (self.use_view_state and self.view_state_mode == "end") else 4
        res = nn.gelu(nn.Dense(inner * self.n_harmonics)(res))
        if self.use_view_state and self.view_state_mode == "end":
            res = jnp.concatenate([res, view_harmonics], axis=-1)
        res = nn.gelu(nn.Dense(2 * self.n_harmonics)(res))
        res = nn.Dense(self.n_harmonics)(res)
        return res.reshape(n_clouds, seq_len, self.n_harmonics)


def visibility_gains(pts: jnp.ndarray, harmonics: jnp.ndarray,
                     X_cam: jnp.ndarray, max_rank: int = 8,
                     use_sigmoid: bool = True) -> jnp.ndarray:
    """Per-point visibility toward each candidate camera
    (SconeVis.compute_visibilities, SconeVis.py:164-208).

    pts (B, N, >=3); harmonics (B, N, n_harm); X_cam (B, C, 3)
    -> (B, C, N).
    """
    rays = X_cam[:, :, None, :] - pts[:, None, :, :3]
    _, elev, azim = get_spherical_coords(rays)
    theta = -elev + math.pi / 2.0
    z = harmonics_up_to_rank(max_rank, theta, azim)  # (B, C, N, n_harm)
    z = jnp.sum(z * harmonics[:, None, :, :], axis=-1)
    return jax.nn.sigmoid(z) if use_sigmoid else jax.nn.relu(z)


def coverage_gain(pts: jnp.ndarray, harmonics: jnp.ndarray,
                  X_cam: jnp.ndarray, max_rank: int = 8,
                  use_sigmoid: bool = True,
                  fov_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Global coverage gain per candidate camera
    (SconeVis.compute_coverage_gain, SconeVis.py:210-252): mean visibility
    over points. (B, C).

    fov_mask (B, C, N): restrict to the points inside each candidate's
    frustum (the reference sums visibility gains over fov proxy points,
    predict_coverage_gain_for_single_camera macarons_utils.py:1909-2080 —
    this is what makes the gain depend on candidate ORIENTATION, not just
    position). Denominator stays pts.shape[1] so masked and unmasked gains
    share a scale."""
    vis = visibility_gains(pts, harmonics, X_cam, max_rank, use_sigmoid)
    if fov_mask is not None:
        vis = vis * fov_mask
    return jnp.sum(vis, axis=-1) / pts.shape[1]
