"""ManyDepth-style self-supervised multi-frame depth network (Flax, NHWC).

Port of macarons/networks/ManyDepth.py with the reference's constants
(:18-29): 256x456 input, depth in [0.5, 750], 96 cost-volume planes,
pose_factor 100, learn_pose=False (ground-truth relative poses are provided
— PoseDecoder is therefore implemented but unused by default, matching the
NBP pipeline which always runs perfect depth anyway).

Components:
* FeatureExtractor (:33-50): ResNet-18 stem + layer1 -> 64ch at H/4.
* CostVolumeBuilder (:80-305): plane-sweep — unproject target pixels at each
  of n_depth depth planes, warp source (alpha) features through the source
  cameras via bilinear sampling, mean over alphas, per-plane L1 feature
  distance -> cost volume; concat with target features -> 3x3 conv.
* DepthDecoder (:387-531): ResNet layers2-4 on the reduced cost volume +
  5 ExpansionLayers with skip connections -> 4-scale sigmoid disparities.
* depth = 1 / (a * disp + b) with a = 1/d_min - 1/d_max, b = 1/d_max
  (depth_model_utils.py:844-855).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..geometry.cameras import (
    CameraIntrinsics,
    ndc_tables,
    project_points,
    world_to_view,
)
from ..ops.depth_sample import grid_sample_bilinear
from .resnet import ResNetLayer, ResNetStem, maxpool_stem

D_MIN = 0.5
D_MAX = 750.0
N_DEPTH = 96
POSE_FACTOR = 100.0


def disparity_to_depth(disp, d_min: float = D_MIN, d_max: float = D_MAX):
    """depth = 1 / (a*disp + b) (compute_depth_from_disparity,
    depth_model_utils.py:844-848)."""
    a = 1.0 / d_min - 1.0 / d_max
    b = 1.0 / d_max
    return 1.0 / (a * disp + b)


def depth_to_disparity(depth, d_min: float = D_MIN, d_max: float = D_MAX):
    a = 1.0 / d_min - 1.0 / d_max
    b = 1.0 / d_max
    return (1.0 / depth - b) / a


class FeatureExtractor(nn.Module):
    """Standalone stem+layer1 feature extractor (FeatureExtractor,
    ManyDepth.py:33-50). ManyDepth.__call__ inlines the SAME stack instead
    of using this class because it also needs the pre-pool conv1 activation
    as a decoder skip; keep the two in sync."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ResNetStem(dtype=self.dtype)(x, train)
        x = maxpool_stem(x)
        return ResNetLayer(64, 1, dtype=self.dtype)(x, train)


def _warp_features(world_points, features, R, T, intr: CameraIntrinsics,
                   padding: str = "zeros"):
    """Sample `features` (h, w, C) at the projections of world_points (N, 3)
    through camera (R, T); normalized grid like the reference's warp
    (:146-205, factor = -min(h, w)).

    padding='zeros' (the cost-volume mode, warp() default :151) zeroes
    out-of-bounds samples AND rejects behind-camera points: project_points
    divides by view z, so a point behind the source camera (z < 0) projects
    to a sign-flipped location that can land inside [-1, 1] and sample
    mirrored features into the cost volume at wrong depths.
    padding='border' clamp-samples like grid_sample(padding_mode='border')
    — the mode the reference's RECONSTRUCTION loss uses
    (get_reconstruction_loss_fn, macarons_utils.py:1305 padding_mode
    default 'border'), with no rejection at all.

    Known reference quirk, reproduced faithfully: world points are
    unprojected from (m-1)-denominator NDC tables (reproject_depth_map,
    ManyDepth.py:128-129 == geometry.cameras.ndc_tables) but this grid
    conversion assumes true (2j+1)/m pixel centers, a sub-pixel scale
    skew (exact at the image center, +-0.5 px at the edges at 256x456).
    A same-camera warp is therefore depth-independent but not a perfect
    identity — tested in test_manydepth.py."""
    h, w = features.shape[:2]
    proj = project_points(world_points, R, T, intr.tan_half_fov)
    factor = -float(min(h, w))
    gx = factor / w * proj[..., 0]
    gy = factor / h * proj[..., 1]
    sampled = jax.vmap(
        lambda c: grid_sample_bilinear(c, gx, gy), in_axes=-1, out_axes=-1
    )(features)
    if padding == "border":
        return sampled
    inside = ((jnp.abs(gx) <= 1.0) & (jnp.abs(gy) <= 1.0)
              & (proj[..., 2] > 0.0))
    return sampled * inside[..., None]


class CostVolumeBuilder(nn.Module):
    """Plane-sweep cost volume at feature resolution (H/4, W/4)."""

    intr: CameraIntrinsics
    n_depth: int = N_DEPTH
    d_min: float = D_MIN
    d_max: float = D_MAX
    output_channels: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, R, T, feats_alpha, R_alpha, T_alpha,
                 return_cost_volume: bool = False):
        """feats (B, h, w, 64); R/T target cameras; feats_alpha
        (B, A, h, w, 64) with alpha cameras R_alpha/T_alpha (B, A, 3, 3)."""
        B, h, w, C = feats.shape
        A = feats_alpha.shape[1]
        intr = self.intr
        fh = CameraIntrinsics(image_height=h, image_width=w,
                              fov_degrees=intr.fov_degrees, znear=intr.znear,
                              zfar=intr.zfar)
        ndc_x, ndc_y = ndc_tables(h, w)
        t = fh.tan_half_fov
        d_view = jnp.stack([ndc_x * t, ndc_y * t, jnp.ones_like(ndc_x)],
                           axis=-1).reshape(-1, 3)
        depth_bins = jnp.linspace(self.d_min, self.d_max, self.n_depth)

        def per_image(f, Ri, Ti, fa, Ra, Ta):
            eye = jnp.matmul(-Ti, Ri.T, precision=jax.lax.Precision.HIGHEST)
            d_world = jnp.matmul(d_view, Ri.T,
                                 precision=jax.lax.Precision.HIGHEST)

            def per_depth(d):
                wp = eye[None, :] + d * d_world  # (h*w, 3)
                warped = jax.vmap(
                    lambda fa_i, Ra_i, Ta_i: _warp_features(wp, fa_i, Ra_i,
                                                            Ta_i, fh)
                )(fa, Ra, Ta)  # (A, h*w, C)
                mean_w = jnp.mean(warped, axis=0).reshape(h, w, C)
                return jnp.sum(jnp.abs(mean_w - f), axis=-1) / C

            cv = jax.vmap(per_depth)(depth_bins)  # (n_depth, h, w)
            return jnp.transpose(cv, (1, 2, 0))

        cost_volume = jax.vmap(per_image)(feats, R, T, feats_alpha, R_alpha,
                                          T_alpha)  # (B, h, w, n_depth)
        res = jnp.concatenate([feats, cost_volume], axis=-1)
        res = nn.relu(nn.Conv(self.output_channels, (3, 3), padding="SAME",
                              dtype=self.dtype)(res))
        if return_cost_volume:
            return res, cost_volume
        return res


class ExpansionLayer(nn.Module):
    inner_channels: int
    output_channels: int
    output_size: Tuple[int, int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, x_add=None):
        x = nn.elu(nn.ConvTranspose(self.inner_channels, (3, 3),
                                    padding="SAME", dtype=self.dtype)(x))
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B,) + self.output_size + (C,), "nearest")
        if x_add is not None:
            x = jnp.concatenate([x, x_add], axis=-1)
        return nn.elu(nn.Conv(self.output_channels, (3, 3), padding="SAME",
                              dtype=self.dtype)(x))


class DisparityLayer(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.sigmoid(nn.Conv(1, (3, 3), padding="SAME",
                                  dtype=self.dtype)(x))


def axis_angle_to_matrix(aa: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: (..., 3) axis-angle -> (..., 3, 3) rotation matrix
    (the reference composes poses with pytorch3d axis_angle_to_matrix,
    ManyDepth.py:740-748)."""
    theta = jnp.linalg.norm(aa, axis=-1, keepdims=True)
    axis = aa / jnp.maximum(theta, 1e-12)
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    zero = jnp.zeros_like(x)
    K = jnp.stack([
        jnp.stack([zero, -z, y], axis=-1),
        jnp.stack([z, zero, -x], axis=-1),
        jnp.stack([-y, x, zero], axis=-1),
    ], axis=-2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=aa.dtype), K.shape)
    s = jnp.sin(theta)[..., None]
    c = jnp.cos(theta)[..., None]
    return eye + s * K + (1 - c) * jnp.matmul(K, K)


class PoseDecoder(nn.Module):
    """6-DoF relative pose from a target/source frame pair
    (ManyDepth.py:554-677: ResNet-style encoder over the 6-channel concat,
    squeeze convs, spatial mean, x0.01 scale -> axis-angle + translation).

    The whole reference pipeline runs learn_pose=False (ground-truth camera
    poses are always available, ManyDepth.py:729-734), so this head is OFF
    by default and exists for capability parity (VERDICT round 1, #10).
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, target, source, train: bool = False):
        x = jnp.concatenate([target, source], axis=-1)  # (B, H, W, 6)
        x = ResNetStem(dtype=self.dtype, name="stem")(x, train)
        x = maxpool_stem(x)
        x = ResNetLayer(64, 1, dtype=self.dtype)(x, train)
        x = ResNetLayer(128, 2, dtype=self.dtype)(x, train)
        x = nn.relu(nn.Conv(256, (1, 1), dtype=self.dtype)(x))
        x = nn.relu(nn.Conv(256, (3, 3), padding="SAME", dtype=self.dtype)(x))
        x = nn.Conv(6, (1, 1), dtype=self.dtype)(x)
        out = jnp.mean(x, axis=(1, 2)) * 0.01
        return out[..., :3], out[..., 3:]

    @staticmethod
    def compose(R, T, axisangle, translation,
                pose_factor: float = POSE_FACTOR):
        """Target camera (R, T) + predicted relative pose -> source camera.

        Row-vector world-to-view convention (X_v = X_w R + T):
        X_src = X_tgt R_rel + t_rel * pose_factor, so
        R_src = R R_rel, T_src = T R_rel + t_rel * pose_factor
        (convert_matrix_to_pose semantics, depth_model_utils.py:858-870).
        """
        R_rel = axis_angle_to_matrix(axisangle)
        t = translation * pose_factor
        R_src = jnp.matmul(R, R_rel, precision=jax.lax.Precision.HIGHEST)
        T_src = jnp.matmul(T[..., None, :], R_rel,
                           precision=jax.lax.Precision.HIGHEST)[..., 0, :] + t
        return R_src, T_src


class ManyDepth(nn.Module):
    """Full depth network: (images, poses) -> 4-scale disparities.

    __call__ args (NHWC):
      x (B, H, W, 3) target images; R/T target cameras;
      x_alpha (B, A, H, W, 3) context frames; R_alpha/T_alpha their cameras.
    Returns (disp1 full res, disp2 H/2, disp3 H/4, disp4 H/8).
    """

    intr: CameraIntrinsics = CameraIntrinsics(image_height=256,
                                              image_width=456)
    n_depth: int = N_DEPTH
    d_min: float = D_MIN
    d_max: float = D_MAX
    use_input_image_in_skip: bool = True
    learn_pose: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, R, T, x_alpha, R_alpha=None, T_alpha=None,
                 train: bool = False):
        B, H, W, _ = x.shape
        A = x_alpha.shape[1]
        if R_alpha is None or T_alpha is None:
            # Context-camera poses from the PoseDecoder (learn_pose=True
            # path, ManyDepth.py:698-758; the reference asserts gt_pose is
            # given when not learning pose, :729-734 — same here).
            if not self.learn_pose:
                raise ValueError("R_alpha/T_alpha required when "
                                 "learn_pose=False (ManyDepth.py:729-734)")
            pd = PoseDecoder(dtype=self.dtype, name="pose_decoder")
            pairs = [pd(x, x_alpha[:, i], train) for i in range(A)]
            aas = jnp.stack([p[0] for p in pairs], axis=1)  # (B, A, 3)
            trs = jnp.stack([p[1] for p in pairs], axis=1)
            R_alpha, T_alpha = PoseDecoder.compose(
                R[:, None], T[:, None], aas, trs)
        stem = ResNetStem(dtype=self.dtype, name="stem")
        layer1 = ResNetLayer(64, 1, dtype=self.dtype, name="layer1")

        conv1 = stem(x, train)
        feats = layer1(maxpool_stem(conv1), train)

        xa = x_alpha.reshape(B * A, H, W, 3)
        conv1_a = stem(xa, train)
        feats_a = layer1(maxpool_stem(conv1_a), train)
        feats_a = feats_a.reshape(B, A, (H + 3) // 4, (W + 3) // 4, 64)

        reduced = CostVolumeBuilder(
            intr=self.intr, n_depth=self.n_depth, d_min=self.d_min,
            d_max=self.d_max, dtype=self.dtype, name="cost_volume",
        )(feats, R, T, feats_a, R_alpha, T_alpha)

        layer2 = ResNetLayer(128, 2, dtype=self.dtype)(reduced, train)
        layer3 = ResNetLayer(256, 2, dtype=self.dtype)(layer2, train)
        layer4 = ResNetLayer(512, 2, dtype=self.dtype)(layer3, train)

        def size(div):
            # SAME-padded stride-2 stacks produce ceil-divided sizes on
            # BOTH axes (floor on H crashed reshapes for H % 32 != 0).
            return (H // div + (1 if H % div else 0),
                    W // div + (1 if W % div else 0))

        iconv5 = ExpansionLayer(256, 256, size(16), dtype=self.dtype)(
            layer4, layer3)
        iconv4 = ExpansionLayer(128, 128, size(8), dtype=self.dtype)(
            iconv5, layer2)
        disp4 = DisparityLayer(dtype=self.dtype)(iconv4)
        iconv3 = ExpansionLayer(64, 64, size(4), dtype=self.dtype)(
            iconv4, feats)
        disp3 = DisparityLayer(dtype=self.dtype)(iconv3)
        iconv2 = ExpansionLayer(32, 32, size(2), dtype=self.dtype)(
            iconv3, conv1)
        disp2 = DisparityLayer(dtype=self.dtype)(iconv2)
        x_add = x if self.use_input_image_in_skip else None
        iconv1 = ExpansionLayer(16, 16, (H, W), dtype=self.dtype)(
            iconv2, x_add)
        disp1 = DisparityLayer(dtype=self.dtype)(iconv1)
        return disp1, disp2, disp3, disp4
