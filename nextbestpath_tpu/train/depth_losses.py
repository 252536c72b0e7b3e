"""Self-supervised depth losses (photometric + smoothness + error mask).

Ports of the reference's depth supervision stack:
- SSIM with a gaussian window (window 5, sigma 1.5 per config
  _depth_module; macarons/networks/ManyDepth.py:810-842),
- photometric reconstruction loss: warp each alpha frame to the target view
  through the predicted depth, 0.85*SSIM + 0.15*L1, MIN over alphas, masked
  mean (get_reconstruction_loss_fn, macarons_utils.py:1292-1388),
- edge-aware disparity regularity (regularity_tab,
  macarons/utility/depth_model_utils.py:522-563),
- the regularity-based error mask of obtain_depth
  (long_term_utils.py:132-141): per-pixel error above mean+std is masked out.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..geometry.cameras import CameraIntrinsics, unproject_depth
from ..models.manydepth import _warp_features


def _gaussian_kernel(size: int = 5, sigma: float = 1.5):
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    g = g / jnp.sum(g)
    return g[:, None] * g[None, :]


def _filter2d(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 2D filter on (H, W, C) with SAME padding."""
    k = kernel[:, :, None, None]
    x = img[None]
    out = jax.lax.conv_general_dilated(
        x.transpose(0, 3, 1, 2).reshape(-1, 1, *img.shape[:2]),
        k.transpose(2, 3, 0, 1),
        window_strides=(1, 1), padding="SAME",
    )
    return out.reshape(img.shape[2], *img.shape[:2]).transpose(1, 2, 0)


def ssim(a: jnp.ndarray, b: jnp.ndarray, window: int = 5,
         sigma: float = 1.5) -> jnp.ndarray:
    """Per-pixel SSIM map of two (H, W, C) images in [0, 1]."""
    C1 = 0.01 ** 2
    C2 = 0.03 ** 2
    kern = _gaussian_kernel(window, sigma)
    mu_a = _filter2d(a, kern)
    mu_b = _filter2d(b, kern)
    sa = _filter2d(a * a, kern) - mu_a ** 2
    sb = _filter2d(b * b, kern) - mu_b ** 2
    sab = _filter2d(a * b, kern) - mu_a * mu_b
    num = (2 * mu_a * mu_b + C1) * (2 * sab + C2)
    den = (mu_a ** 2 + mu_b ** 2 + C1) * (sa + sb + C2)
    return num / den


def photometric_loss(target: jnp.ndarray, depth: jnp.ndarray,
                     R: jnp.ndarray, T: jnp.ndarray,
                     alpha_images: jnp.ndarray, R_alpha: jnp.ndarray,
                     T_alpha: jnp.ndarray, intr: CameraIntrinsics,
                     mask: Optional[jnp.ndarray] = None,
                     ssim_factor: float = 0.85) -> jnp.ndarray:
    """Min-over-alpha 0.85*SSIM + 0.15*L1 reprojection loss.

    target (H, W, 3); depth (H, W); alpha_images (A, H, W, 3) with cameras
    R_alpha/T_alpha (A, ...).
    """
    world = unproject_depth(depth, R, T, intr)

    def warp_one(img_a, Ra, Ta):
        return _warp_features(world, img_a, Ra, Ta, intr).reshape(
            target.shape)

    warped = jax.vmap(warp_one)(alpha_images, R_alpha, T_alpha)  # (A, H, W, 3)
    l1 = jnp.mean(jnp.abs(warped - target[None]), axis=-1)
    ssim_maps = jax.vmap(lambda wrp: jnp.mean(
        (1.0 - ssim(wrp, target)) / 2.0, axis=-1))(warped)
    per_alpha = ssim_factor * ssim_maps + (1.0 - ssim_factor) * l1
    err = jnp.min(per_alpha, axis=0)
    if mask is not None:
        return jnp.sum(err * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.mean(err)


def regularity_tab(disp: jnp.ndarray, img: jnp.ndarray) -> jnp.ndarray:
    """Edge-aware disparity gradient map (depth_model_utils.py:522-563).

    disp (H, W); img (H, W, 3). Returns (H-2, W-2) interior error map using
    reflect-padded central differences like the reference's padded call.
    """
    dpad = jnp.pad(disp, 1, mode="reflect")
    ipad = jnp.pad(img, ((1, 1), (1, 1), (0, 0)), mode="reflect")
    ddx = jnp.abs(dpad[1:-1, 2:] - dpad[1:-1, :-2])
    ddy = jnp.abs(dpad[2:, 1:-1] - dpad[:-2, 1:-1])
    idx = jnp.mean(jnp.abs(ipad[1:-1, 2:] - ipad[1:-1, :-2]), axis=-1)
    idy = jnp.mean(jnp.abs(ipad[2:, 1:-1] - ipad[:-2, 1:-1]), axis=-1)
    return ddx * jnp.exp(-idx) + ddy * jnp.exp(-idy)


def regularity_loss(disp: jnp.ndarray, img: jnp.ndarray,
                    mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mean edge-aware smoothness of mean-normalized disparity."""
    norm = disp / (jnp.mean(disp) + 1e-7)
    tab = regularity_tab(norm, img)
    if mask is not None:
        return jnp.sum(tab * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.mean(tab)


def error_mask_from_disparity(disp: jnp.ndarray, img: jnp.ndarray,
                              mask: jnp.ndarray) -> jnp.ndarray:
    """The obtain_depth error mask (long_term_utils.py:132-141): pixels whose
    edge-aware regularity exceeds mean+std are dropped."""
    norm = disp / (jnp.mean(disp) + 1e-7)
    norm = jnp.where(mask, norm, 0.0)
    tab = regularity_tab(norm, img)
    thr = jnp.mean(tab) + jnp.std(tab)
    return tab < thr
