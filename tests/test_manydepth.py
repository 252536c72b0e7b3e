import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nextbestpath_tpu.geometry import CameraIntrinsics, get_camera_RT
from nextbestpath_tpu.models.manydepth import (
    CostVolumeBuilder,
    ManyDepth,
    depth_to_disparity,
    disparity_to_depth,
)
from nextbestpath_tpu.train.depth_losses import (
    error_mask_from_disparity,
    photometric_loss,
    regularity_loss,
    ssim,
)


def test_disparity_depth_roundtrip():
    d = jnp.asarray([0.5, 1.0, 10.0, 750.0])
    back = disparity_to_depth(depth_to_disparity(d))
    np.testing.assert_allclose(np.asarray(back), np.asarray(d), rtol=1e-5)
    # disp=1 -> d_min, disp=0 -> d_max
    assert abs(float(disparity_to_depth(jnp.float32(1.0))) - 0.5) < 1e-6
    assert abs(float(disparity_to_depth(jnp.float32(0.0))) - 750.0) < 1e-3


def test_ssim_identity():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((16, 24, 3)).astype(np.float32))
    s = np.asarray(ssim(img, img))
    assert s.min() > 0.99


def test_ssim_bounded_on_flat_images():
    """|SSIM| <= 1 + O(eps) even on flat regions.

    Regression for the round-3 depth probe: under TPU default precision
    the fp32 moment convs ran as bf16 MXU passes, E[a^2] - mu^2 cancelled
    catastrophically on flat gray renders, the denominator flipped sign
    and SSIM reached |20| — photometric losses went NEGATIVE. _filter2d
    now forces Precision.HIGHEST and ssim() clamps variances at 0, which
    restores the mathematical bound on every backend."""
    rng = np.random.default_rng(1)
    for level in (0.0, 0.5, 1.0):
        a = jnp.full((32, 48, 3), level, jnp.float32)
        b = a + jnp.asarray(
            rng.normal(0, 1e-4, (32, 48, 3)).astype(np.float32))
        s = np.asarray(ssim(a, b))
        assert s.max() <= 1.0 + 1e-3 and s.min() >= -1.0 - 1e-3
    # jitted, as the online trainer runs it
    a = jnp.asarray(rng.random((32, 48, 3)).astype(np.float32))
    flat = jnp.full_like(a, 0.7)
    s = np.asarray(jax.jit(ssim)(a, flat))
    assert s.max() <= 1.0 + 1e-3 and s.min() >= -1.0 - 1e-3


@pytest.mark.slow
def test_manydepth_forward_shapes():
    intr = CameraIntrinsics(image_height=32, image_width=56)
    model = ManyDepth(intr=intr, n_depth=8)
    B, A = 1, 2
    x = jnp.zeros((B, 32, 56, 3))
    xa = jnp.zeros((B, A, 32, 56, 3))
    R, T = get_camera_RT(jnp.zeros((B, 3)), jnp.zeros((B, 2)))
    Ra = jnp.broadcast_to(R[:, None], (B, A, 3, 3))
    Ta = jnp.broadcast_to(T[:, None], (B, A, 3))
    variables = jax.jit(
        lambda k: model.init(k, x, R, T, xa, Ra, Ta, train=False)
    )(jax.random.PRNGKey(0))
    d1, d2, d3, d4 = jax.jit(
        lambda v: model.apply(v, x, R, T, xa, Ra, Ta, train=False)
    )(variables)
    assert d1.shape == (B, 32, 56, 1)
    assert d2.shape == (B, 16, 28, 1)
    assert d3.shape == (B, 8, 14, 1)
    assert d4.shape == (B, 4, 7, 1)
    for d in (d1, d2, d3, d4):
        assert float(d.min()) >= 0.0 and float(d.max()) <= 1.0


def test_photometric_loss_small_for_static_identical_views():
    """Same camera, same image, correct depth -> near-identity warp.

    Not exactly zero: the reference's grid_sample(align_corners=False) over
    its NDC tables carries an inherent sub-pixel offset (faithfully
    reproduced), so a smooth image incurs only a small interpolation error
    while a wrong camera/depth gives a large one."""
    intr = CameraIntrinsics(image_height=16, image_width=28, zfar=100.0)
    R, T = get_camera_RT(jnp.zeros((1, 3)), jnp.asarray([[0.0, 0.0]]))
    ii, jj = np.meshgrid(np.arange(16), np.arange(28), indexing="ij")
    smooth = (ii / 15.0 * 0.5 + jj / 27.0 * 0.5).astype(np.float32)
    target = jnp.asarray(np.stack([smooth] * 3, axis=-1))
    depth = jnp.full((16, 28), 10.0)
    loss = float(photometric_loss(
        target, depth, R[0], T[0], target[None], R, T, intr,
    ))
    # The absolute value is nonzero by design (the m/(m-1) warp scale and the
    # zero-padded out-of-frustum columns of wide images are reference
    # behavior); what must hold is that the correct source image beats a
    # clearly wrong one.
    shifted = jnp.roll(target, 7, axis=1)
    loss_bad = float(photometric_loss(
        target, depth, R[0], T[0], shifted[None], R, T, intr,
    ))
    assert np.isfinite(loss) and loss < 0.3, loss
    assert loss_bad > 1.5 * loss, (loss, loss_bad)


def test_error_mask_flags_irregular_pixels():
    rng = np.random.default_rng(0)
    disp = jnp.asarray(np.full((16, 28), 0.5, np.float32))
    disp = disp.at[8, 14].set(5.0)  # a spike
    img = jnp.asarray(np.full((16, 28, 3), 0.5, np.float32))
    mask = jnp.ones((16, 28), bool)
    em = np.asarray(error_mask_from_disparity(disp, img, mask))
    assert not em[8, 14] or not em[8, 13]  # the spike region is masked out
    assert em.mean() > 0.9  # most pixels pass


def test_photometric_loss_zero_baseline_depth_independent():
    """With alpha camera == target camera, reprojection maps every pixel
    back along its own ray, so the warp — and hence the photometric loss —
    must be EXACTLY depth-independent (a pure same-camera reprojection is
    a no-op in ray space). The loss is NOT zero: the reference unprojects
    with (m-1)-denominator NDC tables (reproject_depth_map,
    ManyDepth.py:128-129) but grid_samples with true (2j+1)/m pixel
    centers, a sub-pixel scale skew (+-0.5 px at the edges at 256x456,
    much larger at this test's 24x40) that we reproduce faithfully; on a
    smooth image the residual is small."""
    rng = np.random.default_rng(3)
    intr = CameraIntrinsics(image_height=24, image_width=40)
    noise = jnp.asarray(rng.random((24, 40, 3)).astype(np.float32))
    R, T = get_camera_RT(jnp.asarray([[1.0, 2.0, 3.0]]),
                         jnp.asarray([[10.0, 40.0]]))
    losses = []
    for wrong_depth in (0.7, 5.0, 200.0):
        depth = jnp.full((24, 40), wrong_depth, jnp.float32)
        losses.append(float(photometric_loss(noise, depth, R[0], T[0],
                                             noise[None], R, T, intr)))
    assert max(losses) - min(losses) < 1e-4, losses
    # Smooth image: the skew's sub-pixel resampling costs little.
    yy, xx = jnp.meshgrid(jnp.linspace(0, 1, 24), jnp.linspace(0, 1, 40),
                          indexing="ij")
    smooth = jnp.stack([xx, yy, 0.5 * (xx + yy)], axis=-1).astype(jnp.float32)
    depth = jnp.full((24, 40), 5.0, jnp.float32)
    loss = float(photometric_loss(smooth, depth, R[0], T[0], smooth[None],
                                  R, T, intr))
    assert loss < 2e-2, loss


def test_photometric_warp_uses_border_padding():
    """The reference's reconstruction loss warps with padding_mode='border'
    (get_reconstruction_loss_fn, macarons_utils.py:1305; configs'
    padding_mode: 'border'), NOT the cost volume's zeros mode. With a
    translated source camera and wrong depth, many samples land out of
    bounds: zeros padding would compare the target against black and push
    the loss toward the unmatched plateau; border clamping samples edge
    pixels, so on a CONSTANT image the loss stays ~0 regardless of depth."""
    intr = CameraIntrinsics(image_height=24, image_width=40)
    img = jnp.full((24, 40, 3), 0.6, jnp.float32)
    R, T = get_camera_RT(jnp.asarray([[0.0, 0.0, 0.0], [3.0, 0.0, 0.0]]),
                         jnp.asarray([[0.0, 0.0], [0.0, 0.0]]))
    depth = jnp.full((24, 40), 0.9, jnp.float32)  # true scene irrelevant
    loss = float(photometric_loss(img, depth, R[0], T[0], img[None, :],
                                  R[1:], T[1:], intr))
    assert loss < 2e-2, loss
