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


def test_photometric_loss_zero_for_static_identical_views():
    """Same camera, same image, correct depth -> warped == target -> loss ~0."""
    intr = CameraIntrinsics(image_height=16, image_width=28, zfar=100.0)
    R, T = get_camera_RT(jnp.zeros((1, 3)), jnp.asarray([[0.0, 0.0]]))
    rng = np.random.default_rng(0)
    target = jnp.asarray(rng.random((16, 28, 3)).astype(np.float32))
    depth = jnp.full((16, 28), 10.0)
    loss = float(photometric_loss(
        target, depth, R[0], T[0],
        target[None], R, T, intr,
    ))
    assert loss < 1e-3


def test_error_mask_flags_irregular_pixels():
    rng = np.random.default_rng(0)
    disp = jnp.asarray(np.full((16, 28), 0.5, np.float32))
    disp = disp.at[8, 14].set(5.0)  # a spike
    img = jnp.asarray(np.full((16, 28, 3), 0.5, np.float32))
    mask = jnp.ones((16, 28), bool)
    em = np.asarray(error_mask_from_disparity(disp, img, mask))
    assert not em[8, 14] or not em[8, 13]  # the spike region is masked out
    assert em.mean() > 0.9  # most pixels pass
