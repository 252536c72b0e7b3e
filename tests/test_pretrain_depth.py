"""Depth-pretraining pipeline smoke (the ImageNet-warm-start substitute).

The reference warm-starts ManyDepth from a pretrained pickle
(macarons/networks/Macarons.py:15,234); train/pretrain_depth.py is the
offline substitute (supervised disparity distillation against rendered
zbuf). These tests validate the batch builder's frame layout and one
gradient step at tiny resolution on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nextbestpath_tpu.assets import generate_scene, pack_generated_scene
from nextbestpath_tpu.config import default_params
from nextbestpath_tpu.geometry.cameras import CameraIntrinsics
from nextbestpath_tpu.models.manydepth import ManyDepth
from nextbestpath_tpu.train.pretrain_depth import (
    depth_scene_from_assets,
    make_batch_fn,
    make_train_step,
    supervised_disparity_loss,
)

H, W = 64, 114


def _tiny_setup():
    params = default_params(image_height=H, image_width=W,
                            points_per_frame=256, full_pc_capacity=16384,
                            n_gt_surface_points=1024)
    assets = pack_generated_scene(generate_scene("simple", seed=3),
                                  params=params)
    intr = CameraIntrinsics(image_height=H, image_width=W,
                            fov_degrees=float(params.fov_degrees),
                            znear=float(params.camera_znear),
                            zfar=float(params.zfar))
    return assets, intr


@pytest.mark.slow
def test_batch_builder_shapes_and_content():
    assets, intr = _tiny_setup()
    scene = depth_scene_from_assets(assets)
    make_batch = make_batch_fn(intr, assets.n_azim, batch=2)
    tgt, R, T, xa, Ra, Ta, zbuf = make_batch(scene, jax.random.PRNGKey(0))
    assert tgt.shape == (2, H, W, 3)
    assert xa.shape == (2, 2, H, W, 3)
    assert Ra.shape == (2, 2, 3, 3) and Ta.shape == (2, 2, 3)
    assert zbuf.shape == (2, H, W)
    # Real geometry: some foreground hits with positive depth.
    assert float(jnp.mean(zbuf > 0)) > 0.3
    # Context frames differ from the target (the camera moved between
    # interpolation substeps) unless the sampled move was a pure stay.
    assert not np.allclose(np.asarray(tgt), np.asarray(xa[:, 0]))


@pytest.mark.slow
def test_supervised_step_reduces_loss():
    assets, intr = _tiny_setup()
    scene = depth_scene_from_assets(assets)
    make_batch = make_batch_fn(intr, assets.n_azim, batch=1)
    b = make_batch(scene, jax.random.PRNGKey(1))
    model = ManyDepth(intr=intr)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, H, W, 3)), jnp.zeros((1, 3, 3)),
                           jnp.zeros((1, 3)), jnp.zeros((1, 2, H, W, 3)),
                           jnp.zeros((1, 2, 3, 3)), jnp.zeros((1, 2, 3)),
                           train=False)
    tx = optax.adam(1e-3)
    opt_state = tx.init(variables["params"])
    step = make_train_step(model, tx)
    losses = []
    for _ in range(3):
        variables, opt_state, loss = step(variables, opt_state, *b)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_disparity_loss_supervises_background_to_dmax():
    """Background rays (zbuf = -1) must supervise toward disparity 0
    (= d_max, 'beyond zfar'), not toward disparity(|{-1}|)."""
    zbuf = -jnp.ones((1, 4, 4))
    # A prediction of exactly disparity 0 at every scale => loss 0.
    disps = [jnp.zeros((1, 4, 4, 1))] * 4
    loss = supervised_disparity_loss(disps, zbuf)
    assert float(loss) < 1e-6
