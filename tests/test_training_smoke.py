"""End-to-end training smoke: collect one tiny rollout -> replay DB ->
supervised NBP training step decreases nothing catastrophic."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nextbestpath_tpu.assets import generate_scene, pack_generated_scene
from nextbestpath_tpu.config import default_params
from nextbestpath_tpu.models import NBP
from nextbestpath_tpu.train import (
    ReplayDB,
    TrainState,
    collect_trajectory,
    init_train_state,
    train_epoch,
    validate,
)
from nextbestpath_tpu.train.replay import Experience


def _fake_experiences(n, rng):
    out = []
    for i in range(n):
        out.append(Experience(
            model_input=rng.random((5, 256, 256)).astype(np.float16),
            gt_layout=(rng.random((256, 256)) > 0.7).astype(np.uint8),
            pixels=rng.integers(0, 8, (3, 3)).astype(np.int32),
            gains=rng.random(3).astype(np.float32),
            pose_i=12,
        ))
    return out


@pytest.mark.slow
def test_train_step_runs_and_reduces_loss():
    rng = np.random.default_rng(0)
    model = NBP()
    state = init_train_state(model, jax.random.PRNGKey(0),
                             accumulation_steps=1)
    data = _fake_experiences(4, rng)
    losses = []
    for _ in range(12):
        state, tl = train_epoch(model, state, list(data), batch_size=2,
                                current_epoch=2, rng=__import__("random").Random(0))
        losses.append(tl)
    v1 = validate(model, state, data, batch_size=2)
    assert all(np.isfinite(l) for l in losses) and np.isfinite(v1)
    # Training loss overfits 4 fixed samples. Compare epoch means to ride out
    # BatchNorm/shuffle noise. (Validation loss may lag: eval-mode BN running
    # stats move slowly at momentum 0.99.)
    assert np.mean(losses[-3:]) < np.mean(losses[:3])


@pytest.mark.slow
def test_collection_produces_experiences():
    params = default_params(
        image_height=32, image_width=56, points_per_frame=256,
        full_pc_capacity=32768, n_gt_surface_points=1024, max_path_len=32,
    )
    scn = generate_scene("simple", seed=4)
    assets = pack_generated_scene(scn, params=params)
    model = NBP()
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 5)))
    db = ReplayDB()
    cov = collect_trajectory(assets, model, variables, db, params=params,
                             seed=3, n_poses=6)
    assert len(cov) >= 1
    # The GT-edge planner moves the agent, so suffix labels get mined.
    assert len(db) >= 1
    e = db.entries[0]
    assert e.model_input.shape == (5, 256, 256)
    assert e.gt_layout.shape == (256, 256)
    assert len(e.pixels) == len(e.gains) >= 1
