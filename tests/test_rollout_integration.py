"""End-to-end smoke test: procgen scene -> eval rollout with a random-init
NBP model, small camera, few poses. Exercises every layer except training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nextbestpath_tpu.assets import generate_scene, pack_generated_scene
from nextbestpath_tpu.config import default_params
from nextbestpath_tpu.eval import NBPPlanningRollout
from nextbestpath_tpu.models import NBP


@pytest.fixture(scope="module")
def small_setup():
    params = default_params(
        image_height=32,
        image_width=56,
        points_per_frame=256,
        full_pc_capacity=32768,
        n_gt_surface_points=2048,
        max_path_len=64,
    )
    scn = generate_scene("simple", seed=2)
    assets = pack_generated_scene(scn, params=params)
    model = NBP()
    x = jnp.zeros((1, 256, 256, 5))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return params, assets, model, variables


def test_rollout_three_poses(small_setup):
    params, assets, model, variables = small_setup
    rollout = NBPPlanningRollout(assets, model, variables, params=params,
                                 seed=8)
    res = rollout.run(n_poses=3, verbose=False)
    assert len(res.coverage_evolution) == 3
    # Coverage starts > 0 after the initial captures and must not decrease.
    assert res.coverage_evolution[0] > 0.0
    assert res.coverage_evolution[-1] >= res.coverage_evolution[0] - 1e-6
    assert res.n_points > 500
    # The camera moved (trajectory recorded interpolated positions).
    assert res.cam_positions.shape[0] >= 3 * 4
