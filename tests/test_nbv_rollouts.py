"""Smoke tests for the MACARONS NBV and object-level NBV testers."""

import jax
import jax.numpy as jnp
import pytest

from nextbestpath_tpu.assets import generate_scene, pack_generated_scene
from nextbestpath_tpu.config import default_params
from nextbestpath_tpu.eval import macarons_nbv_rollout, object_nbv_rollout
from nextbestpath_tpu.models import SconeOcc, SconeVis


@pytest.fixture(scope="module")
def scone_models():
    occ = SconeOcc(seq_len=128, n_scale=2, k_for_knn=4,
                   pts_embedding_dim=32, global_feature_dim=64,
                   local_feature_dim=32, x_embedding_dim=64)
    occ_vars = occ.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 3)),
                        jnp.zeros((1, 64, 3)), jnp.zeros((1, 64, 64)),
                        key=jax.random.PRNGKey(1))
    vis = SconeVis(pts_embedding_dim=64)
    vis_vars = vis.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 4)),
                        view_harmonics=jnp.zeros((1, 64, 64)))
    return occ, occ_vars, vis, vis_vars


@pytest.mark.slow
def test_macarons_nbv_rollout_smoke(scone_models):
    occ, occ_vars, vis, vis_vars = scone_models
    params = default_params(
        image_height=32, image_width=56, points_per_frame=256,
        full_pc_capacity=16384, n_gt_surface_points=1024,
        n_proxy_points=1024, seq_len=64,
    )
    assets = pack_generated_scene(generate_scene("simple", seed=6),
                                  params=params)
    res = macarons_nbv_rollout(assets, occ, occ_vars, vis, vis_vars,
                               params=params, n_poses=2, seed=1,
                               n_tokens=128, n_proxy_tokens=64)
    assert len(res.coverage_evolution) == 2
    assert res.coverage_evolution[-1] > 0.0


@pytest.mark.slow
def test_object_nbv_rollout_smoke(scone_models):
    _, _, vis, vis_vars = scone_models
    assets = pack_generated_scene(generate_scene("simple", seed=6))
    curve = object_nbv_rollout(assets, vis, vis_vars, n_views=3,
                               n_candidates=8, n_tokens=64, seed=0)
    assert len(curve) == 3
    assert curve[-1] >= curve[0]
