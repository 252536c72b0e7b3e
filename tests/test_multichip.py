"""Multi-device data parallelism on the virtual 8-CPU mesh.

Exercises the exact code paths the driver's dryrun_multichip runs: the
sharded NBP train step (batch over the mesh axis, replicated weights,
XLA-inserted gradient reduction) and the scene-sharded batched scan rollout
(the reference's one-scene-per-GPU DDP, macarons_utils.py:177-326).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nextbestpath_tpu.parallel.dp import dp_train_demo
from nextbestpath_tpu.parallel.mesh import make_mesh


def test_mesh_has_8_devices():
    mesh = make_mesh(8)
    assert mesh.devices.size == 8


def test_dp_train_step_runs_sharded():
    loss, mesh = dp_train_demo(8, image_size=32, n_steps=2, verbose=False)
    assert mesh.devices.size == 8
    assert np.isfinite(loss)


def test_dp_train_matches_single_device():
    """The 8-way sharded step must compute the same loss as one device
    (same replicated weights, same global batch)."""
    loss8, _ = dp_train_demo(8, image_size=32, n_steps=1, verbose=False)
    loss1, _ = dp_train_demo(1, image_size=32, n_steps=1, verbose=False)
    # Identical batch rows -> identical per-sample losses; the mean over the
    # global batch must agree across shardings (up to reduction order).
    assert abs(loss8 - loss1) < 1e-4


@pytest.mark.slow
def test_sharded_batched_rollout():
    """Scene-sharded scan rollout over a 2-device mesh: coverage rises on
    every scene and the sharded run matches the unsharded one bit-for-bit
    (same program, same keys; only the device placement differs)."""
    from nextbestpath_tpu.assets import generate_scene, pack_generated_scene
    from nextbestpath_tpu.assets.scene_assets import pad_assets_to_common
    from nextbestpath_tpu.config import default_params
    from nextbestpath_tpu.eval.scan_rollout import BatchedScanRollout
    from nextbestpath_tpu.models import NBP

    params = default_params(
        image_height=32, image_width=56, points_per_frame=256,
        full_pc_capacity=32768, n_gt_surface_points=1024, max_path_len=32,
        pc2img_size=[64, 64], value_map_size=[16, 16],
    )
    assets = pad_assets_to_common([
        pack_generated_scene(generate_scene("simple", seed=s), params=params)
        for s in (2, 3)
    ])
    model = NBP()
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 5)))

    mesh = make_mesh(2)
    sharded = BatchedScanRollout(assets, model, variables, params=params,
                                 mesh=mesh)
    plain = BatchedScanRollout(assets, model, variables, params=params)
    res_s = sharded.run(n_poses=3, seed=8)
    res_p = plain.run(n_poses=3, seed=8)
    assert len(res_s) == 2
    for rs, rp in zip(res_s, res_p):
        assert rs.coverage_evolution[0] > 0.0
        np.testing.assert_allclose(rs.coverage_evolution,
                                   rp.coverage_evolution, atol=1e-5)


def test_dryrun_env_bootstrap_logic():
    """__graft_entry__ decides re-exec purely from env vars and builds a
    clean CPU env (no axon plugin on PYTHONPATH, device count set)."""
    import __graft_entry__ as ge

    env = ge._cpu_mesh_env(8)
    assert env["JAX_PLATFORMS"] == "cpu"
    assert "--xla_force_host_platform_device_count=8" in env["XLA_FLAGS"]
    assert all("axon" not in p for p in env["PYTHONPATH"].split(":"))

    # The test process itself runs under conftest's 8-device CPU setup.
    assert ge._have_cpu_mesh(8)
    assert ge._have_cpu_mesh(2)
    assert not ge._have_cpu_mesh(64)
