"""Multi-device data parallelism on the virtual 8-CPU mesh.

Exercises the exact code paths the driver's dryrun_multichip runs: the
sharded NBP train step (batch over the mesh axis, replicated weights,
XLA-inserted gradient reduction) and the scene-sharded batched scan rollout
(the reference's one-scene-per-GPU DDP, macarons_utils.py:177-326).
"""

import os

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
    """The 8-way sharded step must compute the same loss AND mean gradient
    as one device holding the same global batch (the DDP invariant,
    macarons_utils.py:235-240). dp_grad_parity uses per-device-DISTINCT
    batch rows — identical rows would hide a missing gradient psum — and
    runs at HIGHEST matmul precision so real defects stand ~100x above
    reduction-order noise."""
    from nextbestpath_tpu.parallel.dp import dp_grad_parity

    par = dp_grad_parity(4, image_size=32, width=8)
    assert abs(par["loss_n"] - par["loss_1"]) <= 1e-4 * abs(par["loss_1"])
    assert abs(par["norm_n"] - par["norm_1"]) <= 1e-3 * par["norm_1"]
    assert par["cosine"] > 0.9999


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
    """__graft_entry__ builds a clean CPU child env (no axon plugin on
    PYTHONPATH, device count set, marker present, cache fingerprinted) and
    only trusts its own marker when deciding to run in-process."""
    import __graft_entry__ as ge

    env = ge._cpu_mesh_env(8)
    assert env["JAX_PLATFORMS"] == "cpu"
    assert "--xla_force_host_platform_device_count=8" in env["XLA_FLAGS"]
    assert all("axon" not in p for p in env["PYTHONPATH"].split(":"))
    assert env[ge._CLEAN_MARKER] == "8"
    # The child cache is a fingerprinted subdirectory, never the bare root
    # (a shared root is how stale AOT entries poisoned rounds 1-2).
    cache = env["JAX_COMPILATION_CACHE_DIR"]
    assert cache.startswith(os.path.join(ge._REPO, ".jax_cache") + os.sep)
    assert "cpu-" in os.path.basename(cache)
    # Cold-retry env: caching fully disabled.
    cold = ge._cpu_mesh_env(8, use_cache=False)
    assert "JAX_COMPILATION_CACHE_DIR" not in cold
    assert cold["NBPT_NO_CACHE"] == "1"

    # Env vars alone (even a full CPU-mesh setup) must NOT be trusted:
    # only the marker set by _cpu_mesh_env counts.
    assert not ge._in_clean_cpu_child(8) or os.environ.get(ge._CLEAN_MARKER)
    old = os.environ.pop(ge._CLEAN_MARKER, None)
    try:
        assert not ge._in_clean_cpu_child(1)
        os.environ[ge._CLEAN_MARKER] = "8"
        assert ge._in_clean_cpu_child(8)
        assert ge._in_clean_cpu_child(2)
        assert not ge._in_clean_cpu_child(64)
    finally:
        if old is None:
            os.environ.pop(ge._CLEAN_MARKER, None)
        else:
            os.environ[ge._CLEAN_MARKER] = old


def test_dp_step_cache_pins_key_objects():
    """A GC'd model/optimizer must not be able to alias a cache entry: the
    cache value pins the keyed objects, so their id()s can never be
    recycled while the entry exists (parallel/dp.py _DP_STEP_CACHE)."""
    import gc
    import weakref

    import optax

    from nextbestpath_tpu.models.unet import NBP
    from nextbestpath_tpu.parallel.dp import (
        _DP_STEP_CACHE,
        make_dp_train_step_ds,
    )

    model = NBP(width=4)
    tx = optax.adamw(1e-3)
    mesh = make_mesh(1)
    step = make_dp_train_step_ds(model, tx, mesh)
    assert make_dp_train_step_ds(model, tx, mesh) is step  # cache hit
    key = (id(model), id(tx), id(mesh), "data")
    assert key in _DP_STEP_CACHE
    ref = weakref.ref(model)
    del model, tx, mesh, step
    gc.collect()
    # Pinned by the cache entry -> still alive -> id cannot be reused.
    assert ref() is not None
    del _DP_STEP_CACHE[key]
    gc.collect()
    assert ref() is None  # and the pin is exactly the cache entry


def _tiny_params():
    from nextbestpath_tpu.config import default_params

    return default_params(
        image_height=32, image_width=56, points_per_frame=256,
        full_pc_capacity=32768, n_gt_surface_points=1024, max_path_len=32,
        pc2img_size=[64, 64], value_map_size=[16, 16],
    )


def _tiny_assets(seeds=(2, 3)):
    from nextbestpath_tpu.assets import generate_scene, pack_generated_scene
    from nextbestpath_tpu.assets.scene_assets import pad_assets_to_common

    params = _tiny_params()
    return params, pad_assets_to_common([
        pack_generated_scene(generate_scene("simple", seed=s), params=params)
        for s in seeds
    ])


@pytest.mark.slow
def test_shardmap_rollout_matches_batched():
    """One-scene-per-device shard_map rollout (per-device plan gate) must
    bit-match the vmapped any-regen-gated rollout: the gates differ in
    which poses COMPUTE a plan, never in which plans take effect."""
    from nextbestpath_tpu.eval.scan_rollout import BatchedScanRollout
    from nextbestpath_tpu.models import NBP
    from nextbestpath_tpu.parallel.spmd import ShardedScanRollout

    params, assets = _tiny_assets()
    model = NBP(width=8)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 5)))
    mesh = make_mesh(2)
    res_s = ShardedScanRollout(assets, model, variables, mesh,
                               params=params).run(n_poses=3, seed=8)
    res_b = BatchedScanRollout(assets, model, variables,
                               params=params).run(n_poses=3, seed=8)
    for rs, rb in zip(res_s, res_b):
        assert rs.coverage_evolution == rb.coverage_evolution


@pytest.mark.slow
def test_shardmap_collection_matches_unsharded():
    """Sharded collection must produce the identical replay stream (same
    per-scene programs + seeds; one launch instead of n)."""
    from nextbestpath_tpu.models import NBP
    from nextbestpath_tpu.parallel.spmd import ShardedScanCollection
    from nextbestpath_tpu.train.replay import ReplayDB
    from nextbestpath_tpu.train.scan_collection import (
        ScanCollection,
        collect_trajectory_scan,
    )

    params, assets = _tiny_assets()
    model = NBP(width=8)
    variables = jax.jit(lambda k, x: model.init(k, x, train=True))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 5)))
    mesh = make_mesh(2)
    db_s, db_u = ReplayDB(), ReplayDB()
    covs_s = ShardedScanCollection(assets, model, mesh, params=params
                                   ).collect_all(variables, db_s, seed=5,
                                                 n_poses=4)
    col = ScanCollection(assets, model, params=params)
    covs_u = [collect_trajectory_scan(col, i, variables, db_u, seed=5 + i,
                                      n_poses=4) for i in range(2)]
    assert covs_s == covs_u
    assert len(db_s) == len(db_u) > 0
    for a, b in zip(db_s.entries, db_u.entries):
        assert np.array_equal(a.model_input, b.model_input)
        assert np.array_equal(a.gt_layout, b.gt_layout)
        assert np.array_equal(a.pixels, b.pixels)
        assert np.allclose(a.gains, b.gains)
        assert a.pose_i == b.pose_i


def test_train_nbp_dp_matches_single_device():
    """The mesh-sharded inner training loop (micro batches split over the
    axis, XLA-inserted grad psum, GSPMD-global BatchNorm stats) must match
    the single-device train_nbp on the same replay data."""
    from nextbestpath_tpu.models import NBP
    from nextbestpath_tpu.parallel.dp import train_nbp_dp
    from nextbestpath_tpu.train.replay import ReplayDB
    from nextbestpath_tpu.train.train_nbp import init_train_state, train_nbp

    S, C = 64, 5
    model = NBP(width=8)
    params = _tiny_params()

    def run(mesh):
        rng = np.random.RandomState(0)
        db = ReplayDB()
        for i in range(12):
            db.append(rng.rand(C, S, S).astype(np.float16),
                      (rng.rand(S, S) > 0.5).astype(np.uint8),
                      rng.randint(0, 16, size=(3, 3)).astype(np.int32),
                      rng.rand(3).astype(np.float32) * 5, pose_i=20 + i)
        val = db.extract_validation(num=4)
        state = init_train_state(model, jax.random.PRNGKey(1), lr=1e-3)
        if mesh is None:
            return train_nbp(model, state, db, val, current_epoch=2,
                             params=params, num_epochs=2, seed=7,
                             verbose=False)
        return train_nbp_dp(model, state, db, val, current_epoch=2,
                            mesh=mesh, params=params, num_epochs=2, seed=7,
                            verbose=False)

    _, tl1, vl1 = run(None)
    _, tl8, vl8 = run(make_mesh(8))
    assert abs(tl1 - tl8) < 1e-2 * max(1.0, abs(tl1))
    assert abs(vl1 - vl8) < 1e-2 * max(1.0, abs(vl1))


@pytest.mark.slow
def test_run_training_nbp_dp_smoke(tmp_path):
    """The distributed epoch driver runs end to end on a 2-device mesh:
    sharded collection fills the DB, the sharded inner loop trains, and a
    best-val checkpoint lands."""
    import os

    from nextbestpath_tpu.models import NBP
    from nextbestpath_tpu.train.driver import run_training_nbp_dp

    params, assets = _tiny_assets()
    mesh = make_mesh(2)
    run_training_nbp_dp(
        assets, mesh, params=params, epochs=2, n_poses=4,
        weights_dir=str(tmp_path), log_dir=str(tmp_path),
        model=NBP(width=8), model_tag="dp_smoke")
    assert os.path.exists(tmp_path / "dp_smoke_loss.json")
