"""The fully-jitted scan rollout must behave like a rollout: coverage grows,
shapes are static, and the whole thing runs as one compiled program."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nextbestpath_tpu.assets import generate_scene, pack_generated_scene
from nextbestpath_tpu.config import default_params
from nextbestpath_tpu.eval.scan_rollout import ScanRollout
from nextbestpath_tpu.models import NBP


@pytest.mark.slow
def test_scan_rollout_smoke():
    params = default_params(
        image_height=32, image_width=56, points_per_frame=256,
        full_pc_capacity=32768, n_gt_surface_points=2048, max_path_len=32,
    )
    scn = generate_scene("simple", seed=2)
    assets = pack_generated_scene(scn, params=params)
    model = NBP()
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 5)))
    rollout = ScanRollout(assets, model, variables, params=params)
    res = rollout.run(n_poses=3, seed=8)
    assert len(res.coverage_evolution) == 3
    assert res.coverage_evolution[0] > 0.0
    assert res.coverage_evolution[-1] >= res.coverage_evolution[0] - 1e-6
    assert res.n_points > 500


@pytest.mark.slow
def test_batched_b1_matches_single_scene():
    """The two-phase batched step (scalar any-regen gate) must be
    behaviorally identical to the single-scene step at B=1: same scene,
    same seed, bit-equal coverage curves."""
    from nextbestpath_tpu.eval.scan_rollout import BatchedScanRollout

    params = default_params(
        image_height=32, image_width=56, points_per_frame=256,
        full_pc_capacity=32768, n_gt_surface_points=1024, max_path_len=32,
        pc2img_size=[64, 64], value_map_size=[16, 16],
    )
    assets = pack_generated_scene(generate_scene("simple", seed=5),
                                  params=params)
    model = NBP()
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 5)))
    single = ScanRollout(assets, model, variables, params=params)
    batched = BatchedScanRollout([assets], model, variables, params=params)
    r_s = single.run(n_poses=4, seed=8)
    r_b = batched.run(n_poses=4, seed=8)[0]
    np.testing.assert_allclose(r_s.coverage_evolution,
                               r_b.coverage_evolution, atol=1e-5)
    assert r_s.n_points == r_b.n_points


@pytest.mark.slow
def test_segmented_run_matches_monolithic():
    """Chunked execution (segment_len) must be bit-identical to the single
    scan program: the step consumes only the absolute pose index and the
    state stays on device between segments. (The workaround for the
    tunneled worker dying on minutes-long single executions — round-4
    crash bisect.)"""
    params = default_params(
        image_height=32, image_width=56, points_per_frame=256,
        full_pc_capacity=32768, n_gt_surface_points=1024, max_path_len=32,
        pc2img_size=[64, 64], value_map_size=[16, 16],
    )
    assets = pack_generated_scene(generate_scene("simple", seed=5),
                                  params=params)
    model = NBP()
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 5)))
    rollout = ScanRollout(assets, model, variables, params=params)
    r_mono = rollout.run(n_poses=5, seed=8)
    r_seg = rollout.run(n_poses=5, seed=8, segment_len=2)  # 2 + 2 + 1
    np.testing.assert_array_equal(r_mono.coverage_evolution,
                                  r_seg.coverage_evolution)
    assert r_mono.n_points == r_seg.n_points


@pytest.mark.slow
def test_batched_b2_matches_single_scenes():
    """B>1 batched semantics (any-regen gate + scalar-gated retries with
    per-scene selects, d2dcfd3) must match per-scene single rollouts in f32.
    On TPU the bf16 batch-4 U-Net tiles differently from batch-1 and goal
    argmaxes can occasionally flip (BASELINE.md round-4 note); in f32 on CPU
    the curves must be equal."""
    from nextbestpath_tpu.assets.scene_assets import pad_assets_to_common
    from nextbestpath_tpu.eval.scan_rollout import BatchedScanRollout

    params = default_params(
        image_height=32, image_width=56, points_per_frame=256,
        full_pc_capacity=32768, n_gt_surface_points=1024, max_path_len=32,
        pc2img_size=[64, 64], value_map_size=[16, 16],
    )
    assets = pad_assets_to_common([
        pack_generated_scene(generate_scene("simple", seed=s), params=params)
        for s in (5, 6)
    ])
    model = NBP()
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 5)))
    batched = BatchedScanRollout(assets, model, variables, params=params)
    rb = batched.run(n_poses=6, seed=8)  # scene i gets seed 8 + i
    for i, a in enumerate(assets):
        solo = ScanRollout(a, model, variables, params=params).run(
            n_poses=6, seed=8 + i)
        np.testing.assert_allclose(solo.coverage_evolution,
                                   rb[i].coverage_evolution, atol=1e-6)


@pytest.mark.slow
def test_interleaved_matches_sequential():
    """run_interleaved (pipelined multi-scene segment dispatch) must be
    bit-identical per scene to back-to-back segmented single-scene runs —
    the interleaving only reorders independent device programs."""
    from nextbestpath_tpu.assets.scene_assets import pad_assets_to_common
    from nextbestpath_tpu.eval.scan_rollout import run_interleaved

    params = default_params(
        image_height=32, image_width=56, points_per_frame=256,
        full_pc_capacity=32768, n_gt_surface_points=1024, max_path_len=32,
        pc2img_size=[64, 64], value_map_size=[16, 16],
    )
    assets = pad_assets_to_common([
        pack_generated_scene(generate_scene("simple", seed=s), params=params)
        for s in (5, 6)
    ])
    model = NBP()
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 5)))
    rollouts = [ScanRollout(a, model, variables, params=params)
                for a in assets]
    inter = run_interleaved(rollouts, n_poses=5, segment_len=2,
                            seeds=[8, 9])
    for r, seed, ri in zip(rollouts, (8, 9), inter):
        solo = r.run(n_poses=5, seed=seed, segment_len=2)
        np.testing.assert_array_equal(solo.coverage_evolution,
                                      ri.coverage_evolution)
        assert solo.n_points == ri.n_points


@pytest.mark.slow
def test_batched_scan_rollout_two_scenes():
    from nextbestpath_tpu.eval.scan_rollout import BatchedScanRollout

    params = default_params(
        image_height=32, image_width=56, points_per_frame=256,
        full_pc_capacity=32768, n_gt_surface_points=1024, max_path_len=32,
    )
    assets = [
        pack_generated_scene(generate_scene("simple", seed=s), params=params)
        for s in (2, 3)
    ]
    model = NBP()
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 5)))
    batched = BatchedScanRollout(assets, model, variables, params=params)
    results = batched.run(n_poses=2, seed=8)
    assert len(results) == 2
    for res in results:
        assert len(res.coverage_evolution) == 2
        assert res.coverage_evolution[0] > 0.0


def test_auto_segment_resolution():
    """Default runs past the threshold are auto-segmented (watchdog safety,
    round-4 crash bisect: minutes-long single executions kill the tunneled
    worker); short runs stay monolithic; 0 forces monolithic; explicit ints
    pass through."""
    from nextbestpath_tpu.eval.scan_rollout import (_AUTO_SEG_POSES,
                                                    _AUTO_SEG_THRESHOLD,
                                                    resolve_segment_len)

    assert resolve_segment_len(None, _AUTO_SEG_THRESHOLD + 1) == \
        _AUTO_SEG_POSES
    assert resolve_segment_len(None, 5000) == _AUTO_SEG_POSES
    assert resolve_segment_len(None, _AUTO_SEG_THRESHOLD) is None
    assert resolve_segment_len(0, 5000) == 0
    assert resolve_segment_len(17, 5000) == 17
