"""RGB rendering + online self-supervised depth (VERDICT round 1, missing #1).

Covers: the shaded RGB-D render path (nearest-hit index golden vs the dense
reference), photometric aug invariants, the PoseDecoder, Memory's scone
replay-scene reconstruction, and the end-to-end online trainer where the
depth loss is optimized and the PREDICTED depth drives backprojection.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nextbestpath_tpu.assets import generate_scene, pack_generated_scene
from nextbestpath_tpu.config import default_params
from nextbestpath_tpu.geometry.cameras import CameraIntrinsics, get_camera_RT
from nextbestpath_tpu.ops.raytrace import (
    ray_hits_full,
    ray_hits_idx_ref,
    render_depth,
    render_rgbd,
    tris_to_soa,
)

TINY = dict(
    image_height=32, image_width=56, points_per_frame=256,
    full_pc_capacity=32768, n_gt_surface_points=1024, max_path_len=32,
    n_proxy_points=512,
)


def _scene_and_cam():
    params = default_params(**TINY)
    assets = pack_generated_scene(generate_scene("simple", seed=2),
                                  params=params)
    intr = CameraIntrinsics(image_height=32, image_width=56,
                            znear=1.0, zfar=750.0)
    pose = assets.pose_from_idx(assets.start_cam_idx)
    R, T = get_camera_RT(jnp.asarray(pose[None, :3]),
                         jnp.asarray(pose[None, 3:]))
    return params, assets, intr, R[0], T[0]


def test_ray_hits_idx_matches_reference():
    _, assets, intr, R, T = _scene_and_cam()
    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.uniform(5, 40, (64, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(64, 3)), jnp.float32)
    tris = jnp.asarray(assets.tris[: assets.n_tris])
    t_ref, idx_ref = ray_hits_idx_ref(o, d, tris)
    t_ker, _, idx_ker = ray_hits_full(o, d, tris_to_soa(tris), len(tris))
    np.testing.assert_allclose(np.asarray(t_ker), np.asarray(t_ref),
                               rtol=1e-4, atol=1e-4)
    # Where the hit is unambiguous the indices must agree; ties (shared
    # edges) may legitimately differ, so compare hit triangle DEPTHS.
    hit = np.asarray(t_ref) < 1e9
    assert np.array_equal(np.asarray(idx_ker) >= 0, hit)
    assert np.mean(np.asarray(idx_ker)[hit] == np.asarray(idx_ref)[hit]) > 0.95


def test_render_rgbd_shading_and_zbuf_parity():
    _, assets, intr, R, T = _scene_and_cam()
    soa = tris_to_soa(jnp.asarray(assets.tris))
    rgb, zbuf = render_rgbd(soa, assets.n_tris, R, T, intr)
    zbuf_ref = render_depth(soa, assets.n_tris, R, T, intr)
    np.testing.assert_allclose(np.asarray(zbuf), np.asarray(zbuf_ref),
                               rtol=1e-4, atol=1e-3)
    rgb = np.asarray(rgb)
    hit = np.asarray(zbuf) > 0
    assert hit.sum() > 100
    vals = rgb[hit][:, 0]
    # Headlight-Lambert shading: gray modulated by |n.view| in
    # [ambient*0.8, 0.8]; must actually VARY across wall orientations.
    assert vals.min() >= 0.8 * 0.85 - 1e-3
    assert vals.max() <= 0.8 + 1e-3
    assert vals.std() > 0.005
    assert np.all(rgb[~hit] == 0.0)


def test_horizontal_flip_involution():
    from nextbestpath_tpu.train.depth_losses import horizontal_flip

    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.uniform(size=(3, 8, 10, 3)), jnp.float32)
    R = jnp.asarray(rng.normal(size=(3, 3, 3)), jnp.float32)
    T = jnp.asarray(rng.normal(size=(3, 3)), jnp.float32)
    i2, R2, T2 = horizontal_flip(*horizontal_flip(imgs, R, T))
    np.testing.assert_allclose(np.asarray(i2), np.asarray(imgs), atol=1e-6)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-6)
    np.testing.assert_allclose(np.asarray(T2), np.asarray(T), atol=1e-6)


def test_color_jitter_bounds():
    from nextbestpath_tpu.train.depth_losses import color_jitter

    rng = np.random.default_rng(2)
    imgs = jnp.asarray(rng.uniform(size=(2, 8, 10, 3)), jnp.float32)
    out = color_jitter(jax.random.PRNGKey(0), imgs)
    out = np.asarray(out)
    assert out.shape == imgs.shape
    assert out.min() >= 0.0 and out.max() <= 1.0
    assert not np.allclose(out, np.asarray(imgs))  # jitter applied (p=1)


def test_pose_decoder_shapes_and_compose_identity():
    from nextbestpath_tpu.models.manydepth import PoseDecoder

    pd = PoseDecoder()
    x = jnp.zeros((2, 32, 56, 3))
    vars_ = jax.jit(lambda k: pd.init(k, x, x))(jax.random.PRNGKey(0))
    aa, tr = jax.jit(lambda v: pd.apply(v, x, x))(vars_)
    assert aa.shape == (2, 3) and tr.shape == (2, 3)

    rng = np.random.default_rng(3)
    R = jnp.asarray(rng.normal(size=(3, 3)), jnp.float32)
    T = jnp.asarray(rng.normal(size=(3,)), jnp.float32)
    R2, T2 = PoseDecoder.compose(R, T, jnp.zeros(3), jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)
    np.testing.assert_allclose(np.asarray(T2), np.asarray(T), atol=1e-5)


def test_memory_scone_replay_reconstruction(tmp_path):
    from nextbestpath_tpu.sim.memory import Memory

    intr = CameraIntrinsics(image_height=16, image_width=24)
    mem = Memory([str(tmp_path)], n_trajectories=3, current_epoch=0)
    rng = np.random.default_rng(4)
    # Fill trajectory 1 (non-current) with depths + an occupancy snapshot.
    for i in range(6):
        depth = rng.uniform(2.0, 30.0, (16, 24)).astype(np.float32)
        mem.save_depth(str(tmp_path), 1, i, depth, np.eye(3, dtype=np.float32),
                       np.zeros(3, np.float32))
    P = 64
    mem.save_occupancy(str(tmp_path), 1, rng.uniform(size=(P, 3)),
                       rng.uniform(size=(P, 1)), rng.uniform(size=(P, 1)),
                       rng.uniform(size=(P, 98)), np.ones((P, 1)))

    scene = mem.get_random_scene_for_scone_model(str(tmp_path), intr,
                                                 n_frames=4,
                                                 points_per_frame=128)
    assert scene is not None
    assert scene["surface"].shape[1] == 3
    assert len(scene["surface"]) > 100
    assert scene["proxy_points"].shape == (P, 3)
    assert scene["supervision_occ"].shape == (P, 1)
    assert scene["view_states"].shape == (P, 98)

    # Coverage-gain replay tier: the last n_replay_poses frames are held out
    # of the base surface and served as replay cameras (memory_scene_loop's
    # new-depth supervision window, train_macarons.py:640-744).
    scene = mem.get_random_scene_for_scone_model(
        str(tmp_path), intr, n_frames=4, points_per_frame=128,
        n_replay_poses=2)
    assert scene["replay_clouds"].shape == (2, 128, 3)
    assert scene["replay_valid"].shape == (2, 128)
    assert scene["replay_cams"].shape == (2, 3)
    assert scene["base_clouds"].shape == (2, 128, 3)
    # Base surface excludes the held-out frames' points.
    assert len(scene["surface"]) == scene["base_valid"].sum()
    # Identity R, zero T -> camera center at the origin.
    np.testing.assert_allclose(scene["replay_cams"], 0.0, atol=1e-6)

    # Current trajectory (0) must never be served: only traj 1 qualifies and
    # switching current_epoch to 1 makes it the current one -> None.
    mem.current_epoch = 1
    assert mem.get_random_scene_for_scone_model(str(tmp_path), intr,
                                                n_frames=4) is None


@pytest.mark.slow
def test_online_depth_training_and_predicted_backprojection(tmp_path):
    """The full VERDICT #4 'done' condition: an online trainer run where the
    depth loss is optimized and backprojection runs through the PREDICTED
    depth (use_perfect_depth=False), with memory replay active."""
    from nextbestpath_tpu.sim.memory import Memory
    from nextbestpath_tpu.train.train_macarons import (
        MacaronsTrainState,
        train_macarons_online,
    )

    params = default_params(**TINY)
    assets = pack_generated_scene(generate_scene("simple", seed=2),
                                  params=params)
    state = MacaronsTrainState.create(
        jax.random.PRNGKey(0), params=params, depth_lr=1e-4)
    mem = Memory([str(tmp_path)], n_trajectories=2, current_epoch=0)
    # Pre-populate trajectory 1 (non-current) so the scone replay steps run
    # (occupancy + coverage-gain supervision from replayed cameras).
    rng = np.random.default_rng(7)
    for i in range(8):
        d = rng.uniform(2.0, 30.0, (32, 56)).astype(np.float32)
        mem.save_depth(str(tmp_path), 1, i, d, np.eye(3, dtype=np.float32),
                       np.zeros(3, np.float32))
    P = 128
    mem.save_occupancy(str(tmp_path), 1, rng.uniform(0, 40, size=(P, 3)),
                       rng.uniform(size=(P, 1)), rng.uniform(size=(P, 1)),
                       rng.uniform(size=(P, 98)), np.ones((P, 1)))
    logs = train_macarons_online(
        assets, state, params=params, n_poses=5, seed=3,
        n_tokens=128, n_proxy_tokens=128,
        use_perfect_depth=False, learn_depth=True,
        memory=mem, scene_memory_path=str(tmp_path), memory_replay_loops=1,
        verbose=False,
    )
    assert len(logs["depth_loss"]) >= 2
    assert all(np.isfinite(v) for v in logs["depth_loss"])
    assert logs["coverage"][-1] > 0.0  # predicted depth built a usable cloud
    # Frames + depths persisted into the current trajectory slot.
    assert mem.n_frames(str(tmp_path), 0) == 5
    assert mem.n_depths(str(tmp_path), 0) == 5
    # Replay ran with the coverage-gain tier active.
    assert len(logs["replay_occ_loss"]) >= 1
    assert len(logs["replay_cov_loss"]) >= 1
    assert all(np.isfinite(v) for v in logs["replay_cov_loss"])
