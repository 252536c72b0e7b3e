import jax
import jax.numpy as jnp
import numpy as np

from nextbestpath_tpu.geometry import CameraIntrinsics, get_camera_RT
from nextbestpath_tpu.ops.depth_sample import (
    grid_sample_bilinear,
    signed_distance_to_depth,
)
from nextbestpath_tpu.sim import (
    ProxyField,
    SurfaceStore,
    camera_coverage_gain,
    carve_with_frame,
)
from nextbestpath_tpu.sim.rollout import interpolate_pose
from nextbestpath_tpu.sim.sensor import PointBuffer, FramePoints
from nextbestpath_tpu.train.replay import ReplayDB


def test_grid_sample_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    img = rng.random((8, 12)).astype(np.float32)
    gx = rng.uniform(-1, 1, (30,)).astype(np.float32)
    gy = rng.uniform(-1, 1, (30,)).astype(np.float32)
    want = F.grid_sample(
        torch.from_numpy(img)[None, None],
        torch.from_numpy(np.stack([gx, gy], -1))[None, :, None, :],
        mode="bilinear", padding_mode="border", align_corners=False,
    )[0, 0, :, 0].numpy()
    got = np.asarray(grid_sample_bilinear(jnp.asarray(img), jnp.asarray(gx),
                                          jnp.asarray(gy)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_signed_distance_sign():
    intr = CameraIntrinsics(image_height=16, image_width=28, zfar=100.0)
    R, T = get_camera_RT(jnp.zeros((1, 3)), jnp.asarray([[0.0, 0.0]]))
    zbuf = jnp.full((16, 28), 10.0)  # flat wall at view z 10
    pts = jnp.asarray([[0.0, 0.0, 5.0], [0.0, 0.0, 15.0]])
    sgn = np.asarray(signed_distance_to_depth(pts, zbuf, R[0], T[0], intr))
    assert sgn[0] < 0  # in front of the wall
    assert sgn[1] > 0  # behind the wall


def test_proxy_carving():
    key = jax.random.PRNGKey(0)
    intr = CameraIntrinsics(image_height=16, image_width=28, zfar=100.0)
    field = ProxyField.create(key, jnp.asarray([-5.0, -5.0, 1.0]),
                              jnp.asarray([5.0, 5.0, 20.0]), 256)
    R, T = get_camera_RT(jnp.zeros((1, 3)), jnp.asarray([[0.0, 0.0]]))
    zbuf = jnp.full((16, 28), 10.0)
    out = carve_with_frame(field, zbuf, R[0], T[0], jnp.zeros(3), intr,
                           carving_tolerance=0.0)
    sup = np.asarray(out.supervision_occ[:, 0])
    pts = np.asarray(field.points)
    # Points clearly in front of the wall and in the fov should be carved to 0.
    from nextbestpath_tpu.geometry import points_in_fov_mask
    fov = np.asarray(points_in_fov_mask(field.points, R[0], T[0], intr))
    front = fov & (pts[:, 2] < 9.0)
    behind = fov & (pts[:, 2] > 11.0)
    if front.sum():
        assert sup[front].max() == 0.0
    if behind.sum():
        assert sup[behind].min() == 1.0
    # Out-of-field flag cleared exactly for fov points.
    np.testing.assert_array_equal(np.asarray(out.out_of_field[:, 0]) == 0.0, fov)


def test_surface_store_dedup_and_gain():
    store = SurfaceStore.create(1024, [0.0, 0.0, 0.0], [10.0, 10.0, 10.0], 0.5)
    pts = jnp.asarray([[1.0, 1.0, 1.0], [1.1, 1.05, 1.0], [5.0, 5.0, 5.0]])
    store = store.fill(pts, jnp.ones(3, bool))
    # First two share a voxel -> deduplicated.
    assert int(store.count) == 2
    gain, store = camera_coverage_gain(store, pts[:1], jnp.ones(1, bool), 1.0)
    assert float(gain) == 1.0  # one stored point within eps of the batch
    gain2, store = camera_coverage_gain(store, pts[:1], jnp.ones(1, bool), 1.0)
    assert float(gain2) == 0.0  # already covered


def test_interpolate_pose_wraparound():
    old = jnp.asarray([0.0, 0.0, 0.0, 0.0, 315.0])  # azim idx 7 of 8
    new = jnp.asarray([3.0, 0.0, 0.0, 0.0, 0.0])    # azim idx 0
    mid = interpolate_pose(old, new, jnp.int32(2), 4, 8)
    # Short way: 315 -> 360, at half-way ~337.5 (not 157.5).
    assert abs(float(mid[4]) - 337.5) < 1e-4
    final = interpolate_pose(old, new, jnp.int32(4), 4, 8)
    assert abs(float(final[4]) - 0.0) < 1e-5


def test_point_buffer_append():
    buf = PointBuffer.create(16)
    pts = jnp.arange(30).reshape(10, 3).astype(jnp.float32)
    valid = jnp.asarray([True, False, True] * 3 + [True])
    buf = buf.append(FramePoints(points=pts, valid=valid))
    assert int(buf.count) == int(valid.sum())
    got = np.asarray(buf.points[: int(buf.count)])
    want = np.asarray(pts)[np.asarray(valid)]
    np.testing.assert_array_equal(got, want)


def test_replay_db_roundtrip(tmp_path):
    db = ReplayDB()
    for i in range(10):
        db.append(np.zeros((5, 256, 256), np.float16),
                  np.zeros((256, 256), np.uint8),
                  np.asarray([[1, 2, 3]], np.int32),
                  np.asarray([0.5], np.float32), pose_i=i)
    val = db.extract_validation(num=3)
    assert len(val) == 3 and len(db) == 7
    path = str(tmp_path / "db.npz")
    db.save(path)
    db2 = ReplayDB(path)
    assert len(db2) == 7
    combined = db2.read_combined(last_n=4, sample_size=2)
    assert len(combined) == 6


def test_sample_proxy_points_weighting():
    from nextbestpath_tpu.sim import sample_proxy_points

    key = jax.random.PRNGKey(0)
    pts = jnp.zeros((100, 3))
    occ = jnp.concatenate([jnp.full((50, 1), 0.9), jnp.full((50, 1), 0.05)])
    mask = jnp.ones(100, bool)
    idx = np.asarray(sample_proxy_points(key, pts, occ, mask, 256,
                                         min_occ=0.1))
    # Low-occupancy half (occ 0.05 < min_occ) never sampled.
    assert (idx < 50).all()


def test_curriculum_schedules():
    """arctan distance ramp + linear cell ramp (macarons_utils.py:1744-1764)."""
    import numpy as np

    from nextbestpath_tpu.sim.curriculum import (
        curriculum_sampling_cell_number,
        curriculum_sampling_distances,
    )

    d = curriculum_sampling_distances(100, 2.0, 50.0)
    assert d.shape == (100,)
    assert abs(d[0] - 2.0) < 1e-6 and abs(d[-1] - 50.0) < 1e-6
    assert np.all(np.diff(d) >= 0)
    # arctan shape: the middle ramps fastest.
    assert (d[55] - d[45]) > (d[9] - d[0])

    n = curriculum_sampling_cell_number(100)
    assert n[0] == 5 and n[-1] == 20
    assert n.dtype.kind == "i"


def test_backproject_sample_stratified_matches_topk_semantics():
    """The stratified two-stage pixel draw keeps the top_k path's contract:
    exactly n_keep = int(gf * n_valid) valid slots, every selected point is
    the unprojection of a distinct valid pixel."""
    from nextbestpath_tpu.geometry.cameras import camera_center
    from nextbestpath_tpu.sim.sensor import backproject_sample

    intr = CameraIntrinsics(image_height=16, image_width=24)
    rng = np.random.default_rng(0)
    zbuf = rng.uniform(2.0, 30.0, (16, 24)).astype(np.float32)
    zbuf[rng.uniform(size=(16, 24)) < 0.3] = -1.0  # background
    zbuf = jnp.asarray(zbuf)
    R = jnp.eye(3)
    T = jnp.zeros(3)
    n_valid = int(np.sum(np.asarray(zbuf) > -1.0))
    gf, n_slots = 0.25, 128  # group=3 -> gf*group <= 1 (stratified active)

    outs = {}
    for strat in (False, True):
        b = backproject_sample(zbuf, R, T, intr, jax.random.PRNGKey(1),
                               n_slots, gathering_factor=gf,
                               sensor_range=70.0, stratified=strat)
        outs[strat] = b
        assert int(jnp.sum(b.valid)) == int(gf * n_valid)

    # Every selected point must be the unprojection of some valid pixel.
    from nextbestpath_tpu.geometry.cameras import unproject_depth

    depth = jnp.clip(zbuf, 0.5, 750.0)
    world = np.asarray(unproject_depth(depth, R, T, intr)).reshape(-1, 3)
    valid_world = world[np.asarray(zbuf).reshape(-1) > -1.0]
    for strat in (False, True):
        pts = np.asarray(outs[strat].points)[np.asarray(outs[strat].valid)]
        d = np.linalg.norm(pts[:, None] - valid_world[None], axis=-1).min(1)
        assert d.max() < 1e-4
        # Distinct pixels: no duplicated selections.
        assert len(np.unique(pts.round(5), axis=0)) == len(pts)


def test_move_and_capture_stratified_jit():
    """Regression: move_and_capture/observe_current are jitted with
    gathering_factor STATIC — passing it (a Python float) alongside
    stratified=True used to trace it and crash the trace-time branch
    `gathering_factor * group <= 1.0` in backproject_sample
    (TracerBoolConversionError, hit by `bench.py --stratified`)."""
    from nextbestpath_tpu.ops.raytrace import tris_to_soa
    from nextbestpath_tpu.sim import (
        PointBuffer,
        TrajectoryBuffer,
        move_and_capture,
        observe_current,
    )

    # One large wall (two triangles) 5 units in front of the camera.
    wall = jnp.asarray([
        [[-50.0, -50.0, 5.0], [50.0, -50.0, 5.0], [50.0, 50.0, 5.0]],
        [[-50.0, -50.0, 5.0], [50.0, 50.0, 5.0], [-50.0, 50.0, 5.0]],
    ])
    soa = tris_to_soa(wall)
    intr = CameraIntrinsics(image_height=16, image_width=24)
    pose = jnp.asarray([0.0, 0.0, 0.0, 0.0, 0.0])
    pc = PointBuffer.create(2048)
    traj = TrajectoryBuffer.create(16)

    pc, traj, zbuf = move_and_capture(
        soa, jnp.asarray(2, jnp.int32), pose, pose, pc, traj,
        jax.random.PRNGKey(0), intr, n_steps=2, n_azim=8, n_slots=256,
        gathering_factor=0.25, sensor_range=70.0, stratified=True,
    )
    pc = observe_current(
        soa, jnp.asarray(2, jnp.int32), pose, pc, jax.random.PRNGKey(1),
        intr, n_slots=256, gathering_factor=0.25, sensor_range=70.0,
        stratified=True,
    )
    assert int(pc.count) > 0
    pts = np.asarray(pc.points)[np.asarray(pc.valid_mask())]
    # Every stratified-sampled point lies on the wall plane.
    np.testing.assert_allclose(np.abs(pts[:, 2]), 5.0, atol=1e-3)


def test_memory_slot_reuse_and_ordered_replay(tmp_path):
    """begin_trajectory clears a reused slot's stale files (a shorter new
    trajectory must not inherit the previous occupant's tail), and
    get_random_scene_for_scone_model replays base frames in trajectory
    order with the LATEST frames held out as replay cameras."""
    from nextbestpath_tpu.sim.memory import Memory

    scene_dir = str(tmp_path / "scene")
    mem = Memory([scene_dir], n_trajectories=2, current_epoch=0)
    intr = CameraIntrinsics(image_height=8, image_width=12)
    rng_np = np.random.default_rng(0)

    def write_traj(traj, n, depth_val):
        for i in range(n):
            depth = np.full((8, 12), depth_val, np.float32)
            mem.save_depth(scene_dir, traj, i, depth, np.eye(3),
                           np.asarray([0.0, 0.0, float(i)]))
        mem.save_occupancy(scene_dir, traj,
                           rng_np.uniform(-1, 1, (32, 3)),
                           np.full((32, 1), 0.5), np.ones((32, 1)),
                           np.zeros((32, 98)), np.ones((32, 1)))

    # Epoch 0 writes 12 depths into slot 0.
    write_traj(0, 12, 5.0)
    assert mem.n_depths(scene_dir, 0) == 12
    # Epoch 2 reuses slot 0 with a SHORTER trajectory: stale tail cleared.
    mem.current_epoch = 2
    assert mem.begin_trajectory(scene_dir) == 0
    assert mem.n_depths(scene_dir, 0) == 0
    write_traj(0, 5, 5.0)
    assert mem.n_depths(scene_dir, 0) == 5

    # Replay from the non-current slot: write slot 1, make slot 0 current.
    mem.current_epoch = 0
    mem.begin_trajectory(scene_dir)
    write_traj(0, 5, 5.0)
    mem.current_epoch = 1  # current = slot 1; replay serves slot 0
    scene = mem.get_random_scene_for_scone_model(
        scene_dir, intr, n_frames=4, points_per_frame=16,
        rng=__import__("random").Random(3), sensor_range=70.0,
        n_replay_poses=1)
    assert scene is not None
    # Held-out replay camera is the LATEST of the sampled window: its T_z
    # (frame index) exceeds every base camera's.
    base_z = scene["base_clouds"].shape  # (3, 16, 3)
    assert base_z == (3, 16, 3)
    assert scene["replay_cams"].shape == (1, 3)


def test_point_buffer_append_prefix_fast_path():
    """append(prefix_valid=True) must equal the compacting path whenever
    the batch's validity is a leading prefix (the invariant the fast path
    rides on)."""
    buf_a = PointBuffer.create(32)
    buf_b = PointBuffer.create(32)
    pts = jnp.arange(36).reshape(12, 3).astype(jnp.float32)
    valid = jnp.arange(12) < 7
    a = buf_a.append(FramePoints(points=pts, valid=valid))
    b = buf_b.append(FramePoints(points=pts, valid=valid), prefix_valid=True)
    assert int(a.count) == int(b.count) == 7
    np.testing.assert_array_equal(np.asarray(a.points), np.asarray(b.points))
    # Capacity overflow drops the tail identically.
    a2 = a.append(FramePoints(points=pts * 10, valid=jnp.ones(12, bool)))
    b2 = b.append(FramePoints(points=pts * 10, valid=jnp.ones(12, bool)),
                  prefix_valid=True)
    a3 = a2.append(FramePoints(points=pts + 99, valid=valid))
    b3 = b2.append(FramePoints(points=pts + 99, valid=valid),
                   prefix_valid=True)
    assert int(a3.count) == int(b3.count)
    np.testing.assert_array_equal(np.asarray(a3.points),
                                  np.asarray(b3.points))


def test_backproject_sample_valid_is_prefix():
    """Both sampler paths order valid slots first: the stratified path
    ranks valid strata before empty ones, the top_k path ranks valid
    scores (< 1) before invalid (2.0). PointBuffer.append(prefix_valid=
    True) and coverage_percentage(s_count=count) both rely on this."""
    from nextbestpath_tpu.sim.sensor import backproject_sample

    H, W = 32, 57
    intr = CameraIntrinsics(H, W, 60.0, 1.0, 750.0)
    key = jax.random.PRNGKey(0)
    # Half the frame is background (-1), half valid depth.
    zbuf = jnp.where(jnp.arange(H * W).reshape(H, W) % 3 == 0, 5.0, -1.0)
    R = jnp.eye(3)
    T = jnp.zeros(3)
    for strat in (False, True):
        fp = backproject_sample(zbuf, R, T, intr, key, n_slots=128,
                                gathering_factor=0.2, stratified=strat)
        v = np.asarray(fp.valid)
        n = int(v.sum())
        assert n > 0
        assert v[:n].all() and not v[n:].any(), f"stratified={strat}"
