"""Long-tail reference components: segment-vs-cloud collision, the legacy
bidirectional planner, averaged-value scatter, pc similarity, and the
pose-validity queries."""

import jax
import jax.numpy as jnp
import numpy as np

from nextbestpath_tpu.geometry.cameras import CameraIntrinsics
from nextbestpath_tpu.ops.coverage import pc_similarity
from nextbestpath_tpu.ops.pc_collision import (
    collision_with_occupancy_field,
    segment_intersects_point_cloud,
    segment_point_distances,
)
from nextbestpath_tpu.ops.scatter2d import scatter_mean_img
from nextbestpath_tpu.planning.bidirectional import (
    bidirectional_grid_path,
    bidirectional_path_positions,
    pc_edge_blocked,
)
from nextbestpath_tpu.sim.pose_validity import (
    lattice_validity_mask,
    random_valid_pose,
    sample_valid_poses_in_range,
)


# -- segment distances / collision predicates ------------------------------


def test_segment_point_distances_matches_numpy():
    rng = np.random.RandomState(0)
    pts = rng.randn(64, 3).astype(np.float32) * 3
    a = np.asarray([0.0, 0.0, 0.0], np.float32)
    b = np.asarray([2.0, 0.0, 0.0], np.float32)
    got = np.asarray(segment_point_distances(jnp.asarray(pts),
                                             jnp.asarray(a), jnp.asarray(b)))
    line = b - a
    t = (pts - a) @ line / (line @ line)
    want = np.where(
        (t >= 0) & (t <= 1),
        np.linalg.norm(pts - (a + t[:, None] * line), axis=-1),
        np.minimum(np.linalg.norm(pts - a, axis=-1),
                   np.linalg.norm(pts - b, axis=-1)),
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_segment_intersects_point_cloud_threshold():
    pts = jnp.asarray([[1.0, 0.15, 0.0], [5.0, 5.0, 5.0]])
    valid = jnp.asarray([True, True])
    a, b = jnp.zeros(3), jnp.asarray([2.0, 0.0, 0.0])
    assert bool(segment_intersects_point_cloud(pts, valid, a, b))
    # Same point masked out -> no hit.
    assert not bool(segment_intersects_point_cloud(
        pts, jnp.asarray([False, True]), a, b))
    # 0.25 away > the reference's 0.2 threshold.
    far = jnp.asarray([[1.0, 0.25, 0.0]])
    assert not bool(segment_intersects_point_cloud(
        far, jnp.asarray([True]), a, b))


def test_collision_with_occupancy_field_counts():
    # >= 5 close points with occ > 0.9 trip the predicate
    # (long_term_utils.py:640-648); 4 do not, nor do low-occ points.
    close = np.tile([[1.0, 0.5, 0.0]], (5, 1)).astype(np.float32)
    a, b = jnp.zeros(3), jnp.asarray([2.0, 0.0, 0.0])
    valid = jnp.ones(5, bool)
    hi = jnp.full(5, 0.95)
    lo = jnp.full(5, 0.5)
    assert bool(collision_with_occupancy_field(jnp.asarray(close), hi,
                                               valid, a, b))
    assert not bool(collision_with_occupancy_field(jnp.asarray(close), lo,
                                                   valid, a, b))
    valid4 = valid.at[0].set(False)
    assert not bool(collision_with_occupancy_field(jnp.asarray(close), hi,
                                                   valid4, a, b))


# -- legacy bidirectional planner ------------------------------------------


def _grid_positions(L, H, step=1.0):
    ll, hh = np.meshgrid(np.arange(L), np.arange(H), indexing="ij")
    pos = np.stack([ll * step, np.zeros_like(ll), hh * step],
                   axis=-1).astype(np.float32)
    return pos


def test_bidirectional_path_routes_around_wall():
    L = H = 7
    pos = _grid_positions(L, H)
    # A wall of points at x=3 for z in [0, 5]: edges crossing it are blocked;
    # the corridor at z=6 stays open.
    wall = np.asarray([[3.0, 0.0, z * 0.5] for z in range(11)], np.float32)
    pts = jnp.asarray(wall)
    valid = jnp.ones(len(wall), bool)
    blocked = np.asarray(pc_edge_blocked(jnp.asarray(pos), pts, valid))
    path = bidirectional_grid_path(blocked, (0, 0), (6, 0))
    assert path is not None and path[0] == (0, 0) and path[-1] == (6, 0)
    # Unit moves only, no blocked edge used.
    for u, v in zip(path, path[1:]):
        d = (v[0] - u[0], v[1] - u[1])
        assert abs(d[0]) + abs(d[1]) == 1
        from nextbestpath_tpu.planning.grid_paths import DIRS

        di = DIRS.index(list(d)) if isinstance(DIRS, list) else int(
            np.flatnonzero((np.asarray(DIRS) == d).all(-1))[0])
        assert not blocked[di, u[0], u[1]]
    # The detour must pass the open corridor row (h >= 6 near the wall).
    assert any(h >= 6 for (l, h) in path)
    # World-position variant drops the start node (reference :252).
    wp = bidirectional_path_positions(pos, pts, valid, (0, 0), (6, 0))
    assert wp is not None and len(wp) == len(path) - 1
    np.testing.assert_allclose(wp[-1], pos[6, 0])


def test_bidirectional_path_none_when_sealed():
    L = H = 5
    pos = _grid_positions(L, H)
    # Points at every lattice midpoint: everything collides.
    dense = np.stack(np.meshgrid(np.linspace(0, 4, 17),
                                 np.linspace(0, 4, 17)),
                     axis=-1).reshape(-1, 2)
    pts = np.stack([dense[:, 0], np.zeros(len(dense)), dense[:, 1]],
                   axis=-1).astype(np.float32)
    blocked = np.asarray(pc_edge_blocked(jnp.asarray(pos),
                                         jnp.asarray(pts),
                                         jnp.ones(len(pts), bool)))
    assert bidirectional_grid_path(blocked, (0, 0), (4, 4)) is None


# -- averaged scatter + pc similarity --------------------------------------


def test_scatter_mean_img_averages():
    pts2d = jnp.asarray([[0.0, 0.0], [0.0, 0.0], [1.0, 1.0]])
    vals = jnp.asarray([1.0, 3.0, 5.0])
    valid = jnp.ones(3, bool)
    img = np.asarray(scatter_mean_img(pts2d, vals, valid, grid_size=4,
                                      grid_range=(-2.0, 2.0)))
    # scale = 4/4 = 1; (0,0) -> pixel (2,2); (1,1) -> (3,3).
    assert img[2, 2] == 2.0  # mean of 1 and 3
    assert img[3, 3] == 5.0
    assert img.sum() == 7.0  # everything else empty -> 0


def test_pc_similarity_bounds():
    rng = np.random.RandomState(1)
    gt = rng.rand(500, 3).astype(np.float32) * 10
    assert pc_similarity(gt, gt) == 1.0
    far = gt + np.asarray([100.0, 0, 0], np.float32)
    assert pc_similarity(gt, far) == 0.0
    half = gt[: len(gt) // 2]
    s = pc_similarity(gt, half)
    assert 0.0 < s < 1.0


# -- pose validity ----------------------------------------------------------


def _intr():
    return CameraIntrinsics(image_height=32, image_width=56,
                            fov_degrees=60.0, znear=0.5, zfar=50.0)


def test_lattice_validity_orientation_matters():
    # One surface cluster at +z from both lattice positions: azimuth 180
    # (looking along -z in the reference convention, cameras.py) vs 0 flips
    # visibility, so validity must depend on the azimuth index.
    positions = jnp.asarray([[[0.0, 0.0, 0.0]], [[1.0, 0.0, 0.0]]])  # (2,1,3)
    azims = jnp.asarray([0.0, 180.0])
    pts = jnp.asarray([[0.5, 0.0, 8.0], [0.4, 0.1, 8.2]])
    mask = lattice_validity_mask(positions, azims, 0.0, pts,
                                 jnp.ones(2, bool), _intr(), zfar=50.0)
    assert mask.shape == (2, 1, 2)
    m = np.asarray(mask)
    # Exactly one azimuth per position sees the cluster.
    assert (m.sum(axis=-1) == 1).all()
    # With a proxy cloud on the OTHER side, no pose sees both -> all invalid.
    proxy = jnp.asarray([[0.5, 0.0, -8.0]])
    mask2 = lattice_validity_mask(positions, azims, 0.0, pts,
                                  jnp.ones(2, bool), _intr(), zfar=50.0,
                                  proxy_points=proxy)
    assert not np.asarray(mask2).any()


def test_random_valid_pose_respects_mask():
    mask = jnp.zeros((3, 4, 2), bool).at[1, 2, 1].set(True).at[2, 0, 0].set(
        True)
    draws = set()
    for i in range(20):
        idx = np.asarray(random_valid_pose(jax.random.PRNGKey(i), mask))
        draws.add(tuple(int(v) for v in idx))
    assert draws <= {(1, 2, 1), (2, 0, 0)}
    assert len(draws) == 2  # both valid poses get drawn


def test_sample_valid_poses_in_range_ball():
    L, H, A = 7, 7, 3
    valid = jnp.ones((L, H, A), bool)
    key = jax.random.PRNGKey(0)
    got = np.asarray(sample_valid_poses_in_range(key, valid,
                                                 jnp.asarray([3, 3]), 2,
                                                 keep_frac=1.0))
    ll, hh = np.meshgrid(np.arange(L), np.arange(H), indexing="ij")
    l1 = np.abs(ll - 3) + np.abs(hh - 3)
    want = (l1 <= 2) & (l1 > 0)
    assert (got == want[:, :, None]).all()
    # keep_frac thins the set (statistically certain with 72 candidates).
    thin = np.asarray(sample_valid_poses_in_range(key, valid,
                                                  jnp.asarray([3, 3]), 2,
                                                  keep_frac=0.2))
    assert 0 < thin.sum() < got.sum()


# -- legacy datasets --------------------------------------------------------


def test_object_dataset_walks_and_normalizes(tmp_path):
    from nextbestpath_tpu.assets.obj_io import save_obj
    from nextbestpath_tpu.assets.object_dataset import (
        ObjectDataset,
        adjust_mesh,
        adjust_mesh_diagonally,
    )

    verts = np.asarray([[0, 0, 0], [4, 0, 0], [0, 2, 0], [0, 0, 1]],
                       np.float32)
    faces = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    (tmp_path / "sub").mkdir()
    save_obj(str(tmp_path / "a.obj"), verts, faces)
    save_obj(str(tmp_path / "sub" / "b.obj"), verts * 2, faces)

    ds = ObjectDataset(str(tmp_path))
    assert len(ds) == 2
    item = ds[0]
    assert item["faces"].shape == (2, 3)
    # adjust_mesh: largest extent (4) spans range/sqrt(3), centered.
    v = item["verts"]
    ext = v.max(0) - v.min(0)
    np.testing.assert_allclose(float(ext.max()), 1.0 / np.sqrt(3), atol=1e-5)
    np.testing.assert_allclose(v.min(0) + ext / 2, 0.0, atol=1e-5)
    # Diagonal mode: bbox diagonal spans exactly 1.
    vd = adjust_mesh_diagonally(verts)
    np.testing.assert_allclose(np.linalg.norm(vd.max(0) - vd.min(0)), 1.0,
                               atol=1e-5)
    assert np.allclose(adjust_mesh(verts), v)

    # JSON round trip + size threshold.
    ds.__class__(str(tmp_path), save_to_json=True,
                 json_name=str(tmp_path / "list.json"))
    ds2 = ObjectDataset(str(tmp_path), load_from_json=True,
                        json_name=str(tmp_path / "list.json"))
    assert [m for m in ds2.models] == [m for m in ds.models]
    assert len(ObjectDataset(str(tmp_path), memory_threshold=1)) == 0


def test_frame_dataset_margins_and_neighbors(tmp_path):
    from nextbestpath_tpu.assets.object_dataset import FrameDataset

    traj = tmp_path / "sceneA" / "images" / "0"
    traj.mkdir(parents=True)
    for n in range(6):
        np.savez(traj / f"{n}.npz", depth=np.full((2, 2), float(n)),
                 pose=np.arange(5.0) + n)

    ds = FrameDataset(str(tmp_path), alpha_max=2)
    # Frames 2..5 have 2 past frames.
    assert len(ds) == 4
    f = ds[0]
    assert float(f["depth"][0, 0]) == 2.0
    prev = ds.get_neighbor_frame(0, -2)
    assert float(prev["depth"][0, 0]) == 0.0

    # Future margin: frames 2..3 only.
    ds_f = FrameDataset(str(tmp_path), alpha_max=2, use_future_images=True)
    assert len(ds_f) == 2
    nxt = ds_f.get_neighbor_frame(0, +2)
    assert float(nxt["depth"][0, 0]) == 4.0

    # frames_to_remove excludes a listed frame.
    import json as _json

    with open(tmp_path / "frames_to_remove.json", "w") as fh:
        _json.dump(["sceneA/images/0/3.npz"], fh)
    ds_r = FrameDataset(str(tmp_path), alpha_max=2)
    assert len(ds_r) == 3
    assert all(e["frame"] != 3 for e in ds_r.index)
