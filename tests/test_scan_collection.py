"""The fully-jitted collection rollout: experiences come out with the same
schema + labels as the host-loop collector."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nextbestpath_tpu.assets import generate_scene, pack_generated_scene
from nextbestpath_tpu.config import default_params
from nextbestpath_tpu.models import NBP
from nextbestpath_tpu.train.replay import ReplayDB
from nextbestpath_tpu.train.scan_collection import (
    CollectOut,
    ScanCollection,
    collect_trajectory_scan,
    soa_to_tris,
    suffix_labels_from_out,
)

TINY = dict(
    image_height=32, image_width=56, points_per_frame=256,
    full_pc_capacity=32768, n_gt_surface_points=1024, max_path_len=32,
    pc2img_size=[64, 64], value_map_size=[16, 16],
)


def test_soa_roundtrip():
    from nextbestpath_tpu.ops.raytrace import tris_to_soa

    tris = jnp.asarray(np.random.default_rng(0).normal(size=(7, 3, 3)),
                       jnp.float32)
    np.testing.assert_allclose(np.asarray(soa_to_tris(tris_to_soa(tris))),
                               np.asarray(tris), atol=1e-5)


def test_suffix_labels_match_host_miner():
    """suffix_labels_from_out must reproduce collection._suffix_labels
    flushed per planned-path segment (the host flushes at every replan, so
    pairs never span a replan boundary — nbp_utils.py:654-687)."""
    from nextbestpath_tpu.train.collection import _suffix_labels

    rng = np.random.default_rng(3)
    P, S, vms = 12, 8, 16
    pose5 = np.zeros((P, 5), np.float32)
    pose5[:, 0] = np.cumsum(rng.integers(-1, 2, P)) * 3.0
    pose5[:, 2] = np.cumsum(rng.integers(-1, 2, P)) * 3.0
    cov = np.sort(rng.uniform(0, 1, P)).astype(np.float32)
    rot = rng.integers(0, 8, P).astype(np.int32)
    grid_range = (-24.0, 24.0)
    planned = np.zeros(P, bool)
    planned[[0, 5, 9]] = True  # three path segments: [0:5], [5:9], [9:12]

    out = CollectOut(
        model_input=np.zeros((P, S, S, 5), np.float32),
        gt_obs=np.zeros((P, S, S), bool),
        pose5=pose5, rot=rot, coverage=cov,
        valid=np.ones(P, bool), planned=planned,
    )
    got = suffix_labels_from_out(out, vms, grid_range)

    want = []
    for a, b in ((0, 5), (5, 9), (9, 12)):
        experiences = [
            dict(coverage=float(cov[i]), cam_pose5=pose5[i], rot=int(rot[i]),
                 model_input=None, gt_obs=None, pose_i=i)
            for i in range(a, b)
        ]
        want.extend(_suffix_labels(experiences, vms, grid_range))

    assert len(got) == len(want)
    assert len(got) > 0
    for (gi, gpix, ggain), (wex, wpix, wgain) in zip(got, want):
        assert gi == wex["pose_i"]
        np.testing.assert_array_equal(gpix, wpix)
        np.testing.assert_allclose(ggain, wgain, atol=1e-5)

    # Cross-segment pairs are excluded: an unsegmented miner (planned only
    # at pose 0) must produce strictly more labels.
    out_flat = out._replace(planned=np.eye(1, P, 0, dtype=bool)[0])
    got_flat = suffix_labels_from_out(out_flat, vms, grid_range)
    assert sum(len(g[2]) for g in got_flat) > sum(len(g[2]) for g in got)


@pytest.mark.slow
def test_scan_collection_rollout_and_db():
    params = default_params(**TINY)
    assets = pack_generated_scene(generate_scene("simple", seed=2),
                                  params=params)
    model = NBP()
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 5)))
    coll = ScanCollection([assets], model, params=params)
    out = coll.run(0, variables, seed=5, n_poses=4)

    S = 64
    assert out.model_input.shape == (4, S, S, 5)
    assert out.gt_obs.shape == (4, S, S)
    assert out.coverage.shape == (4,)
    # Points accumulate over a rollout; the coverage ESTIMATE is a random
    # subsample, so only the trend is asserted.
    assert out.coverage[-1] > out.coverage[0]
    assert out.coverage[1] > 0.0
    # GT obstacle map sees actual geometry.
    assert out.gt_obs[0].sum() > 10

    db = ReplayDB()
    covs = collect_trajectory_scan(coll, 0, variables, db, seed=5, n_poses=4)
    assert len(covs) >= 1
    if len(db):
        e = db.entries[0]
        assert e.model_input.shape == (5, S, S)
        assert e.gt_layout.shape == (S, S)
        assert e.pixels.shape[1] == 3
        assert np.all(e.pixels[:, 1:] >= 0)
        assert np.all(e.pixels[:, 1:] < 16)
        assert np.all(e.gains >= 0)


def test_replay_db_dir_roundtrip(tmp_path):
    db = ReplayDB()
    for i in range(5):
        db.append(np.zeros((5, 8, 8)), np.zeros((8, 8)),
                  np.asarray([[1, 2, 3]]), np.asarray([0.5]), i)
    hw = db.save_epoch(str(tmp_path), 0, 0)
    for i in range(3):
        db.append(np.ones((5, 8, 8)), np.ones((8, 8)),
                  np.asarray([[0, 1, 1]]), np.asarray([1.5]), i)
    db.save_epoch(str(tmp_path), 1, hw)

    db2 = ReplayDB()
    n = db2.load_dir(str(tmp_path))
    assert n == 8 and len(db2) == 8
    assert db2.entries[5].gains[0] == 1.5
    assert db2.entries[0].pose_i == 0
