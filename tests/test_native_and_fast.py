import os
import subprocess

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")


@pytest.fixture(scope="module", autouse=True)
def build_native():
    subprocess.run(["sh", os.path.join(REPO, "native", "build.sh")],
                   check=True, capture_output=True)


def test_native_obj_parser_matches_python(tmp_path):
    from nextbestpath_tpu.assets import generate_scene, save_obj
    from nextbestpath_tpu.assets.obj_io import load_obj
    from nextbestpath_tpu.assets.obj_native import load_obj_fast, native_available

    assert native_available()
    scn = generate_scene("simple", seed=5)
    path = str(tmp_path / "scene.obj")
    save_obj(path, scn.verts, scn.faces)
    v1, f1 = load_obj(path)
    v2, f2 = load_obj_fast(path)
    np.testing.assert_allclose(v2, v1, atol=1e-5)
    np.testing.assert_array_equal(f2, f1)


def test_native_replay_store_roundtrip(tmp_path):
    from nextbestpath_tpu.train.replay import Experience
    from nextbestpath_tpu.train.replay_native import (
        NativeReplayStore, native_available)

    assert native_available()
    path = str(tmp_path / "replay.bin")
    store = NativeReplayStore(path)
    e = Experience(
        model_input=np.random.default_rng(0).random(
            (5, 256, 256)).astype(np.float16),
        gt_layout=(np.random.default_rng(1).random((256, 256)) > 0.5
                   ).astype(np.uint8),
        pixels=np.asarray([[1, 2, 3], [4, 5, 6]], np.int32),
        gains=np.asarray([0.25, 0.5], np.float32),
        pose_i=7,
    )
    store.append(e)
    store.append(e)
    assert len(store) == 2
    store.close()
    # Reopen: index rebuilt from the log.
    store2 = NativeReplayStore(path)
    assert len(store2) == 2
    got = store2.read(1)
    np.testing.assert_array_equal(got.model_input, e.model_input)
    np.testing.assert_array_equal(got.gt_layout, e.gt_layout)
    np.testing.assert_array_equal(got.pixels, e.pixels)
    np.testing.assert_array_equal(got.gains, e.gains)
    assert got.pose_i == 7
    store2.close()


def test_fast_sampling_coverage_close_to_exact():
    from nextbestpath_tpu.ops.coverage import coverage_percentage

    rng = np.random.default_rng(0)
    gt = jnp.asarray(rng.uniform(0, 50, (1024, 3)), jnp.float32)
    cap = 16384
    count = 9000
    pts = jnp.zeros((cap, 3), jnp.float32)
    # Recon covers ~60% of GT: points near a random 60% subset.
    sel = rng.permutation(1024)[:614]
    cover_pts = np.asarray(gt)[sel] + rng.normal(scale=0.1, size=(614, 3))
    filler = rng.uniform(100, 150, (count - 614, 3))
    pts = pts.at[:count].set(
        jnp.asarray(np.concatenate([cover_pts, filler]), jnp.float32))
    exact = float(coverage_percentage(gt, pts, jnp.int32(count),
                                      jax.random.PRNGKey(0)))
    fast = float(coverage_percentage(gt, pts, jnp.int32(count),
                                     jax.random.PRNGKey(0),
                                     fast_sampling=True))
    assert abs(exact - fast) < 0.03, (exact, fast)


def test_replay_db_native_roundtrip(tmp_path):
    """ReplayDB.save_native/load_native: the opt-in incremental record
    tier (LMDB analog) round-trips entries exactly and appends only the
    new suffix on re-save."""
    from nextbestpath_tpu.train.replay_native import native_available

    if not native_available():
        import pytest

        pytest.skip("native replay store not built")
    import numpy as np

    from nextbestpath_tpu.train.replay import ReplayDB

    db = ReplayDB()
    for i in range(4):
        db.append(np.full((5, 16, 16), i, np.float16),
                  np.zeros((16, 16), np.uint8),
                  np.asarray([[i, 1, 2]], np.int32),
                  np.asarray([0.25 * i], np.float32), pose_i=i)
    path = str(tmp_path / "store.bin")
    db.save_native(path)
    db.append(np.full((5, 16, 16), 9, np.float16),
              np.zeros((16, 16), np.uint8),
              np.asarray([[9, 1, 2]], np.int32),
              np.asarray([9.0], np.float32), pose_i=9)
    db.save_native(path)  # appends only the new record

    db2 = ReplayDB()
    assert db2.load_native(path) == 5
    assert [e.pose_i for e in db2.entries] == [0, 1, 2, 3, 9]
    np.testing.assert_array_equal(db2.entries[4].model_input,
                                  db.entries[4].model_input)
