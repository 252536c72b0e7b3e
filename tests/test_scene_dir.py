"""Real-data ingestion path: reference-format scene directories.

The reference's on-disk contract is a per-scene directory holding one
``.obj`` (reference units) plus a ``settings.json`` whose coordinates get
multiplied by ``params.scene_scale_factor`` at load
(SceneDataset.__getitem__, /root/reference/macarons/utility/
CustomDataset.py:336-363; Settings schema macarons_utils.py:2152-2190).
These tests build a synthetic scene dir in that exact format from a procgen
scene and prove ``load_scene_dir`` reproduces what ``pack_generated_scene``
produces from the in-memory original: same scaled triangles, same camera
pose lattice, same start pose, same settings round trip — plus the
``mirrored_axis`` augmentation (load_scene_with_texture(mirror=True),
macarons_utils.py:574-609) and the ``--scene-dirs`` CLI rollout.
"""

import json
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from nextbestpath_tpu.assets import (  # noqa: E402
    generate_scene,
    load_scene_dir,
    pack_generated_scene,
)
from nextbestpath_tpu.assets.obj_io import save_obj  # noqa: E402
from nextbestpath_tpu.config import Settings, default_params  # noqa: E402

SCALE = 10.0


def _write_scene_dir(tmp_path, scene, name="synthetic_scene_0"):
    """Materialize a GeneratedScene as a reference-format directory.

    The generated scene is world-scale (scale factor already applied), so
    the .obj gets coordinates divided back to reference units and
    settings.json uses Settings.to_dict(scene_scale_factor) — the exact
    inverse of the reference's load path.
    """
    d = tmp_path / name
    d.mkdir()
    save_obj(str(d / f"{name}.obj"), scene.verts / SCALE, scene.faces)
    with open(d / "settings.json", "w") as f:
        json.dump(scene.settings.to_dict(scene_scale_factor=SCALE), f)
    return str(d)


@pytest.fixture(scope="module")
def scene_and_dir(tmp_path_factory):
    scene = generate_scene("simple", seed=11, scene_scale_factor=SCALE)
    tmp = tmp_path_factory.mktemp("scene_dirs")
    return scene, _write_scene_dir(tmp, scene)


def test_load_scene_dir_matches_packed_original(scene_and_dir):
    scene, d = scene_and_dir
    params = default_params()
    assert float(params.scene_scale_factor) == SCALE
    loaded = load_scene_dir(d, params=params)
    packed = pack_generated_scene(scene, params=params)

    # Triangles: identical up to the .obj's 6-decimal text round trip
    # (reference-unit coords -> x10 world scale => atol 1e-5 * 10).
    assert loaded.n_tris == packed.n_tris
    np.testing.assert_allclose(loaded.tris[:loaded.n_tris],
                               packed.tris[:packed.n_tris], atol=2e-4)

    # Camera pose lattice derived from settings.json (Camera.__init__,
    # macarons_utils.py:2301,2316-2321).
    assert loaded.pose_l == packed.pose_l
    assert loaded.pose_h == packed.pose_h
    assert loaded.n_elev == packed.n_elev
    assert loaded.n_azim == packed.n_azim
    np.testing.assert_allclose(loaded.pose_origin, packed.pose_origin,
                               atol=1e-4)

    # Start pose: first row of settings.camera.start_positions
    # (testers/scene.py:410-488 starts from settings start positions).
    np.testing.assert_array_equal(loaded.start_cam_idx, packed.start_cam_idx)
    np.testing.assert_array_equal(
        loaded.start_cam_idx,
        scene.settings.camera.start_positions[0])

    # Scale factor applied to settings coordinates (SceneSettings/
    # CameraSettings multiply by scene_scale_factor, :2163-2172).
    np.testing.assert_allclose(loaded.settings.scene.x_min,
                               scene.settings.scene.x_min, atol=1e-4)
    np.testing.assert_allclose(loaded.settings.camera.x_max,
                               scene.settings.camera.x_max, atol=1e-4)

    # GT surface: same budget, confined to the gt bbox (bbox +- 0.2).
    assert loaded.gt_surface.shape == packed.gt_surface.shape
    lo = scene.settings.scene.x_min - 0.2 - 1e-3
    hi = scene.settings.scene.x_max + 0.2 + 1e-3
    assert np.all(loaded.gt_surface >= lo) and np.all(loaded.gt_surface <= hi)


def test_settings_json_roundtrip(scene_and_dir):
    """settings.json on disk carries REFERENCE units; Settings.load scales."""
    scene, d = scene_and_dir
    with open(os.path.join(d, "settings.json")) as f:
        raw = json.load(f)
    # Reference schema keys (macarons_utils.py:2152-2184).
    assert set(raw) == {"scene", "camera"}
    for k in ("x_min", "x_max", "grid_l", "grid_w", "grid_h",
              "cell_capacity", "cell_resolution"):
        assert k in raw["scene"], k
    for k in ("x_min", "x_max", "pose_l", "pose_w", "pose_h", "pose_n_theta",
              "pose_n_azim", "start_positions", "contrast_factor"):
        assert k in raw["camera"], k
    # Unscaled on disk; x10 after load.
    np.testing.assert_allclose(
        np.asarray(raw["scene"]["x_min"]) * SCALE,
        scene.settings.scene.x_min, atol=1e-4)
    s = Settings.load(os.path.join(d, "settings.json"),
                      scene_scale_factor=SCALE)
    np.testing.assert_allclose(s.camera.x_min, scene.settings.camera.x_min,
                               atol=1e-4)


def test_load_scene_dir_mirrored(scene_and_dir):
    """mirrored_axis negates vertex coordinates and swap-negates the boxes
    (load_scene_with_texture(mirror=True) + Camera/Scene __init__,
    macarons_utils.py:574-609, 2232-2237, 3066-3072)."""
    scene, d = scene_and_dir
    params = default_params()
    plain = load_scene_dir(d, params=params)
    mirrored = load_scene_dir(d, params=params, mirrored_axis=[0])

    n = plain.n_tris
    assert mirrored.n_tris == n
    np.testing.assert_allclose(mirrored.tris[:n, :, 0],
                               -plain.tris[:n, :, 0], atol=1e-5)
    np.testing.assert_allclose(mirrored.tris[:n, :, 1:],
                               plain.tris[:n, :, 1:], atol=1e-5)
    # Boxes swap-negate on the mirrored axis only.
    assert np.isclose(mirrored.settings.camera.x_min[0],
                      -plain.settings.camera.x_max[0])
    assert np.isclose(mirrored.settings.camera.x_max[0],
                      -plain.settings.camera.x_min[0])
    assert np.isclose(mirrored.settings.scene.x_min[0],
                      -plain.settings.scene.x_max[0])
    np.testing.assert_allclose(mirrored.settings.scene.x_min[1:],
                               plain.settings.scene.x_min[1:])
    # Pose lattice dims unchanged; origin follows the mirrored camera box.
    assert (mirrored.pose_l, mirrored.pose_h) == (plain.pose_l, plain.pose_h)
    assert np.isclose(mirrored.pose_origin[0],
                      mirrored.settings.camera.x_min[0])


def test_mirrored_scene_rollout_explores(scene_and_dir):
    """A mirrored scene must start from a VALID pose (the start index is
    remapped into the mirrored lattice, scene_assets._mirror_start_idx) and
    a short rollout must gain coverage — the guard for the --mirror
    training augmentation."""
    import jax
    import jax.numpy as jnp

    from nextbestpath_tpu.config import default_params
    from nextbestpath_tpu.eval.random_walk import ScanRandomWalk

    scene, _ = scene_and_dir
    params = default_params(
        image_height=32, image_width=56, points_per_frame=256,
        full_pc_capacity=32768, n_gt_surface_points=1024, max_path_len=32,
        pc2img_size=[64, 64], value_map_size=[16, 16],
    )
    plain = pack_generated_scene(scene, params=params)
    mirrored = pack_generated_scene(scene, params=params, mirrored_axis=[0])
    assert mirrored.name.endswith("_mirror0")
    # The mirrored start is the snapped mirror of the original start
    # position (within half a lattice step of the exact mirror).
    p = plain.pose_position(plain.start_cam_idx[0], plain.start_cam_idx[2])
    m = mirrored.pose_position(mirrored.start_cam_idx[0],
                               mirrored.start_cam_idx[2])
    assert abs(m[0] + p[0]) <= 1.5 + 1e-4
    np.testing.assert_allclose(m[2], p[2], atol=1e-4)

    rw = ScanRandomWalk([plain, mirrored], params=params)
    res = rw.run(n_poses=4, seed=3)
    for r in res:
        assert r.coverage_evolution[0] > 0.0  # start sees surface, not wall
        assert r.coverage_evolution[-1] > r.coverage_evolution[0]


@pytest.mark.slow
def test_cli_scene_dirs_rollout(tmp_path, monkeypatch):
    """The --scene-dirs CLI path runs a short rollout end to end on a
    reference-format directory and coverage rises above zero."""
    import importlib.util

    scene = generate_scene("simple", seed=11, scene_scale_factor=SCALE)
    d = _write_scene_dir(tmp_path, scene)
    out = tmp_path / "results.json"

    spec = importlib.util.spec_from_file_location(
        "cli_scene_dirs", os.path.join(REPO, "test_nbp_planning.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(sys, "argv", [
        "test_nbp_planning.py", "--scene-dirs", d, "--quick",
        "--poses", "3", "--out", str(out),
    ])
    monkeypatch.chdir(REPO)
    mod.main()
    results = json.loads(out.read_text())
    (res,) = results.values()
    assert len(res["coverage_evolution"]) >= 3
    assert res["coverage_evolution"][-1] > 0.0
    assert res["coverage_evolution"][-1] >= res["coverage_evolution"][0]
