import numpy as np

from nextbestpath_tpu.utils.plotting import (
    export_blender_json,
    plot_coverage_curves,
    plot_point_cloud,
    plot_value_map,
)
from nextbestpath_tpu.utils.fastloader import FastArrayLoader


def test_plotting_and_export(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    plot_point_cloud(pts, str(tmp_path / "pc.png"))
    plot_value_map(rng.random((64, 64, 8)).astype(np.float32),
                   str(tmp_path / "vm.png"))
    plot_coverage_curves({"nbp": [0.1, 0.5, 0.8], "rw": [0.1, 0.3, 0.5]},
                         str(tmp_path / "cov.png"))
    export_blender_json(str(tmp_path), pts, pts[:10])
    for f in ("pc.png", "vm.png", "cov.png", "point_cloud.json",
              "trajectory.json"):
        assert (tmp_path / f).exists()


def test_blender_export_schema(tmp_path):
    """The export matches what vis_blender/render_results.py (and the
    reference's blender_scripts.py:9-34) reads: points+colors in
    point_cloud.json, scene->start->X_cam_history in trajectory.json."""
    import json

    rng = np.random.default_rng(1)
    pts = rng.normal(size=(64, 3)).astype(np.float32)
    traj = rng.normal(size=(12, 3)).astype(np.float32)
    export_blender_json(str(tmp_path), pts, traj, scene_name="scene_a",
                        start_index=2)
    with open(tmp_path / "point_cloud.json") as f:
        pc = json.load(f)
    assert set(pc) == {"points", "colors"}
    assert len(pc["points"]) == len(pc["colors"]) == 64
    np.testing.assert_allclose(pc["colors"][0], [0.8, 0.8, 0.8],
                               atol=1e-6)  # simulator gray default
    with open(tmp_path / "trajectory.json") as f:
        t = json.load(f)
    assert list(t) == ["scene_a"]
    assert list(t["scene_a"]) == ["2"]
    hist = t["scene_a"]["2"]["X_cam_history"]
    assert len(hist) == 12 and len(hist[0]) == 3


def test_blender_script_is_dependency_free():
    """vis_blender/render_results.py must parse and import only stdlib +
    Blender built-ins (the reference script needs a third-party addon; ours
    must not)."""
    import ast
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "vis_blender",
                        "render_results.py")
    tree = ast.parse(open(path).read())
    allowed = {"argparse", "json", "os", "sys", "bpy", "mathutils"}
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                assert a.name.split(".")[0] in allowed, a.name
        elif isinstance(node, ast.ImportFrom):
            assert node.module.split(".")[0] in allowed, node.module


def test_fast_array_loader():
    a = np.arange(10)
    b = np.arange(10) * 2
    loader = FastArrayLoader(a, b, batch_size=4, shuffle=True, seed=0)
    batches = list(loader)
    assert len(batches) == 3
    got_a = np.concatenate([x for x, _ in batches])
    got_b = np.concatenate([y for _, y in batches])
    assert sorted(got_a.tolist()) == list(range(10))
    np.testing.assert_array_equal(got_b, got_a * 2)
