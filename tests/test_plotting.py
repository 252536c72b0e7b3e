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
