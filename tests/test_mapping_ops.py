import jax
import jax.numpy as jnp
import numpy as np

from nextbestpath_tpu.ops import (
    binned_count_imgs,
    bucketize_bins,
    compute_auc,
    count_img,
    coverage_percentage,
    ego2d,
    height_bins,
    img_coords,
)
from nextbestpath_tpu.ops.obstacle_map import (
    plane_section_segments,
    rasterize_segments,
)


def _torch_reference_scatter(points, cam, grid_size, grid_range):
    """Numpy re-statement of transform_points_to_n_pieces +
    map_points_to_n_imgs (next_best_path/utility/utils.py:166-223)."""
    d = points - cam
    p2 = np.stack([-d[:, 2], -d[:, 0]], axis=-1)
    lo, hi = grid_range
    scale = grid_size / (hi - lo)
    xm = np.round((p2[:, 0] - lo) * scale).astype(np.int64)
    ym = np.round((p2[:, 1] - lo) * scale).astype(np.int64)
    ok = (xm >= 0) & (xm < grid_size) & (ym >= 0) & (ym < grid_size)
    img = np.zeros((grid_size, grid_size), np.float32)
    np.add.at(img, (xm[ok], ym[ok]), 1.0)
    return img


def test_scatter_matches_reference():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-60, 60, size=(5000, 3)).astype(np.float32)
    cam = np.array([5.0, 3.3, -2.0], np.float32)
    ref = _torch_reference_scatter(pts, cam, 256, (-40.0, 40.0))
    ours = np.asarray(
        count_img(jnp.asarray(pts), jnp.ones(5000, bool), jnp.asarray(cam),
                  256, (-40.0, 40.0))
    )
    np.testing.assert_array_equal(ours, ref)


def test_scatter_respects_validity():
    pts = jnp.zeros((10, 3))
    cam = jnp.zeros(3)
    valid = jnp.arange(10) < 4
    img = np.asarray(count_img(pts, valid, cam, 64, (-40.0, 40.0)))
    assert img.sum() == 4


def test_bucketize_matches_torch_semantics():
    import torch

    y_bins = np.array([0.5, 2.5, 4.5, 6.5, 8.5], np.float32)
    y = np.array([-1.0, 0.5, 0.6, 2.5, 2.6, 8.4, 9.0], np.float32)
    want = (torch.bucketize(torch.from_numpy(y), torch.from_numpy(y_bins[:-1])) - 1).numpy()
    got = np.asarray(bucketize_bins(jnp.asarray(y), jnp.asarray(y_bins)))
    np.testing.assert_array_equal(got, want)


def test_binned_imgs_equal_reference_loop():
    rng = np.random.default_rng(1)
    pts = rng.uniform(-30, 30, size=(3000, 3)).astype(np.float32)
    pts[:, 1] = rng.uniform(0.0, 9.0, size=3000)
    cam = np.array([0.0, 3.3, 0.0], np.float32)
    y_bins = np.asarray(height_bins(jnp.float32(0.0), jnp.float32(9.0), 4))
    ours = np.asarray(
        binned_count_imgs(jnp.asarray(pts), jnp.ones(3000, bool),
                          jnp.asarray(cam), jnp.asarray(y_bins), 4, 128,
                          (-40.0, 40.0))
    )
    # Reference loop: bucketize then per-bin scatter.
    bins = np.searchsorted(y_bins[:-1], pts[:, 1], side="left") - 1
    for i in range(4):
        ref_i = _torch_reference_scatter(pts[bins == i], cam, 128, (-40.0, 40.0))
        np.testing.assert_array_equal(ours[i], ref_i)


def test_count_bounded_scatter_matches_direct():
    """Chunked while_loop scatter (count-bounded) is exact vs the direct
    scatter for a prefix-compacted buffer, including partial last chunks."""
    from nextbestpath_tpu.ops.scatter2d import _count_bounded_add

    rng = np.random.default_rng(7)
    n, size = 1000, 32
    ij = rng.integers(0, size, size=(2, n)).astype(np.int32)
    for cnt in (0, 1, 17, 999, 1000):
        ok = np.arange(n) < cnt
        direct = np.zeros((size, size), np.float32)
        np.add.at(direct, (ij[0][ok], ij[1][ok]), 1.0)
        got = np.asarray(_count_bounded_add(
            jnp.zeros((size, size), jnp.float32),
            [jnp.asarray(ij[0]), jnp.asarray(ij[1])],
            jnp.asarray(ok), jnp.int32(cnt), chunk=64))
        np.testing.assert_array_equal(got, direct)


def test_binned_imgs_count_kwarg_equivalence():
    rng = np.random.default_rng(3)
    pts = rng.uniform(-30, 30, size=(640, 3)).astype(np.float32)
    pts[:, 1] = rng.uniform(0.0, 9.0, size=640)
    cam = np.array([0.0, 3.3, 0.0], np.float32)
    y_bins = jnp.asarray(height_bins(jnp.float32(0.0), jnp.float32(9.0), 4))
    cnt = 500
    valid = jnp.arange(640) < cnt
    a = binned_count_imgs(jnp.asarray(pts), valid, jnp.asarray(cam), y_bins,
                          4, 64, (-40.0, 40.0))
    b = binned_count_imgs(jnp.asarray(pts), valid, jnp.asarray(cam), y_bins,
                          4, 64, (-40.0, 40.0), count=jnp.int32(cnt))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_coverage_percentage_basics():
    key = jax.random.PRNGKey(0)
    # Well-separated GT points (spacing 4 > threshold 1 + shift margins) so
    # shifted copies can't accidentally cover a *different* GT point.
    g = np.stack(np.meshgrid(*[np.arange(8) * 40.0] * 3), axis=-1).reshape(-1, 3)
    gt = jnp.asarray(g[:512], jnp.float32)
    buf = jnp.zeros((4096, 3), jnp.float32)
    # Empty buffer -> 0.
    cov0 = float(coverage_percentage(gt, buf, jnp.int32(0), key))
    assert cov0 == 0.0
    # Buffer == GT -> 1.
    buf = buf.at[:512].set(gt)
    cov1 = float(coverage_percentage(gt, buf, jnp.int32(512), key))
    assert cov1 == 1.0
    # Buffer shifted by 2 (> threshold 1) -> 0.
    buf2 = buf.at[:512].set(gt + 2.0)
    cov2 = float(coverage_percentage(gt, buf2, jnp.int32(512), key))
    assert cov2 == 0.0
    # Half coverage.
    buf3 = buf.at[:256].set(gt[:256]).at[256:512].set(gt[256:] + 5.0)
    cov3 = float(coverage_percentage(gt, buf3, jnp.int32(512), key))
    assert abs(cov3 - 0.5) < 1e-6


def test_compute_auc_matches_reference_formula():
    y = [0.1, 0.5, 0.9]
    want = getattr(np, "trapezoid", np.trapz)(y, dx=1 / 40) + y[0] * (1 / 40) / 2
    assert abs(compute_auc(y) - want) < 1e-12


def test_plane_section_and_raster():
    # One wall: a vertical quad from (0,0,5)-(10,9,5); plane y=3 cuts it in a
    # segment x in [0,10] at z=5.
    tris = jnp.asarray(
        [
            [[0.0, 0.0, 5.0], [10.0, 0.0, 5.0], [10.0, 9.0, 5.0]],
            [[0.0, 0.0, 5.0], [10.0, 9.0, 5.0], [0.0, 9.0, 5.0]],
        ]
    )
    seg, valid = plane_section_segments(tris, 2, jnp.float32(3.0))
    assert bool(valid.all())
    seg = np.asarray(seg)
    assert np.allclose(seg[:, :, 1], 5.0, atol=1e-5)  # z = 5 everywhere
    img = np.asarray(
        rasterize_segments(jnp.asarray(seg), valid, jnp.float32(5.0),
                           jnp.float32(0.0), grid_size=256,
                           grid_range=(-40.0, 40.0))
    )
    # Segment row: -(z-cz) = -5 -> row = round((-5+40)*3.2) = 112
    assert img[112].sum() > 20  # a horizontal line of pixels
    assert img.sum() == img[112].sum()  # only that row


def test_mirror_scene_flips_geometry():
    from nextbestpath_tpu.assets import generate_scene, pack_generated_scene
    from nextbestpath_tpu.assets.scene_assets import mirror_scene, pack_scene

    scn = generate_scene("simple", seed=3)
    v2, s2 = mirror_scene(scn.verts, scn.settings, [0])
    assert (v2[:, 0] == -scn.verts[:, 0]).all()
    assert (v2[:, 1:] == scn.verts[:, 1:]).all()
    assert s2.camera.x_min[0] == -scn.settings.camera.x_max[0]
    assert s2.camera.x_max[0] == -scn.settings.camera.x_min[0]
    # Packing a mirrored scene keeps a sane GT pc inside the flipped bbox.
    assets = pack_scene(scn.verts, scn.faces, scn.settings,
                        scn.start_cam_idx, mirrored_axis=[0])
    gx = assets.gt_surface[:, 0]
    assert gx.min() >= s2.scene.x_min[0] - 0.5
    assert gx.max() <= s2.scene.x_max[0] + 0.5


def test_coverage_padded_gt_matches_unpadded():
    """Batched consumers pad GT clouds with 1e7 sentinel rows + a gt_valid
    mask (scan_rollout._pad_scene_arrays, ScanCollection.__init__).
    Regression: the centering mean inside masked_min_dists must exclude the
    sentinel rows — a sentinel-shifted center inflates the d^2 terms until
    the Precision.HIGH matmul loses the 1.0 threshold entirely."""
    rng = np.random.default_rng(3)
    gt = jnp.asarray(rng.uniform(0.0, 150.0, (1900, 3)), jnp.float32)
    # Reconstruction: jittered copy of 60% of GT (well inside threshold 1).
    rec = np.asarray(gt[:1140]) + rng.uniform(-0.2, 0.2, (1140, 3))
    buf = jnp.zeros((4096, 3), jnp.float32).at[:1140].set(
        jnp.asarray(rec, jnp.float32))
    key = jax.random.PRNGKey(1)

    cov_ref = float(coverage_percentage(gt, buf, jnp.int32(1140), key))

    # Same GT padded to 2048 rows with the 1e7 sentinel (7% pad).
    gt_pad = jnp.concatenate(
        [gt, jnp.full((148, 3), 1e7, jnp.float32)])
    gt_valid = jnp.arange(2048) < 1900
    cov_pad = float(coverage_percentage(gt_pad, buf, jnp.int32(1140), key,
                                        gt_valid=gt_valid))
    assert abs(cov_pad - cov_ref) < 5e-3, (cov_pad, cov_ref)


def test_rasterize_long_segment_solid_after_clip():
    """Regression: a wall chord far longer than the visible window must
    still draw a SOLID line inside the window. Without Liang-Barsky
    clipping, the MAX_STEPS budget was spread over the full off-screen
    extent, leaving >= 2 px gaps (a dotted training target)."""
    from nextbestpath_tpu.ops.obstacle_map import rasterize_segments

    # Horizontal wall spanning x in [-500, 500] at z = 5 (camera at origin,
    # window = 80 world units -> on-screen extent 256 px, full chord would
    # be 3200 px >> MAX_STEPS 384).
    seg = jnp.asarray([[[-500.0, 5.0], [500.0, 5.0]]])
    img = np.asarray(rasterize_segments(
        seg, jnp.asarray([True]), jnp.float32(0.0), jnp.float32(0.0),
        grid_size=256, grid_range=(-40.0, 40.0)))
    row = int(np.round((-(5.0) - (-40.0)) * 256 / 80.0))
    assert img[row].sum() == 256, img[row].sum()  # every column hit

    # Fully off-screen segment draws nothing.
    seg2 = jnp.asarray([[[-500.0, 200.0], [500.0, 200.0]]])
    img2 = np.asarray(rasterize_segments(
        seg2, jnp.asarray([True]), jnp.float32(0.0), jnp.float32(0.0),
        grid_size=256, grid_range=(-40.0, 40.0)))
    assert img2.sum() == 0.0

    # SoA plane-section variant matches the dense one.
    from nextbestpath_tpu.ops.obstacle_map import (
        plane_section_segments,
        plane_section_segments_soa,
    )
    from nextbestpath_tpu.ops.raytrace import tris_to_soa

    rng = np.random.default_rng(5)
    tris = jnp.asarray(rng.normal(scale=10.0, size=(32, 3, 3)),
                       jnp.float32)
    s_a, v_a = plane_section_segments(tris, 32, jnp.float32(0.3))
    s_b, v_b = plane_section_segments_soa(tris_to_soa(tris), 32,
                                          jnp.float32(0.3))
    np.testing.assert_array_equal(np.asarray(v_a), np.asarray(v_b))
    np.testing.assert_allclose(np.asarray(s_a)[np.asarray(v_a)],
                               np.asarray(s_b)[np.asarray(v_b)], atol=1e-4)
