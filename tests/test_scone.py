import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nextbestpath_tpu.models import (
    SconeOcc,
    SconeVis,
    base_view_harmonics,
    coverage_gain,
    harmonics_up_to_rank,
)
from nextbestpath_tpu.ops import (
    compute_view_harmonics,
    compute_view_state,
    knn_points,
)


def test_harmonics_orthonormality():
    """Real SH sampled on a fine sphere grid must be near-orthonormal under
    the sin(theta) quadrature — catches normalization/recursion errors."""
    n_t, n_p = 64, 128
    theta = jnp.linspace(0, np.pi, n_t + 2)[1:-1]
    phi = jnp.linspace(-np.pi, np.pi, n_p, endpoint=False)
    tt, pp = jnp.meshgrid(theta, phi, indexing="ij")
    Y = np.asarray(harmonics_up_to_rank(4, tt.ravel(), pp.ravel()))  # (N, 16)
    w = np.asarray(jnp.sin(tt).ravel()) * (np.pi / (n_t + 1)) * (2 * np.pi / n_p)
    gram = (Y * w[:, None]).T @ Y
    np.testing.assert_allclose(gram, np.eye(16), atol=2e-2)


def test_knn_matches_numpy():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(2, 17, 3)).astype(np.float32)
    p = rng.normal(size=(2, 40, 3)).astype(np.float32)
    nbrs, idx = knn_points(jnp.asarray(q), jnp.asarray(p), 5)
    idx = np.asarray(idx)
    for b in range(2):
        d = np.linalg.norm(q[b][:, None] - p[b][None], axis=-1)
        want = np.argsort(d, axis=-1)[:, :5]
        got_d = np.take_along_axis(d, idx[b], axis=-1)
        want_d = np.take_along_axis(d, want, axis=-1)
        np.testing.assert_allclose(np.sort(got_d), np.sort(want_d), atol=1e-5)


def test_view_state_marks_directions():
    # One point at origin, one camera along +z: view state has exactly the
    # cell of (elev=0, azim=0) set.
    pts = jnp.zeros((1, 1, 3))
    X_view = jnp.asarray([[0.0, 0.0, 10.0]])
    vs = np.asarray(compute_view_state(pts, X_view, 7, 14))[0, 0]
    assert vs.sum() == 1.0
    idx = int(np.argmax(vs))
    i_elev, i_azim = divmod(idx, 14)
    assert i_elev == 3  # middle elevation row (elev 0)
    assert i_azim == 0  # azim 0


def test_view_harmonics_shape():
    base_h, h_polar = base_view_harmonics(7, 14, 8)
    assert base_h.shape == (64, 98)
    vs = jnp.ones((2, 5, 98))
    vh = compute_view_harmonics(vs, base_h, h_polar, 7, 14)
    assert vh.shape == (2, 5, 64)
    # Constant view state ~ projects mainly onto the constant harmonic Y00.
    vh0 = np.asarray(vh)[0, 0]
    assert abs(vh0[0]) > np.abs(vh0[1:]).max()


@pytest.mark.slow
def test_scone_models_forward():
    occ = SconeOcc(seq_len=64, n_scale=2, k_for_knn=4,
                   pts_embedding_dim=32, global_feature_dim=64,
                   local_feature_dim=32, x_embedding_dim=64)
    pc = jnp.zeros((1, 64, 3))
    x = jnp.zeros((1, 8, 3))
    vh = jnp.zeros((1, 8, 64))
    v = occ.init(jax.random.PRNGKey(0), pc, x, vh, key=jax.random.PRNGKey(1))
    out = occ.apply(v, pc, x, vh, key=jax.random.PRNGKey(1))
    assert out.shape == (1, 8, 1)

    vis = SconeVis(pts_embedding_dim=64)
    pts = jnp.zeros((1, 16, 4))
    vh2 = jnp.zeros((1, 16, 64))
    v2 = vis.init(jax.random.PRNGKey(0), pts, view_harmonics=vh2)
    h = vis.apply(v2, pts, view_harmonics=vh2)
    assert h.shape == (1, 16, 64)
    X_cam = jnp.asarray([[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]])
    g = coverage_gain(pts[..., :3], h, X_cam)
    assert g.shape == (1, 2)
    assert bool(jnp.all((g >= 0) & (g <= 1)))


def test_coverage_gain_fov_mask_distinguishes_orientation():
    """Candidates sharing one position but facing opposite directions must
    get different gains when the frustum mask is applied (the reference
    sums visibility over FOV proxy points; without the mask all rotations
    tie and NBV degenerates to a fixed rotation offset)."""
    import numpy as np

    from nextbestpath_tpu.geometry import CameraIntrinsics, get_camera_RT
    from nextbestpath_tpu.geometry.cameras import points_in_fov_mask
    from nextbestpath_tpu.models.scone import coverage_gain

    intr = CameraIntrinsics(image_height=16, image_width=24)
    rng = np.random.default_rng(0)
    # All points on the +z side of the camera at the origin.
    pts = jnp.asarray(rng.uniform(-3, 3, (64, 3)).astype(np.float32)
                      + np.array([0, 0, 10], np.float32))
    harm = jnp.asarray(rng.normal(size=(1, 64, 64)).astype(np.float32))
    eye = jnp.zeros((2, 3))
    # Same position; azimuth 0 vs 180.
    V = jnp.asarray([[0.0, 0.0], [0.0, 180.0]])
    R, T = get_camera_RT(eye, V)
    fov = jnp.stack([
        points_in_fov_mask(pts, R[i], T[i], intr, fov_range=70.0)
        for i in range(2)
    ]).astype(jnp.float32)
    # One orientation sees (almost) all points, the other none.
    assert float(fov[0].sum()) != float(fov[1].sum())

    gains = coverage_gain(pts[None], harm, jnp.zeros((1, 2, 3)),
                          fov_mask=fov[None])
    g_plain = coverage_gain(pts[None], harm, jnp.zeros((1, 2, 3)))
    # Unmasked gains tie across orientations (same position)...
    assert abs(float(g_plain[0, 0] - g_plain[0, 1])) < 1e-6
    # ...masked gains do not.
    assert abs(float(gains[0, 0] - gains[0, 1])) > 1e-4
