"""Parity of the Pallas running-min distance kernel vs the jnp matmul path.

The kernel (ops/coverage.py `_min_dists_pallas`) replaces the HBM-bound
K=3 matmul evaluation of the every-pose coverage metric
(calculate_coverage_percentage, long_term_utils.py:457-468). It must agree
with `masked_min_dists` on all the edge cases the scan rollout produces:
sentinel-padded GT rows, prefix validity, tiny/zero counts, and non-aligned
sizes.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nextbestpath_tpu.ops.coverage import (
    coverage_percentage,
    masked_min_dists,
    min_dists,
    stride_subsample,
)


def _rand_clouds(key, G=700, S=2048, scale=100.0):
    kg, ks = jax.random.split(key)
    gt = jax.random.uniform(kg, (G, 3), minval=-scale, maxval=scale)
    pts = jax.random.uniform(ks, (S, 3), minval=-scale, maxval=scale)
    return gt, pts


@pytest.mark.parametrize("count", [0, 1, 17, 1000, 2048])
def test_kernel_matches_jnp_prefix_counts(count):
    gt, pts = _rand_clouds(jax.random.PRNGKey(3))
    valid = jnp.arange(pts.shape[0]) < count
    ref = masked_min_dists(gt, pts, valid, chunk=2048)
    got = min_dists(gt, pts, valid, s_count=jnp.int32(count),
                    use_kernel=True)
    if count == 0:
        # Both paths return "huge" for empty clouds; the caller masks on
        # count > 0 — only check hugeness, the sentinels differ.
        assert float(jnp.min(got)) > 1e6 and float(jnp.min(ref)) > 1e6
    else:
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-3)


def test_kernel_matches_jnp_padded_gt():
    gt, pts = _rand_clouds(jax.random.PRNGKey(5), G=600, S=1024)
    gt_pad = jnp.concatenate(
        [gt, jnp.full((123, 3), 1e7, jnp.float32)], axis=0)
    gt_valid = jnp.arange(gt_pad.shape[0]) < gt.shape[0]
    valid = jnp.ones(pts.shape[0], bool)
    ref = masked_min_dists(gt_pad, pts, valid, gt_valid=gt_valid, chunk=1024)
    got = min_dists(gt_pad, pts, valid, gt_valid=gt_valid, use_kernel=True)
    # Compare only the real rows (sentinel rows are huge in both paths).
    np.testing.assert_allclose(np.asarray(got[:600]), np.asarray(ref[:600]),
                               rtol=2e-4, atol=2e-3)


def test_kernel_handles_nonaligned_sizes():
    # G not a multiple of the 512-row block, S not of the 1024-lane chunk.
    gt, pts = _rand_clouds(jax.random.PRNGKey(7), G=517, S=1100)
    valid = jnp.arange(pts.shape[0]) < 1100
    ref = masked_min_dists(gt, jnp.pad(pts, ((0, 948), (0, 0))),
                           jnp.arange(2048) < 1100, chunk=2048)
    got = min_dists(gt, pts, valid, s_count=jnp.int32(1100), use_kernel=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-3)


def test_coverage_percentage_kernel_vs_jnp():
    key = jax.random.PRNGKey(11)
    gt, _ = _rand_clouds(key, G=1500, S=1)
    # Reconstruction = GT + noise, in a padded buffer.
    noise = 0.3 * jax.random.normal(jax.random.fold_in(key, 1), gt.shape)
    buf = jnp.zeros((8192, 3), jnp.float32).at[:1500].set(gt + noise)
    count = jnp.int32(1500)
    cov_ref = float(coverage_percentage(gt, buf, count, key,
                                        fast_sampling=True, use_kernel=False))
    cov_ker = float(coverage_percentage(gt, buf, count, key,
                                        fast_sampling=True, use_kernel=True))
    assert cov_ref > 0.5
    # Same subsample stream -> same sampled set; only the distance backend
    # differs (exact f32 vs 3-pass bf16), so the covered fractions must
    # agree to well under one GT point.
    assert abs(cov_ref - cov_ker) < 1.5 / 1500


def test_kernel_inside_jit_and_scan():
    # The metric runs inside the jitted lax.scan step — make sure the
    # pallas_call traces and executes under both.
    gt, pts = _rand_clouds(jax.random.PRNGKey(13), G=256, S=1024)
    valid = jnp.ones(1024, bool)

    @jax.jit
    def f(g, p):
        def body(carry, _):
            d = min_dists(g, p, valid, s_count=jnp.int32(1024),
                          use_kernel=True)
            return carry + jnp.min(d), None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(3))
        return out

    ref = masked_min_dists(gt, pts, valid, chunk=1024)
    # The jnp reference itself carries ~5e-4 relative error (3-pass bf16
    # matmul); the kernel is exact f32.
    np.testing.assert_allclose(float(f(gt, pts)), 3 * float(jnp.min(ref)),
                               rtol=2e-3, atol=1e-3)


def test_stride_subsample_valid_is_prefix():
    # coverage_percentage passes s_count=count to the kernel on the claim
    # that sampler validity is a prefix mask — pin that invariant.
    idx, valid = stride_subsample(jax.random.PRNGKey(0), jnp.int32(700),
                                  4096, 2048)
    v = np.asarray(valid)
    first_invalid = int(np.argmin(v)) if not v.all() else len(v)
    assert v[:first_invalid].all() and not v[first_invalid:].any()
    assert (np.asarray(idx)[v] < 700).all()
