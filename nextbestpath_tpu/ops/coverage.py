"""Coverage metrics over fixed-capacity point buffers.

Replaces the reference metrics (next_best_path/utility/long_term_utils.py):
- calculate_coverage_percentage (:457-468): fraction of GT points with a
  reconstructed point within threshold distance, reconstruction randomly
  subsampled to weight * len(GT) points,
- compute_auc (:488-490): trapezoid + half-first-sample, dx = 1/40.

The O(G*S) min-distance is evaluated as chunked MXU matmuls
(||a-b||^2 = ||a||^2 + ||b||^2 - 2ab) with forced f32 precision and centered
coordinates (bf16 or uncentered f32 would lose the ~1.0 threshold at scene
scales of ~1e2).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 3-pass bf16 (~f32-equivalent for the MXU): centered coords are O(1e2), so
# d^2 terms are O(1e4) and the 3-pass relative error (~5e-7) leaves ~5e-3
# absolute slack against the 1.0 threshold. HIGHEST (6-pass) doubles the MXU
# cost of the every-pose metric for no measurable metric change; plain bf16
# (DEFAULT) is NOT enough (~40 absolute error at 1e4).
_F32 = jax.lax.Precision.HIGH
_BIG = jnp.float32(1e30)


def subsample_buffer(key: jax.Array, count: jnp.ndarray, capacity: int,
                     n_sample: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Random subset (without replacement) of the valid prefix of a buffer.

    Returns (indices (n_sample,), valid (n_sample,)). When count <= n_sample
    every valid slot is selected exactly once (matching the reference's
    random_sample_pc which returns the full cloud when small,
    long_term_utils.py:434-443).
    """
    slots = jnp.arange(capacity)
    scores = jax.random.uniform(key, (capacity,))
    scores = jnp.where(slots < count, scores, 2.0)  # invalid slots last
    idx = jnp.argsort(scores)[:n_sample]
    valid = idx < count
    return idx, valid


@functools.partial(jax.jit, static_argnames=("chunk",))
def masked_min_dists(gt: jnp.ndarray, pts: jnp.ndarray, pts_valid: jnp.ndarray,
                     gt_valid: Optional[jnp.ndarray] = None,
                     chunk: int = 8192) -> jnp.ndarray:
    """Min Euclidean distance from each GT point to the valid pts. (G,).

    The centering mean MUST exclude padded GT rows (gt_valid): batched
    consumers pad GT clouds with 1e7 sentinel rows, and a sentinel-shifted
    center blows the d^2 terms up to ~1e8+, where the 3-pass bf16 relative
    error (~5e-7) swamps the 1.0-threshold comparison. Padded rows
    themselves are harmless (their d_min is huge and the caller masks them
    out of the final fraction)."""
    if gt_valid is None:
        center = jnp.mean(gt, axis=0)
    else:
        w = gt_valid.astype(gt.dtype)[:, None]
        center = jnp.sum(gt * w, axis=0) / jnp.maximum(jnp.sum(w), 1.0)
    g = gt - center
    p = pts - center
    g2 = jnp.sum(g * g, axis=-1)
    n_chunks = p.shape[0] // chunk
    assert n_chunks * chunk == p.shape[0], "pts length must be chunk-divisible"

    def body(carry, inp):
        best = carry
        pc, vc = inp
        p2 = jnp.sum(pc * pc, axis=-1)
        cross = jnp.matmul(g, pc.T, precision=_F32)
        d2 = g2[:, None] + p2[None, :] - 2.0 * cross
        d2 = jnp.where(vc[None, :], d2, _BIG)
        return jnp.minimum(best, jnp.min(d2, axis=-1)), None

    p_chunks = p.reshape(n_chunks, chunk, 3)
    v_chunks = pts_valid.reshape(n_chunks, chunk)
    best, _ = jax.lax.scan(body, jnp.full(g.shape[0], _BIG), (p_chunks, v_chunks))
    return jnp.sqrt(jnp.maximum(best, 0.0))


# ---------------------------------------------------------------------------
# Pallas running-min distance kernel.
#
# The jnp path above evaluates ||g - s||^2 through a K=3 "matmul" whose
# (G, chunk) f32 distance matrix round-trips HBM three times (3-pass bf16)
# before the min reduction — ~22 ms/pose at G~20k, S~40k on v5e, the single
# largest per-pose cost of the scan rollout. The kernel below keeps each
# (G_BLOCK, S_CHUNK) distance tile in VMEM and carries only the running
# per-row min, so HBM traffic collapses to reading g and s once. Direct
# squared differences in f32 on the VPU are also EXACT at scene magnitudes
# (no 3-pass trick needed): the kernel is both faster and more accurate
# than the jnp path.
# ---------------------------------------------------------------------------

_G_BLOCK = 512    # GT rows per program (sublanes)
_S_CHUNK = 1024   # sampled points per inner step (lanes)
_S_SENTINEL = 1e9  # invalid sampled slots are moved here (d^2 ~ 1e18 < inf)


def _min_dist_kernel(n_chunks_ref, g_ref, s_ref, out_ref):
    """One program: G_BLOCK GT rows vs all (valid-prefix) sample chunks."""
    gx = g_ref[:, 0:1]
    gy = g_ref[:, 1:2]
    gz = g_ref[:, 2:3]

    def body(c, best):
        base = c * _S_CHUNK
        sx = s_ref[0:1, pl.ds(base, _S_CHUNK)]
        sy = s_ref[1:2, pl.ds(base, _S_CHUNK)]
        sz = s_ref[2:3, pl.ds(base, _S_CHUNK)]
        dx = gx - sx
        dy = gy - sy
        dz = gz - sz
        d2 = dx * dx + dy * dy + dz * dz
        return jnp.minimum(best, jnp.min(d2, axis=1, keepdims=True))

    # Plain float literal: a jnp scalar would be captured as a kernel const.
    best = jax.lax.fori_loop(
        0, n_chunks_ref[0], body,
        jnp.full((_G_BLOCK, 1), 1e30, jnp.float32))
    out_ref[:, :] = best


@functools.partial(jax.jit, static_argnames=("interpret",))
def _min_dists_pallas(gt: jnp.ndarray, pts: jnp.ndarray,
                      pts_valid: jnp.ndarray, s_count: jnp.ndarray,
                      interpret: bool) -> jnp.ndarray:
    """Min ||gt_i - pts_j|| over valid pts, via the Pallas kernel. (G,).

    s_count: number of leading sample slots that can be valid (pass
    pts.shape[0] when validity is not a prefix); slots are sentinel-masked
    regardless, the count only bounds the loop trip.
    """
    G = gt.shape[0]
    S = pts.shape[0]
    g_pad = pl.cdiv(G, _G_BLOCK) * _G_BLOCK - G
    s_pad = pl.cdiv(S, _S_CHUNK) * _S_CHUNK - S
    g = gt.astype(jnp.float32)
    if g_pad:
        g = jnp.pad(g, ((0, g_pad), (0, 0)))
    s = jnp.where(pts_valid[:, None], pts, _S_SENTINEL).astype(jnp.float32).T
    if s_pad:
        s = jnp.pad(s, ((0, 0), (0, s_pad)), constant_values=_S_SENTINEL)
    n_chunks = jnp.asarray(
        [pl.cdiv(jnp.clip(s_count, 0, S), _S_CHUNK)], jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(pl.cdiv(G, _G_BLOCK),),
        in_specs=[
            pl.BlockSpec((_G_BLOCK, 3), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full (3, S) SoA
        ],
        out_specs=pl.BlockSpec((_G_BLOCK, 1), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    d2 = pl.pallas_call(
        _min_dist_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((g.shape[0], 1), jnp.float32),
        interpret=interpret,
    )(n_chunks, g, s)
    return jnp.sqrt(jnp.maximum(d2[:G, 0], 0.0))


def _use_kernel() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def min_dists(gt: jnp.ndarray, pts: jnp.ndarray, pts_valid: jnp.ndarray,
              gt_valid: Optional[jnp.ndarray] = None,
              s_count: Optional[jnp.ndarray] = None,
              chunk: int = 8192,
              use_kernel: Optional[bool] = None) -> jnp.ndarray:
    """Dispatching front end: Pallas kernel on TPU, jnp matmul path elsewhere.

    Semantically identical to masked_min_dists (the kernel is exact f32; the
    jnp path carries ~5e-7 relative error from the 3-pass bf16 matmul).
    s_count bounds the kernel's inner loop when validity is a prefix mask.

    gt_valid is NUMERICS-ONLY and only consumed by the jnp path (it centers
    the masked matmul); the exact-f32 kernel ignores it, so rows where
    gt_valid is False still get a real distance on TPU. Callers that mask
    invalid GT rows downstream (coverage_percentage does) are unaffected;
    any other caller must mask the output itself.
    """
    if use_kernel is None:
        use_kernel = _use_kernel()
    if use_kernel:
        sc = pts.shape[0] if s_count is None else s_count
        return _min_dists_pallas(gt, pts, pts_valid,
                                 jnp.asarray(sc, jnp.int32),
                                 interpret=not _use_kernel())
    return masked_min_dists(gt, pts, pts_valid, gt_valid=gt_valid,
                            chunk=chunk)


def stride_subsample(key: jax.Array, count: jnp.ndarray, capacity: int,
                     n_sample: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """O(n_sample) random-ish subset of the valid prefix: random start +
    large odd stride modulo count. Distinct indices whenever
    gcd(stride, count) == 1 (odd stride vs arbitrary count: usually), and
    uniform coverage of the prefix either way. Replaces the O(C log C)
    argsort of subsample_buffer inside the scan rollout, where C reaches
    2M per pose."""
    c = jnp.maximum(count, 1)
    start = jax.random.randint(key, (), 0, c)
    stride = 2 * jax.random.randint(jax.random.fold_in(key, 1), (), 1,
                                    jnp.maximum(c // 2, 2)) + 1
    idx = jnp.mod(start + stride * jnp.arange(n_sample), c)
    valid = jnp.arange(n_sample) < count
    return idx.astype(jnp.int32), valid


def coverage_percentage(gt: jnp.ndarray, pts: jnp.ndarray, count: jnp.ndarray,
                        key: jax.Array, threshold: float = 1.0,
                        weight: int = 2,
                        gt_valid: Optional[jnp.ndarray] = None,
                        fast_sampling: bool = False,
                        use_kernel: Optional[bool] = None) -> jnp.ndarray:
    """calculate_coverage_percentage over a fixed-capacity buffer.

    gt: (G, 3); pts: (C, 3) buffer with `count` valid rows. Returns a scalar
    in [0, 1]; 0 when count == 0 (reference behavior). fast_sampling swaps
    the exact random-permutation subsample for the O(n) stride scheme
    (statistically equivalent for the metric; used in the scan rollout).
    use_kernel: force/disable the Pallas min-dist kernel (default: TPU only).
    """
    g_count = gt.shape[0] if gt_valid is None else jnp.sum(gt_valid)
    raw = int(gt.shape[0]) * weight
    # Round up to a chunk multiple for the scan. Wide chunks keep the MXU
    # busy with few serial scan steps (the metric runs every pose); small
    # problems (or small buffers) fall back to narrow chunks.
    capacity = int(pts.shape[0])
    chunk = 8192 if (raw >= 8192 and capacity >= 8192) else 2048
    n_sample = ((raw + chunk - 1) // chunk) * chunk
    if n_sample > capacity:
        n_sample = max((capacity // chunk) * chunk, chunk)
    if fast_sampling:
        idx, valid = stride_subsample(key, count, pts.shape[0], n_sample)
    else:
        idx, valid = subsample_buffer(key, count, pts.shape[0], n_sample)
    sampled = pts[idx]
    # Both samplers place their valid slots in a leading prefix (the stride
    # scheme by construction; argsort sorts valid scores < 2.0 first), so
    # `count` bounds the kernel's inner loop.
    dmin = min_dists(gt, sampled, valid, gt_valid=gt_valid, s_count=count,
                     chunk=chunk, use_kernel=use_kernel)
    close = (dmin < threshold).astype(jnp.float32)
    if gt_valid is not None:
        close = close * gt_valid
    cov = jnp.sum(close) / jnp.maximum(g_count, 1)
    return jnp.where(count > 0, cov, 0.0)


def compute_auc(y: np.ndarray, dx: float = 1.0 / 40.0) -> float:
    """Trapezoid AUC + half-first-sample (long_term_utils.py:488-490)."""
    y = np.asarray(y, dtype=np.float64)
    trapezoid = getattr(np, "trapezoid", np.trapz)
    return float(trapezoid(y, dx=dx) + y[0] * dx / 2.0)


def pc_similarity(gt_pc: np.ndarray, full_pc: np.ndarray,
                  px_per_unit: float = 5.0) -> float:
    """Top-down binary-image recall of the reconstruction against the GT
    cloud (calculate_similarity_pcs, next_best_path/utility/utils.py
    :123-158): both clouds rasterize into an (x, z) grid sized from the GT
    bounds at ``px_per_unit`` pixels per world unit (the reference's
    hardcoded 5), and the score is |GT & recon| / |GT| pixels.

    Host-side numpy: the image size is data-dependent (GT bounds), and the
    metric is an offline diagnostic, not part of the per-pose loop.
    """
    gt_pc = np.asarray(gt_pc, np.float32)
    full_pc = np.asarray(full_pc, np.float32)
    if len(gt_pc) == 0:
        return 0.0
    x_min, x_max = float(gt_pc[:, 0].min()), float(gt_pc[:, 0].max())
    z_min, z_max = float(gt_pc[:, 2].min()), float(gt_pc[:, 2].max())
    W = max(int((x_max - x_min) * px_per_unit), 1)
    H = max(int((z_max - z_min) * px_per_unit), 1)

    def img(pc: np.ndarray) -> np.ndarray:
        out = np.zeros((H, W), np.uint8)
        if len(pc) == 0:
            return out
        x = np.rint((pc[:, 0] - x_min) / max(x_max - x_min, 1e-9)
                    * (W - 1)).astype(np.int64)
        z = np.rint((pc[:, 2] - z_min) / max(z_max - z_min, 1e-9)
                    * (H - 1)).astype(np.int64)
        out[z, x] = 1
        return out

    m = ((full_pc[:, 0] >= x_min) & (full_pc[:, 0] <= x_max)
         & (full_pc[:, 2] >= z_min) & (full_pc[:, 2] <= z_max))
    img_gt = img(gt_pc)
    img_rec = img(full_pc[m])
    total = int(img_gt.sum())
    return float((img_gt & img_rec).sum() / total) if total else 0.0
