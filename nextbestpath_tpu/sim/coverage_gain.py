"""Predicted coverage gain for candidate cameras over the proxy field.

Port of the coverage-gain prediction pair in the reference
(predict_coverage_gain_for_single_camera, macarons_utils.py:1909-2080, and
its mcts_ variant :1781-1907 — despite the name, the variant is the same
computation with occupancy-weighted proxy sampling): filter proxy points to
the candidate's fov, drop low-occupancy points, sample seq_len tokens
weighted by occupancy (sample_proxy_points, scone_utils.py:1029-1075),
normalize into the prediction box, run SconeVis, and weight the mean
visibility by the in-fov proxy volume (the sum of occupancy probabilities).

Fixed-shape version: fov filtering becomes a probability mask folded into
the occupancy-weighted categorical sample.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..geometry.cameras import CameraIntrinsics, get_camera_RT, points_in_fov_mask
from ..models.scone import coverage_gain
from ..ops.view_state import normalize_points_in_prediction_box


def sample_proxy_points(key: jax.Array, points: jnp.ndarray,
                        occ_probs: jnp.ndarray, weights_mask: jnp.ndarray,
                        n_sample: int, min_occ: float = 0.1,
                        use_occ_to_sample: bool = True):
    """Occupancy-weighted categorical sample of proxy tokens.

    Mirrors sample_proxy_points (scone_utils.py:1029-1075): multinomial over
    occupancy probabilities (cumsum + uniform draws), restricted to points
    with occ > min_occ and weights_mask.
    """
    w = occ_probs[:, 0] if use_occ_to_sample else jnp.ones(points.shape[0])
    w = jnp.where((occ_probs[:, 0] > min_occ) & weights_mask, w, 0.0)
    total = jnp.sum(w)
    probs = jnp.where(total > 0, w / jnp.maximum(total, 1e-12),
                      jnp.ones_like(w) / w.shape[0])
    idx = jax.random.categorical(
        key, jnp.log(jnp.maximum(probs, 1e-12)), shape=(n_sample,))
    return idx


@functools.partial(
    jax.jit,
    static_argnames=("scone_vis", "intr", "sensor_range", "seq_len",
                     "min_occ", "use_occ_to_sample"),
)
def predict_coverage_gain(
    key: jax.Array,
    scone_vis, vis_variables,
    proxy_points: jnp.ndarray,      # (P, 3)
    occ_probs: jnp.ndarray,         # (P, 1)
    view_harmonics: jnp.ndarray,    # (P, n_harmonics)
    candidate_pose5: jnp.ndarray,   # (C, 5) candidate camera poses
    intr: CameraIntrinsics,
    box_min: jnp.ndarray, box_max: jnp.ndarray,
    sensor_range: float = 70.0,
    seq_len: int = 2048,
    min_occ: float = 0.1,
    use_occ_to_sample: bool = True,
) -> jnp.ndarray:
    """(C,) predicted coverage gains, fov-volume weighted."""
    box_diag = jnp.linalg.norm(box_max - box_min)

    def per_candidate(k, pose5):
        R, T = get_camera_RT(pose5[None, :3], pose5[None, 3:])
        in_fov = points_in_fov_mask(proxy_points, R[0], T[0], intr,
                                    fov_range=sensor_range)
        fov_volume = jnp.sum(jnp.where(in_fov, occ_probs[:, 0], 0.0))
        idx = sample_proxy_points(k, proxy_points, occ_probs, in_fov,
                                  seq_len, min_occ, use_occ_to_sample)
        tokens = proxy_points[idx]
        occ = occ_probs[idx]
        vh = view_harmonics[idx]
        center = (jnp.max(tokens, axis=0) + jnp.min(tokens, axis=0)) / 2.0
        norm = lambda q: normalize_points_in_prediction_box(q, center, box_diag)
        pts4 = jnp.concatenate([norm(tokens), occ], axis=-1)[None]
        h = scone_vis.apply(vis_variables, pts4, view_harmonics=vh[None])
        cam = norm(pose5[None, :3])[None]
        gain = coverage_gain(pts4[..., :3], h, cam)[0, 0]
        has_any = jnp.sum(in_fov) > 0
        return jnp.where(has_any, gain * fov_volume, -1.0)

    keys = jax.random.split(key, candidate_pose5.shape[0])
    return jax.vmap(per_candidate)(keys, candidate_pose5)
