"""Segment-vs-point-cloud collision predicates.

The reference tests planned moves against accumulated geometry two ways
(next_best_path/utility/long_term_utils.py):

- ``line_segment_intersects_point_cloud_region`` (:651-685): the minimum
  distance from any reconstructed point to the move segment is below 0.2,
- ``predict_collision_with_occupancy_field`` (:593-649): at least 5 points
  within ``threshold_distance`` of the segment carry occupancy probability
  above 0.9.

Both reduce to one vectorized point-to-segment distance over a fixed-capacity
masked buffer; each predicate is a single jittable reduction (no host loop).
The legacy bidirectional planner (planning/bidirectional.py) consumes the
first; the second supports occupancy-field-based planning modes.
"""

from __future__ import annotations

import jax.numpy as jnp


def segment_point_distances(points: jnp.ndarray, a: jnp.ndarray,
                            b: jnp.ndarray) -> jnp.ndarray:
    """Distance from each point (N, 3) to segment a-b (3,).

    Matches the reference's piecewise form (long_term_utils.py:660-680):
    points whose projection parameter lies in [0, 1] use the perpendicular
    distance, others the nearer endpoint distance. Degenerate segments
    (|b - a| ~ 0) fall back to plain distance-to-a.
    """
    line = b - a
    len_sq = jnp.maximum(jnp.sum(line * line), 1e-12)
    to_a = points - a
    t = jnp.sum(to_a * line, axis=-1) / len_sq
    closest = a + t[:, None] * line
    d_perp = jnp.linalg.norm(points - closest, axis=-1)
    d_ends = jnp.minimum(jnp.linalg.norm(to_a, axis=-1),
                         jnp.linalg.norm(points - b, axis=-1))
    return jnp.where((t >= 0.0) & (t <= 1.0), d_perp, d_ends)


def segment_intersects_point_cloud(points: jnp.ndarray, valid: jnp.ndarray,
                                   a: jnp.ndarray, b: jnp.ndarray,
                                   threshold: float = 0.2) -> jnp.ndarray:
    """True when any valid point lies within ``threshold`` of segment a-b
    (line_segment_intersects_point_cloud_region, long_term_utils.py:651-685;
    the reference's fixed 0.2 world-unit threshold is the default)."""
    d = segment_point_distances(points, a, b)
    return jnp.any(valid & (d < threshold))


def collision_with_occupancy_field(points: jnp.ndarray,
                                   occ_probs: jnp.ndarray,
                                   valid: jnp.ndarray,
                                   a: jnp.ndarray, b: jnp.ndarray,
                                   threshold_distance: float = 1.0,
                                   prob_threshold: float = 0.9,
                                   min_count: int = 5) -> jnp.ndarray:
    """True when >= ``min_count`` valid points within ``threshold_distance``
    of the segment have occupancy probability > ``prob_threshold``
    (predict_collision_with_occupancy_field, long_term_utils.py:593-649;
    defaults are the reference's constants)."""
    d = segment_point_distances(points, a, b)
    close = valid & (d < threshold_distance)
    hits = jnp.sum(close & (occ_probs.reshape(-1) > prob_threshold))
    return hits >= min_count
