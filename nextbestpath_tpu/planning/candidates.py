"""Vectorized candidate-goal scoring.

Replaces the reference's per-candidate Python loop over the whole pose space
(nbp_planning.py:203-233 for testing, nbp_utils.py:701-723 for training):
all lattice positions are scored in one fused program.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.scatter2d import ego2d, img_coords

NEG = -1e30


def _project_lattice(positions: jnp.ndarray, cam_xyz: jnp.ndarray,
                     grid_size: int, grid_range: Tuple[float, float]):
    L, H = positions.shape[:2]
    p2 = ego2d(positions.reshape(-1, 3), cam_xyz)
    pix = img_coords(p2, grid_size, grid_range).reshape(L, H, 2)
    in_img = (
        (pix[..., 0] >= 0) & (pix[..., 0] < grid_size)
        & (pix[..., 1] >= 0) & (pix[..., 1] < grid_size)
    )
    return jnp.clip(pix, 0, grid_size - 1), in_img


def region_has_observation(proj256: jnp.ndarray, size: int = 10) -> jnp.ndarray:
    """(S, S) bool: any pixel == 1 within a (2*size+1)^2 box.

    Vectorized check_pixel_values (macarons_utils.py:86-100).
    """
    ones = (proj256 == 1.0).astype(jnp.float32)
    k = 2 * size + 1
    window = jax.lax.reduce_window(
        ones, 0.0, jax.lax.max, (k, k), (1, 1), "SAME"
    )
    return window > 0.0


@functools.partial(jax.jit, static_argnames=("value_map_size", "layout_size"))
def score_candidates_test(
    positions: jnp.ndarray,       # (L, H, 3) lattice world positions
    cam_xyz: jnp.ndarray,         # (3,)
    value_map: jnp.ndarray,       # (S, S, 8) NHWC value prediction
    proj256: jnp.ndarray,         # (256, 256) clamped full-pc projection
    banned_positions: jnp.ndarray,  # (L, H) bool (collision_list positions)
    value_map_size: int = 64,
    layout_size: int = 256,
    grid_range: Tuple[float, float] = (-40.0, 40.0),
) -> jnp.ndarray:
    """(L, H) candidate scores; NEG where inadmissible.

    score = max-over-orientations value - 10 * pc-density penalty, admissible
    only if the 64-map pixel is in bounds and the 256-map region around the
    candidate contains an observed pixel (nbp_planning.py:203-233).
    """
    pix64, in64 = _project_lattice(positions, cam_xyz, value_map_size, grid_range)
    pix256, in256 = _project_lattice(positions, cam_xyz, layout_size, grid_range)

    max_gain = jnp.max(value_map, axis=-1)  # (S, S)
    value = max_gain[pix64[..., 0], pix64[..., 1]]
    sel = proj256[pix256[..., 0], pix256[..., 1]]
    near_obs = region_has_observation(proj256)[pix256[..., 0], pix256[..., 1]]

    # Documented deviation: the reference bounds-checks only the 64-map
    # pixel and lets torch's negative-index WRAPAROUND score candidates
    # whose 256-map pixel is -1/-2 (rows 254/255) — an accident of indexing
    # near the -40 grid edge (nbp_planning.py:213-224). We require the
    # 256-map pixel in bounds instead, so those edge candidates are
    # inadmissible rather than scored against the wrong side of the grid.
    ok = in64 & in256 & near_obs & (~banned_positions)
    return jnp.where(ok, value - 10.0 * sel, NEG)


@functools.partial(jax.jit, static_argnames=("value_map_size",))
def score_candidates_train(
    positions: jnp.ndarray,
    cam_xyz: jnp.ndarray,
    value_map: jnp.ndarray,
    current_lh: jnp.ndarray,      # (2,) current lattice index
    value_map_size: int = 64,
    grid_range: Tuple[float, float] = (-40.0, 40.0),
) -> jnp.ndarray:
    """(L, H) training-collection scores: max-orientation value for every
    in-bounds position except the current one (nbp_utils.py:701-713)."""
    L, H = positions.shape[:2]
    pix64, in64 = _project_lattice(positions, cam_xyz, value_map_size, grid_range)
    value = jnp.max(value_map, axis=-1)[pix64[..., 0], pix64[..., 1]]
    il = jnp.arange(L)[:, None]
    ih = jnp.arange(H)[None, :]
    is_current = (il == current_lh[0]) & (ih == current_lh[1])
    return jnp.where(in64 & (~is_current), value, NEG)


def boltzmann_first(scores: jnp.ndarray, key: jax.Array, beta: float = 0.5
                    ) -> jnp.ndarray:
    """Index (flat) of the Boltzmann-sampled first candidate
    (nbp_utils.py:717-723): softmax(score / beta) over admissible entries."""
    flat = scores.reshape(-1)
    logits = jnp.where(flat > NEG / 2, flat / beta, -jnp.inf)
    return jax.random.categorical(key, logits)
