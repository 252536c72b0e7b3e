"""Real (tesseral) spherical harmonics up to rank 8 (64 coefficients).

JAX port of the reference's recursion-based implementation
(macarons/utility/spherical_harmonics.py): associated Legendre functions with
Condon–Shortley phase via the (l, m) recursion; normalization
sqrt((2l+1)/4pi) * sqrt(2/pochhammer(l-|m|+1, 2|m|)) for m != 0. Degrees and
orders are static Python ints, so the recursion unrolls at trace time — no
caching needed.

Convention: theta is the POLAR angle (the callers convert elevation via
theta = -elev + pi/2, e.g. SconeVis.compute_visibilities).
"""

from __future__ import annotations

import math
from functools import reduce
from operator import mul
from typing import Dict, Tuple

import jax.numpy as jnp


def _semifactorial(x: int) -> float:
    return float(reduce(mul, range(x, 1, -2), 1.0))


def _pochhammer(x: int, k: int) -> float:
    return float(reduce(mul, range(x + 1, x + k), float(x)))


def _lpmv(l: int, m: int, x, cache: Dict[Tuple[int, int], jnp.ndarray]):
    """Associated Legendre P_l^m(x) with Condon–Shortley phase, m >= 0."""
    key = (l, m)
    if key in cache:
        return cache[key]
    if l == 0:
        y = jnp.ones_like(x)
    elif m == l:
        y = ((-1) ** m) * _semifactorial(2 * m - 1) * jnp.power(
            jnp.clip(1.0 - x * x, 0.0, None), m / 2.0)
    else:
        y = ((2 * l - 1) / (l - m)) * x * _lpmv(l - 1, m, x, cache)
        if l - m > 1:
            y = y - ((l + m - 1) / (l - m)) * _lpmv(l - 2, m, x, cache)
    cache[key] = y
    return y


def spherical_harmonics(l: int, theta, phi):
    """All 2l+1 components Y_{l,m}, m = -l..l, stacked on the last axis."""
    cos_t = jnp.cos(theta)
    cache: Dict[Tuple[int, int], jnp.ndarray] = {}
    outs = []
    for m in range(-l, l + 1):
        m_abs = abs(m)
        N = math.sqrt((2 * l + 1) / (4 * math.pi))
        leg = _lpmv(l, m_abs, cos_t, cache)
        if m == 0:
            outs.append(N * leg)
        else:
            trig = jnp.cos(m * phi) if m > 0 else jnp.sin(m_abs * phi)
            N = N * math.sqrt(2.0 / _pochhammer(l - m_abs + 1, 2 * m_abs))
            outs.append(N * leg * trig)
    return jnp.stack(outs, axis=-1)


def harmonics_up_to_rank(max_rank: int, theta, phi):
    """Concatenated Y_{l,m} for l < max_rank: (..., max_rank^2) features."""
    return jnp.concatenate(
        [spherical_harmonics(l, theta, phi) for l in range(max_rank)], axis=-1
    )


def base_view_harmonics(n_elev: int = 7, n_azim: int = 14, max_rank: int = 8):
    """(n_harmonics, n_elev*n_azim) harmonics table + polar angles of the
    discretized view directions (get_all_harmonics_under_degree,
    macarons/utility/scone_utils.py:714-739)."""
    elev_step = math.pi / (n_elev + 1)
    azim_step = 2 * math.pi / n_azim
    elev = jnp.asarray(
        [-math.pi / 2 + (i + 1) * elev_step for i in range(n_elev)
         for _ in range(n_azim)]
    )
    azim = jnp.asarray(
        [j * azim_step - math.pi for _ in range(n_elev) for j in range(n_azim)]
    )
    polar = -elev + math.pi / 2.0
    h = harmonics_up_to_rank(max_rank, polar, azim)  # (n_view, n_harmonics)
    return h.T, polar
