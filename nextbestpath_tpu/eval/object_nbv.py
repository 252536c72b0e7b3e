"""Object-level NBV evaluation (the ShapeNet tester analog).

Port of macarons/testers/shapenet.py:test_loop (:8-233): starting from one
view of an object, greedily pick the next camera on a sphere of candidates
that maximizes predicted coverage gain (SconeVis), and track the true surface
coverage after each acquisition. The reference reads precomputed per-object
coverage matrices; here ground-truth visibility comes from the ray kernel
(occlusion-tested surface samples), so any closed mesh works — including the
procedural objects used when ShapeNet is unavailable.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..assets.objects import cameras_on_sphere
from ..assets.scene_assets import SceneAssets
from ..models.harmonics import base_view_harmonics
from ..models.scone import SconeVis, coverage_gain
from ..ops.raytrace import ray_hits, tris_to_soa
from ..ops.view_state import compute_view_harmonics, compute_view_state


def visible_mask_batched(surface: np.ndarray, cams: np.ndarray, tri_soa,
                         n_tris) -> np.ndarray:
    """(C, N) visibility of surface points from each camera: the segment
    camera->point must not hit the mesh strictly before the point
    (ray_hits returns +inf when nothing is hit within t_max)."""
    C, N = len(cams), len(surface)
    origins = np.repeat(np.asarray(cams, np.float32), N, axis=0)
    dirs = (np.tile(surface, (C, 1)) - origins)
    t, _ = ray_hits(jnp.asarray(origins), jnp.asarray(dirs), tri_soa,
                    n_tris, t_min=1e-4, t_max=0.999)
    return (np.asarray(t) >= 0.999).reshape(C, N)


def visible_mask(surface: np.ndarray, cam: np.ndarray, tri_soa, n_tris
                 ) -> np.ndarray:
    """Surface points visible (unoccluded) from cam."""
    return visible_mask_batched(surface, np.asarray(cam)[None], tri_soa,
                                n_tris)[0]


def _bounds(assets):
    """Scene bbox for SceneAssets (settings) or ObjectAssets (x_min/max)."""
    settings = getattr(assets, "settings", None)
    if settings is not None:
        return settings.scene.x_min, settings.scene.x_max
    return assets.x_min, assets.x_max


def object_nbv_rollout(assets: SceneAssets, scone_vis: SconeVis, vis_variables,
                       n_views: int = 10, n_candidates: int = 32,
                       n_tokens: int = 512, seed: int = 0,
                       n_elev: int = 7, n_azim: int = 14,
                       verbose: bool = False) -> List[float]:
    """Greedy NBV over sphere candidates; returns the coverage curve."""
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    tri_soa = tris_to_soa(jnp.asarray(assets.tris))
    n_tris = assets.n_tris
    surface = assets.gt_surface[
        rng.permutation(len(assets.gt_surface))[:2048]]
    lo, hi = _bounds(assets)
    center = (lo + hi) / 2.0
    diag = float(np.linalg.norm(hi - lo))
    norm = lambda q: (q - center) / diag

    cands = cameras_on_sphere(n_candidates, 0.7 * diag, center, rng)
    base_h, h_polar = base_view_harmonics(n_elev, n_azim, 8)

    chosen = [int(rng.integers(n_candidates))]
    covered = visible_mask(surface, cands[chosen[0]], tri_soa, n_tris)
    curve = [float(covered.mean())]

    for step in range(n_views - 1):
        if len(chosen) >= n_candidates:
            # Every candidate acquired: the curve is saturated; further
            # argmax over an empty gains array would raise.
            curve.append(curve[-1])
            continue
        # Tokens: observed surface points (covered set) with occupancy 1.
        obs = surface[covered] if covered.any() else surface[:1]
        idx = rng.integers(0, len(obs), n_tokens)
        tokens = obs[idx]
        vs = compute_view_state(jnp.asarray(tokens)[None],
                                jnp.asarray(cands[chosen]), n_elev, n_azim)
        vh = compute_view_harmonics(vs, base_h, h_polar, n_elev, n_azim)
        pts4 = jnp.concatenate(
            [jnp.asarray(norm(tokens)),
             jnp.ones((n_tokens, 1))], axis=-1)[None]
        h = scone_vis.apply(vis_variables, pts4, view_harmonics=vh)
        remaining = [c for c in range(n_candidates) if c not in chosen]
        gains = coverage_gain(pts4[..., :3], h,
                              jnp.asarray(norm(cands[remaining]))[None])[0]
        best = remaining[int(jnp.argmax(gains))]
        chosen.append(best)
        covered = covered | visible_mask(surface, cands[best], tri_soa, n_tris)
        curve.append(float(covered.mean()))
        if verbose:
            print(f"view {step + 2}: coverage {curve[-1]:.4f}")
    return curve
