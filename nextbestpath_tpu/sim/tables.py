"""Per-scene static planner tables.

The reference re-queries trimesh on every pose for facts that never change:
whether a lattice position is inside the navigable volume
(check_camera_in_mesh, long_term_utils.py:158-170, called per candidate per
regen) and whether a lattice edge's segment crosses the mesh
(line_segment_mesh_intersection, macarons_utils.py:120-151, called per edge
per Dijkstra expansion). Both are static per scene — computed once here with
the ray kernel.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops.raytrace import points_inside_mesh, segments_hit_mesh
from ..planning.grid_paths import DIRS, lattice_positions


class SceneTables(NamedTuple):
    positions: jnp.ndarray       # (L, H, 3) lattice world positions
    inside: jnp.ndarray          # (L, H) bool: position inside air volume
    gt_edge_blocked: jnp.ndarray  # (4, L, H) bool: segment crosses mesh


def build_scene_tables(tri_soa: jnp.ndarray, n_tris, pose_origin: jnp.ndarray,
                       L: int, H: int, interpret=None) -> SceneTables:
    positions = lattice_positions(pose_origin, L, H)
    flat = positions.reshape(-1, 3)
    inside = points_inside_mesh(flat, tri_soa, n_tris,
                                interpret=interpret).reshape(L, H)

    il = jnp.arange(L)[:, None]
    ih = jnp.arange(H)[None, :]
    blocked = []
    for (dl, dh) in DIRS:
        dst = positions + jnp.asarray([3.0 * dl, 0.0, 3.0 * dh])
        hit = segments_hit_mesh(flat, dst.reshape(-1, 3), tri_soa, n_tris,
                                interpret=interpret).reshape(L, H)
        off_grid = ((il + dl < 0) | (il + dl >= L)
                    | (ih + dh < 0) | (ih + dh >= H))
        blocked.append(hit | off_grid)
    return SceneTables(positions=positions, inside=inside,
                       gt_edge_blocked=jnp.stack(blocked))
