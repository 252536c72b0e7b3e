"""Legacy bidirectional shortest-path planner with point-cloud edges.

The reference keeps an earlier planner generation alongside the layout-image
Dijkstra: ``generate_Bidirectional_Dijkstra_path``
(next_best_path/utility/long_term_utils.py:175-254) searches the pose lattice
from both ends with unit-cost edges, where an edge is traversable iff the move
segment stays >= 0.2 world units from every reconstructed point
(``line_segment_intersects_point_cloud_region``, :651-685). It predates the
predicted-layout edges used by the shipping planner (planning/grid_paths.py)
but remains a capability: path planning directly against accumulated geometry
with no learned model in the loop.

TPU-native restructuring: the reference runs heapq frontiers on the host and
one GPU segment test per edge visit. Here ALL lattice edges are tested in one
batched device call upfront (4 directions x L x H segment-vs-cloud
reductions), then the search itself — a few hundred unit-cost grid nodes — is
a host BFS meeting in the middle. Edges are symmetric, so bidirectional BFS
on unit costs returns the same optimal paths as the reference's bidirectional
Dijkstra. Deltas vs the reference (documented): the lattice is the 2-D (l, h)
grid the cameras actually move on (the reference enumerates 6-connected 3-D
index neighbors, but its height index is pinned by setup_test_camera —
testers/scene.py:463-466 — so vertical edges never materialize), and the
final re-validation pass (:246-250) is subsumed because paths only use edges
that already passed the batched test.
"""

from __future__ import annotations

from collections import deque
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pc_collision import segment_point_distances
from .grid_paths import DIRS


@jax.jit
def pc_edge_blocked(positions: jnp.ndarray, points: jnp.ndarray,
                    valid: jnp.ndarray,
                    threshold: float = 0.2) -> jnp.ndarray:
    """(4, L, H) bool: unit-move edge (dir, l, h) collides with the cloud.

    One batched call tests every lattice edge at once: vmap over the 4
    directions x L x H start nodes of the per-segment min-distance
    reduction. Out-of-grid neighbors are marked blocked.
    """
    L, H = positions.shape[0], positions.shape[1]
    dirs = jnp.asarray(DIRS, jnp.int32)  # (4, 2)

    def one_edge(d, l, h):
        nl, nh = l + dirs[d, 0], h + dirs[d, 1]
        in_grid = (nl >= 0) & (nl < L) & (nh >= 0) & (nh < H)
        a = positions[l, h]
        b = positions[jnp.clip(nl, 0, L - 1), jnp.clip(nh, 0, H - 1)]
        dmin = jnp.min(
            jnp.where(valid, segment_point_distances(points, a, b), jnp.inf))
        return (~in_grid) | (dmin < threshold)

    dd, ll, hh = jnp.meshgrid(jnp.arange(4), jnp.arange(L), jnp.arange(H),
                              indexing="ij")
    return jax.vmap(one_edge)(dd.reshape(-1), ll.reshape(-1),
                              hh.reshape(-1)).reshape(4, L, H)


def bidirectional_grid_path(blocked: np.ndarray,
                            start: Tuple[int, int],
                            goal: Tuple[int, int],
                            ) -> Optional[List[Tuple[int, int]]]:
    """Bidirectional unit-cost search over the lattice; returns the node
    list start..goal (inclusive) or None (the reference prints "No valid
    path found!" and returns [] — long_term_utils.py:253-254).

    ``blocked`` is the (4, L, H) edge mask from pc_edge_blocked (or any
    other edge source — the ground-truth tables work too).
    """
    blocked = np.asarray(blocked)
    L, H = blocked.shape[1], blocked.shape[2]
    start, goal = tuple(start), tuple(goal)
    if start == goal:
        return [start]

    parents = [{start: None}, {goal: None}]
    frontiers = [deque([start]), deque([goal])]
    meet = None
    while frontiers[0] and frontiers[1] and meet is None:
        # Expand the smaller frontier (standard bidirectional BFS).
        side = 0 if len(frontiers[0]) <= len(frontiers[1]) else 1
        for _ in range(len(frontiers[side])):
            node = frontiers[side].popleft()
            for d, (dl, dh) in enumerate(DIRS):
                if blocked[d, node[0], node[1]]:
                    continue
                nxt = (node[0] + dl, node[1] + dh)
                if not (0 <= nxt[0] < L and 0 <= nxt[1] < H):
                    continue
                if nxt in parents[side]:
                    continue
                parents[side][nxt] = node
                if nxt in parents[1 - side]:
                    meet = nxt
                    break
                frontiers[side].append(nxt)
            if meet is not None:
                break
    if meet is None:
        return None

    fwd = []
    cur: Optional[Tuple[int, int]] = meet
    while cur is not None:
        fwd.append(cur)
        cur = parents[0][cur]
    fwd.reverse()
    cur = parents[1][meet]
    while cur is not None:
        fwd.append(cur)
        cur = parents[1][cur]
    return fwd


def bidirectional_path_positions(positions: np.ndarray, points: jnp.ndarray,
                                 valid: jnp.ndarray,
                                 start: Tuple[int, int],
                                 goal: Tuple[int, int],
                                 threshold: float = 0.2
                                 ) -> Optional[np.ndarray]:
    """End-to-end analog of generate_Bidirectional_Dijkstra_path: plan on
    point-cloud edges and return the world positions of the moves (the
    reference returns real_move_path[1:], :252 — the start node excluded)."""
    blocked = np.asarray(pc_edge_blocked(jnp.asarray(positions), points,
                                         valid, threshold=threshold))
    path = bidirectional_grid_path(blocked, start, goal)
    if path is None or len(path) < 2:
        return None
    return np.asarray([positions[l, h] for (l, h) in path[1:]])
