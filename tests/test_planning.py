import heapq

import jax
import jax.numpy as jnp
import numpy as np

from nextbestpath_tpu.planning.bresenham import bresenham_obstacle_count
from nextbestpath_tpu.planning.grid_paths import (
    DIRS,
    INF,
    bfs_distance_field,
    extract_path,
    lattice_positions,
)


def _ref_bresenham(x0, y0, x1, y1):
    """Literal port of the reference bresenham_line (long_term_utils.py:277)."""
    points = []
    dx = abs(x1 - x0)
    dy = abs(y1 - y0)
    sx = 1 if x0 < x1 else -1
    sy = 1 if y0 < y1 else -1
    err = dx - dy
    while True:
        points.append((x0, y0))
        if x0 == x1 and y0 == y1:
            break
        e2 = 2 * err
        if e2 > -dy:
            err -= dy
            x0 += sx
        if e2 < dx:
            err += dx
            y0 += sy
    return points


def test_bresenham_pixel_parity():
    rng = np.random.default_rng(0)
    img = (rng.random((64, 64)) < 0.3).astype(np.float32)
    jimg = jnp.asarray(img)
    for _ in range(20):
        x0, y0, x1, y1 = rng.integers(0, 64, size=4)
        want = sum(int(img[x, y]) for (x, y) in _ref_bresenham(int(x0), int(y0), int(x1), int(y1)))
        got = int(bresenham_obstacle_count(jnp.int32(x0), jnp.int32(y0),
                                           jnp.int32(x1), jnp.int32(y1), jimg,
                                           max_steps=128))
        assert got == want, (x0, y0, x1, y1, got, want)


def _ref_dijkstra_dists(L, H, blocked, start):
    """Host Dijkstra with the reference's unit costs and 4-neighbors."""
    dist = {}
    pq = [(0, start)]
    dist[start] = 0
    while pq:
        d, node = heapq.heappop(pq)
        if d > dist.get(node, 1 << 30):
            continue
        i, j = node
        for k, (dl, dh) in enumerate(DIRS):
            ni, nj = i + dl, j + dh
            if not (0 <= ni < L and 0 <= nj < H):
                continue
            if blocked[k, i, j]:
                continue
            nd = d + 1
            if nd < dist.get((ni, nj), 1 << 30):
                dist[(ni, nj)] = nd
                heapq.heappush(pq, (nd, (ni, nj)))
    return dist


def test_bfs_field_matches_dijkstra():
    rng = np.random.default_rng(1)
    L, H = 12, 9
    blocked = rng.random((4, L, H)) < 0.3
    # Make blocked symmetric-ish like real edge tables (both directions).
    for k, (dl, dh) in enumerate(DIRS):
        opp = {(1, 0): 1, (-1, 0): 0, (0, 1): 3, (0, -1): 2}[(dl, dh)]
        for i in range(L):
            for j in range(H):
                ni, nj = i + dl, j + dh
                if 0 <= ni < L and 0 <= nj < H and blocked[k, i, j]:
                    blocked[opp, ni, nj] = True
    start = (0, 0)
    ref = _ref_dijkstra_dists(L, H, blocked, start)
    dist = np.asarray(
        bfs_distance_field(jnp.asarray(blocked), jnp.asarray(start), L, H)
    )
    for i in range(L):
        for j in range(H):
            want = ref.get((i, j), int(INF))
            got = int(dist[i, j])
            if want >= 1 << 20:
                assert got >= int(INF)
            else:
                assert got == want, (i, j, got, want)


def test_bfs_field_serpentine_longer_than_grid_diameter():
    """Maze whose shortest path winds for ~L*H steps: a fixed L+H sweep
    count (the old implementation) under-converges here; the fixpoint
    while_loop must match exact Dijkstra anyway."""
    L, H = 10, 10
    blocked = np.zeros((4, L, H), bool)
    # Serpentine: walls between column pairs except at alternating row ends,
    # forcing the path 0,0 -> 9,9 to traverse every column.
    for j in range(H - 1):
        open_row = (L - 1) if j % 2 == 0 else 0
        for i in range(L):
            if i != open_row:
                blocked[2, i, j] = True      # (i,j) -> (i,j+1)
                blocked[3, i, j + 1] = True  # reverse edge
    start = (0, 0)
    ref = _ref_dijkstra_dists(L, H, blocked, start)
    assert ref[(L - 1, H - 1)] > L + H  # the scenario is actually long
    dist = np.asarray(
        bfs_distance_field(jnp.asarray(blocked), jnp.asarray(start), L, H))
    for (i, j), want in ref.items():
        assert int(dist[i, j]) == want, (i, j, int(dist[i, j]), want)


def test_extract_path_valid():
    L, H = 10, 10
    blocked = jnp.zeros((4, L, H), bool)
    start = jnp.asarray([0, 0])
    goal = jnp.asarray([4, 3])
    dist = bfs_distance_field(blocked, start, L, H)
    path, plen, reachable = extract_path(dist, blocked, goal, L, H, max_len=16)
    assert bool(reachable)
    assert int(plen) == 7
    path = np.asarray(path)[:7]
    # Path is start-exclusive, ends at goal, each step is a unit move.
    assert (path[-1] == [4, 3]).all()
    prev = np.array([0, 0])
    for p in path:
        assert abs(p - prev).sum() == 1
        prev = p


def test_extract_path_unreachable():
    L, H = 6, 6
    blocked = jnp.ones((4, L, H), bool)  # no edges at all
    dist = bfs_distance_field(blocked, jnp.asarray([0, 0]), L, H)
    path, plen, reachable = extract_path(dist, blocked, jnp.asarray([5, 5]), L, H,
                                         max_len=16)
    assert not bool(reachable)


def test_lattice_positions():
    pos = np.asarray(lattice_positions(jnp.asarray([10.0, 3.3, 20.0]), 4, 3))
    assert pos.shape == (4, 3, 3)
    np.testing.assert_allclose(pos[0, 0], [10.0, 3.3, 20.0])
    np.testing.assert_allclose(pos[2, 1], [16.0, 3.3, 23.0])


def test_extract_path_truncation_keeps_start_side():
    """Regression: when goal_dist > max_len the kept prefix must be the
    max_len nodes nearest the START (adjacent first hop, consecutive unit
    moves), not the goal side — a goal-side prefix made path[0] a
    multi-cell jump that bypassed the first-segment collision check and
    teleported the camera through walls."""
    L, H = 10, 10
    blocked = jnp.zeros((4, L, H), bool)
    start = jnp.asarray([0, 0])
    goal = jnp.asarray([9, 9])  # distance 18 > max_len 5
    dist = bfs_distance_field(blocked, start, L, H)
    path, plen, reachable = extract_path(dist, blocked, goal, L, H, max_len=5)
    assert bool(reachable)
    assert int(plen) == 5
    path = np.asarray(path)
    prev = np.array([0, 0])
    d = np.asarray(dist)
    for j in range(5):
        assert abs(path[j] - prev).sum() == 1, (j, path[j], prev)
        assert d[path[j][0], path[j][1]] == j + 1
        prev = path[j]

    # Serpentine maze variant: winding shortest path, truncated mid-corridor.
    blocked_np = np.zeros((4, L, H), bool)
    for j in range(H - 1):
        open_row = (L - 1) if j % 2 == 0 else 0
        for i in range(L):
            if i != open_row:
                blocked_np[2, i, j] = True
                blocked_np[3, i, j + 1] = True
    blocked_s = jnp.asarray(blocked_np)
    dist_s = bfs_distance_field(blocked_s, start, L, H)
    goal_s = jnp.asarray([9, 9])
    assert int(dist_s[9, 9]) > 20
    path_s, plen_s, r_s = extract_path(dist_s, blocked_s, goal_s, L, H,
                                       max_len=20)
    assert bool(r_s) and int(plen_s) == 20
    path_s = np.asarray(path_s)
    prev = np.array([0, 0])
    ds = np.asarray(dist_s)
    for j in range(20):
        assert abs(path_s[j] - prev).sum() == 1, (j, path_s[j], prev)
        assert ds[path_s[j][0], path_s[j][1]] == j + 1
        prev = path_s[j]
