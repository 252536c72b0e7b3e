"""Camera-pose validity queries over the pose lattice.

The reference's Camera exposes per-pose validity predicates used by the
trainers/testers to pick start poses and candidate NBV moves
(macarons/utility/macarons_utils.py):

- ``is_fov_empty`` (:2672-2688): no mesh vertex falls inside the pose's view
  frustum (fov_range = 5 * zfar),
- ``check_if_pose_is_occupied`` (:2690-2713): occupancy lookup whose return
  is hardwired to False (line :2713 returns the constant — reproduced
  faithfully, with the honest predicate available behind a flag),
- ``check_if_pose_is_valid`` (:2715-2741): not occupied and non-empty fov,
- ``get_random_valid_pose`` (:2413-2446): rejection-sample the pose space
  until a pose is valid AND sees at least one proxy point,
- ``sample_valid_poses_in_a_certain_range`` (:2363-2412): enumerate the L1
  ball of lattice positions around the current pose, draw 1/5 of the
  candidates, keep the valid ones.

TPU-native restructuring: the reference runs one frustum query per candidate
in a Python rejection loop. Here the validity of EVERY lattice pose is
computed in one batched device call (``lattice_validity_mask`` — lax.map
over cameras of a masked points-in-frustum reduction), after which random
draws are O(1) categorical samples over the mask. Same acceptance set, no
loop-carried host round trips.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..geometry.cameras import (
    CameraIntrinsics,
    get_camera_RT,
    points_in_fov_mask,
)


def fov_nonempty_mask(points: jnp.ndarray, points_valid: jnp.ndarray,
                      X_cams: jnp.ndarray, V_cams: jnp.ndarray,
                      intr: CameraIntrinsics, fov_range: float,
                      batch_size: int = 64) -> jnp.ndarray:
    """(M,) bool: camera m sees at least one valid point.

    The complement of is_fov_empty (macarons_utils.py:2672-2688), batched
    over M cameras; ``batch_size`` bounds the (cameras x points) working set.
    """

    def one(args):
        X, V = args
        R, T = get_camera_RT(X[None], V[None])
        m = points_in_fov_mask(points, R[0], T[0], intr, fov_range)
        return jnp.any(m & points_valid)

    return jax.lax.map(one, (X_cams, V_cams), batch_size=batch_size)


def check_if_pose_is_occupied(*_args, reference_behavior: bool = True,
                              occupied: Optional[jnp.ndarray] = None,
                              idx: Optional[Tuple[int, int]] = None):
    """Occupancy test for a lattice pose.

    The reference computes ``is_occupied`` from its pose-occupancy dict and
    then returns the CONSTANT False (macarons_utils.py:2713 ``return False
    #is_occupied``) — every caller therefore treats all poses as free. The
    default reproduces that behavior; pass ``reference_behavior=False`` with
    an ``occupied`` (L, H) mask to get the honest lookup.
    """
    if reference_behavior or occupied is None or idx is None:
        return jnp.bool_(False)
    return occupied[idx[0], idx[1]]


def lattice_validity_mask(positions: jnp.ndarray, azims: jnp.ndarray,
                          elev_deg: float,
                          mesh_points: jnp.ndarray,
                          mesh_valid: jnp.ndarray,
                          intr: CameraIntrinsics, zfar: float,
                          proxy_points: Optional[jnp.ndarray] = None,
                          proxy_valid: Optional[jnp.ndarray] = None,
                          batch_size: int = 64) -> jnp.ndarray:
    """(L, H, A) bool: pose (l, h, a) is valid.

    check_if_pose_is_valid for every lattice pose at once
    (macarons_utils.py:2715-2741): non-empty mesh fov, not occupied (always
    free — see check_if_pose_is_occupied), and — when proxy points are given,
    matching get_random_valid_pose's extra test (:2437-2440) — at least one
    proxy point in the frustum. fov_range = 5 * zfar as in the reference.
    """
    L, H = positions.shape[0], positions.shape[1]
    A = azims.shape[0]
    X = jnp.repeat(positions.reshape(-1, 3), A, axis=0)          # (L*H*A, 3)
    az = jnp.tile(azims, L * H)
    V = jnp.stack([jnp.full_like(az, elev_deg), az], axis=-1)    # (L*H*A, 2)
    ok = fov_nonempty_mask(mesh_points, mesh_valid, X, V, intr,
                           5.0 * zfar, batch_size=batch_size)
    if proxy_points is not None:
        pv = (proxy_valid if proxy_valid is not None
              else jnp.ones(proxy_points.shape[0], bool))
        ok = ok & fov_nonempty_mask(proxy_points, pv, X, V, intr,
                                    5.0 * zfar, batch_size=batch_size)
    return ok.reshape(L, H, A)


def random_valid_pose(key: jax.Array, valid_mask: jnp.ndarray) -> jnp.ndarray:
    """(3,) int32 (l, h, a): uniform draw over the valid poses.

    Replaces get_random_valid_pose's host rejection loop
    (macarons_utils.py:2413-2446) with one categorical draw over the
    precomputed mask — identical acceptance distribution. When no pose is
    valid the reference would loop forever; here the draw degrades to
    uniform over the lattice (caller checks ``valid_mask.any()``).
    """
    L, H, A = valid_mask.shape
    flat = valid_mask.reshape(-1)
    logits = jnp.where(flat, 0.0, -jnp.inf)
    logits = jnp.where(jnp.any(flat), logits, jnp.zeros_like(logits))
    i = jax.random.categorical(key, logits)
    return jnp.stack([i // (H * A), (i // A) % H, i % A]).astype(jnp.int32)


def sample_valid_poses_in_range(key: jax.Array, valid_mask: jnp.ndarray,
                                cur_lh: jnp.ndarray, range_value: int,
                                keep_frac: float = 0.2) -> jnp.ndarray:
    """(L, H, A) bool: valid poses within the L1 ball of ``range_value``
    lattice steps around ``cur_lh``, each kept with probability
    ``keep_frac`` (sample_valid_poses_in_a_certain_range,
    macarons_utils.py:2363-2412: the reference draws len//5 of the
    candidate keys before validity filtering; a per-candidate 1/5 coin is
    the order-independent equivalent). The current position is excluded
    (:2382 ``pos != current_camera_position``).
    """
    L, H, A = valid_mask.shape
    ll, hh = jnp.meshgrid(jnp.arange(L), jnp.arange(H), indexing="ij")
    l1 = jnp.abs(ll - cur_lh[0]) + jnp.abs(hh - cur_lh[1])
    in_range = (l1 <= range_value) & (l1 > 0)
    keep = jax.random.uniform(key, (L, H, A)) < keep_frac
    return valid_mask & in_range[:, :, None] & keep
