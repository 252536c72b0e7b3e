"""Rollout state and the move/capture stage shared by training collection
and evaluation.

Replaces the reference's Camera.update_camera + capture_image +
load_images_for_depth_model + compute_partial_point_cloud chain
(macarons_utils.py:2590-2847, 964-1004): per pose, the camera linearly
interpolates over n_interpolation_steps substeps (with azimuth wraparound,
:2616-2632), renders a depth frame at each substep, and each frame's points
are backprojected and appended to the accumulated cloud. The reference also
re-processes the final frame of the move at the start of the next pose
(nbp_planning.py:64-110), so each pose contributes 5 frame batches; we
reproduce that.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..geometry.cameras import CameraIntrinsics
from .sensor import FramePoints, PointBuffer, backproject_sample, capture_depth


class TrajectoryBuffer(NamedTuple):
    """Fixed-capacity history of interpolated camera positions
    (the reference's X_cam_history, macarons_utils.py:2262-2264)."""

    xyz: jnp.ndarray    # (C, 3)
    count: jnp.ndarray  # scalar int32

    @staticmethod
    def create(capacity: int) -> "TrajectoryBuffer":
        return TrajectoryBuffer(jnp.zeros((capacity, 3), jnp.float32),
                                jnp.zeros((), jnp.int32))

    def append(self, pos: jnp.ndarray) -> "TrajectoryBuffer":
        cap = self.xyz.shape[0]
        slot = jnp.minimum(self.count, cap - 1)
        return TrajectoryBuffer(self.xyz.at[slot].set(pos),
                                jnp.minimum(self.count + 1, cap))

    def append_many(self, xyz: jnp.ndarray) -> "TrajectoryBuffer":
        """Append B positions in order with one scatter — bit-identical to B
        sequential append calls, including the saturated case (sequential
        appends past capacity all overwrite the last slot, last write wins,
        so colliding writes keep only the final one)."""
        B = xyz.shape[0]
        cap = self.xyz.shape[0]
        slots = self.count + jnp.arange(B, dtype=jnp.int32)
        keep = (slots < cap - 1) | (jnp.arange(B) == B - 1)
        slots = jnp.where(keep, jnp.minimum(slots, cap - 1), cap)
        return TrajectoryBuffer(
            self.xyz.at[slots].set(xyz, mode="drop"),
            jnp.minimum(self.count + B, cap))

    def valid_mask(self) -> jnp.ndarray:
        return jnp.arange(self.xyz.shape[0]) < self.count


def interpolate_pose(old_pose5: jnp.ndarray, new_pose5: jnp.ndarray,
                     step: jnp.ndarray, n_steps: int,
                     n_azim: int) -> jnp.ndarray:
    """Linear pose interpolation with azimuth wraparound.

    Reference update_camera (macarons_utils.py:2616-2632): when moving
    between azimuth indices 0 and n_azim-1 the interpolation goes the short
    way around (offset +-360 on intermediate steps only).
    """
    frac = step.astype(jnp.float32) / n_steps
    pose = old_pose5 + (new_pose5 - old_pose5) * frac
    azim_step = 360.0 / n_azim
    old_a = old_pose5[4]
    new_a = new_pose5[4]
    wrap_hi = (old_a < azim_step / 2.0) & (new_a > 360.0 - 1.5 * azim_step)
    wrap_lo = (new_a < azim_step / 2.0) & (old_a > 360.0 - 1.5 * azim_step)
    offset = jnp.where(wrap_hi, -360.0, jnp.where(wrap_lo, 360.0, 0.0))
    is_final = step == n_steps
    offset = jnp.where(is_final, 0.0, offset)
    azim = old_a + (new_a + offset - old_a) * frac
    azim = jnp.where(is_final, new_a, azim)
    return pose.at[4].set(azim)


@functools.partial(
    jax.jit,
    static_argnames=("intr", "n_steps", "n_azim", "n_slots", "interpret",
                     "stratified", "gathering_factor", "batched"),
)
def move_and_capture(
    tri_soa: jnp.ndarray,
    n_tris: jnp.ndarray,
    old_pose5: jnp.ndarray,
    new_pose5: jnp.ndarray,
    pc: PointBuffer,
    traj: TrajectoryBuffer,
    key: jax.Array,
    intr: CameraIntrinsics,
    n_steps: int = 4,
    n_azim: int = 8,
    n_slots: int = 6144,
    gathering_factor: float = 0.05,
    sensor_range: float = 70.0,
    interpret: Optional[bool] = None,
    stratified: bool = False,
    batched: bool = False,
) -> Tuple[PointBuffer, TrajectoryBuffer, jnp.ndarray]:
    """Execute one lattice move: n_steps interpolation frames, each rendered,
    backprojected, subsampled, and appended. Returns (pc, traj, last_zbuf).

    Two lowerings, same results:

    * ``batched=False`` — the substep loop is a lax.scan (rolled body keeps
      the traced program ~4x smaller; compile time through the remote-TPU
      compiler is a first-order cost, BASELINE.md round 1). Each substep's
      render->backproject->append chain is serial through the pc carry.
    * ``batched=True`` — unroll the n_steps substeps (per-frame batch-1
      render + subsample kernels, same RNG and pixel selection as the scan
      path's), then land all n_steps point batches with ONE fused scatter
      (PointBuffer.append_batches) and all trajectory appends with one
      more. Removes the scan carry: without the pc threaded through every
      substep, XLA schedules the four render->subsample chains freely and
      the append chain of small scatters collapses to one kernel. Targets
      the latency-bound pose step (VERDICT r4 weak #2; the round-2 batched
      attempt predated the pinhole MXU kernel and was slower — this one is
      re-measured on v5e, BASELINE.md round 5).

    The two paths select identical pixels and produce identical buffer
    layouts; world coordinates agree to one ulp but are NOT bit-identical
    (XLA fuses the unrolled graph differently from the scan body), so
    batched=True is an opt-in benchmark mode, never a gate mode
    (regression: tests/test_batched_capture.py)."""

    if batched:
        pts_all, valid_all, poses_xyz = [], [], []
        zbuf = None
        for s in range(1, n_steps + 1):
            pose = interpolate_pose(old_pose5, new_pose5, jnp.int32(s),
                                    n_steps, n_azim)
            zbuf, R, T = capture_depth(tri_soa, n_tris, pose, intr)
            sub = jax.random.fold_in(key, jnp.int32(s))
            b = backproject_sample(
                zbuf, R, T, intr, sub, n_slots,
                gathering_factor=gathering_factor,
                sensor_range=sensor_range, stratified=stratified)
            pts_all.append(b.points)
            valid_all.append(b.valid)
            poses_xyz.append(pose[:3])
        pc = pc.append_batches(jnp.stack(pts_all), jnp.stack(valid_all))
        traj = traj.append_many(jnp.stack(poses_xyz))
        return pc, traj, zbuf

    def substep(carry, s):
        pc_c, traj_c = carry
        pose = interpolate_pose(old_pose5, new_pose5, s, n_steps, n_azim)
        zbuf, R, T = capture_depth(tri_soa, n_tris, pose, intr)
        sub = jax.random.fold_in(key, s)
        batch = backproject_sample(
            zbuf, R, T, intr, sub, n_slots,
            gathering_factor=gathering_factor, sensor_range=sensor_range,
            stratified=stratified,
        )
        return (pc_c.append(batch, prefix_valid=True),
                traj_c.append(pose[:3])), zbuf

    (pc, traj), zbufs = jax.lax.scan(
        substep, (pc, traj), jnp.arange(1, n_steps + 1, dtype=jnp.int32))
    return pc, traj, zbufs[-1]


@functools.partial(jax.jit, static_argnames=("intr", "n_slots", "interpret",
                                              "stratified",
                                              "gathering_factor"))
def observe_current(
    tri_soa: jnp.ndarray,
    n_tris: jnp.ndarray,
    pose5: jnp.ndarray,
    pc: PointBuffer,
    key: jax.Array,
    intr: CameraIntrinsics,
    n_slots: int = 6144,
    gathering_factor: float = 0.05,
    sensor_range: float = 70.0,
    interpret: Optional[bool] = None,
    stratified: bool = False,
) -> PointBuffer:
    """The loop-start frame re-processing (nbp_planning.py:64-110): the
    current pose's frame is rendered and its points appended (a second,
    independently-subsampled batch of the last move frame)."""
    zbuf, R, T = capture_depth(tri_soa, n_tris, pose5, intr)
    batch = backproject_sample(
        zbuf, R, T, intr, key, n_slots,
        gathering_factor=gathering_factor, sensor_range=sensor_range,
        stratified=stratified,
    )
    return pc.append(batch, prefix_valid=True)
