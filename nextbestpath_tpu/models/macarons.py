"""MACARONS composite model: depth + occupancy + visibility.

Port of macarons/networks/Macarons.py: the wrapper holds the ManyDepth depth
module and the SCONE modules and dispatches on a mode string
(Macarons.forward :110-136); compute_visibility_gains (:138-178) evaluates
the predicted SH toward candidate cameras. Freeze flags of
MacaronsOptimizer (:59-88) map to optax.multi_transform label trees.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..geometry.cameras import CameraIntrinsics
from .manydepth import ManyDepth
from .scone import SconeOcc, SconeVis, coverage_gain, visibility_gains


@dataclasses.dataclass
class Macarons:
    """Bundle of the three modules + their variables."""

    depth: ManyDepth
    scone_occ: SconeOcc
    scone_vis: SconeVis
    depth_vars: Any = None
    occ_vars: Any = None
    vis_vars: Any = None

    @staticmethod
    def create(key: jax.Array, intr: Optional[CameraIntrinsics] = None,
               init_shapes: bool = True, seq_len: int = 2048,
               image_height: int = 256, image_width: int = 456) -> "Macarons":
        intr = intr or CameraIntrinsics(image_height=image_height,
                                        image_width=image_width)
        depth = ManyDepth(intr=intr)
        occ = SconeOcc(seq_len=seq_len)
        vis = SconeVis()
        m = Macarons(depth=depth, scone_occ=occ, scone_vis=vis)
        if init_shapes:
            k1, k2, k3 = jax.random.split(key, 3)
            H, W = intr.image_height, intr.image_width
            m.depth_vars = depth.init(
                k1,
                jnp.zeros((1, H, W, 3)), jnp.zeros((1, 3, 3)), jnp.zeros((1, 3)),
                jnp.zeros((1, 2, H, W, 3)), jnp.zeros((1, 2, 3, 3)),
                jnp.zeros((1, 2, 3)), train=False,
            )
            m.occ_vars = occ.init(
                k2, jnp.zeros((1, 64, 3)), jnp.zeros((1, 8, 3)),
                jnp.zeros((1, 8, 64)), key=k2,
            )
            m.vis_vars = vis.init(
                k3, jnp.zeros((1, 16, 4)), view_harmonics=jnp.zeros((1, 16, 64)),
            )
        return m

    def __call__(self, mode: str, *args, **kwargs):
        """Mode dispatch (Macarons.forward, Macarons.py:110-136)."""
        if mode == "depth":
            return self.depth.apply(self.depth_vars, *args, **kwargs)
        if mode == "occupancy":
            return self.scone_occ.apply(self.occ_vars, *args, **kwargs)
        if mode == "visibility":
            return self.scone_vis.apply(self.vis_vars, *args, **kwargs)
        raise ValueError(f"unknown mode {mode!r}")

    def compute_visibility_gains(self, pts, view_harmonics, X_cam,
                                 per_point: bool = False):
        """SH evaluation toward candidate cameras (Macarons.py:138-178)."""
        h = self.scone_vis.apply(self.vis_vars, pts,
                                 view_harmonics=view_harmonics)
        if per_point:
            return visibility_gains(pts[..., :3], h, X_cam)
        return coverage_gain(pts[..., :3], h, X_cam)


def macarons_optimizer(depth_lr: float = 1e-4, scone_lr: float = 1e-4,
                       freeze_depth: bool = False,
                       freeze_scone: bool = False):
    """Per-module optimizers with freeze flags (MacaronsOptimizer analog)."""
    def make(lr, frozen):
        return optax.set_to_zero() if frozen else optax.adam(lr)

    return make(depth_lr, freeze_depth), make(scone_lr, freeze_scone)
