"""One-scene-per-device SPMD rollouts via jax.shard_map.

The reference's data parallelism runs one scene per GPU as an independent
process under DDP (macarons_utils.py:177-326; DistributedSampler :279-293).
The vmapped ``BatchedScanRollout`` expresses that as a batch axis, but pays a
semantic tax: under vmap, per-scene plan regeneration must be gated by ONE
scalar ``lax.cond`` over ``any(regen)`` (a per-scene cond lowers to a
both-branches select), so whenever ANY scene replans, EVERY scene pays the
U-Net + planner. With a trained policy ~80% of poses have at least one
replanning scene (BASELINE.md), so the gate rarely skips.

``shard_map`` restores the reference's true execution model: each device runs
the SINGLE-scene scan program on its own scene block, so the plan branch is a
genuinely scalar per-device ``lax.cond`` — a device plans only when ITS scene
needs to. There are no cross-scene collectives inside a rollout (scenes are
independent, exactly like DDP ranks between gradient syncs), so the program
scales linearly over ICI with zero communication.

Both wrappers reuse the single-scene step functions and padding scheme of
eval/scan_rollout.py and train/scan_collection.py — one compiled program per
configuration; scene arrays, weights, and states are runtime arguments.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..assets.scene_assets import SceneAssets
from ..config import Params
from ..models.fold import fold_bn_variables
from ..models.unet import NBP

_PROGRAM_CACHE = {}


def _mesh_sig(mesh: Mesh, axis: str):
    return (tuple(mesh.axis_names), mesh.devices.shape, axis,
            tuple(d.id for d in mesh.devices.flat))


def _stack(trees):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def _block0(tree):
    """Strip the leading (per-device, size-1) block dimension."""
    return jax.tree.map(lambda x: x[0], tree)


def _unblock(tree):
    return jax.tree.map(lambda x: x[None], tree)


class ShardedScanRollout:
    """Evaluation rollouts sharded one scene per device (DDP analog).

    Requires ``len(assets_list) == mesh.devices.size`` — the point of the
    wrapper is the one-scene-per-device execution model; for more scenes run
    groups of ``n_devices`` (the driver does), for fewer pad the scene list.
    """

    def __init__(self, assets_list: Sequence[SceneAssets], nbp_model: NBP,
                 nbp_variables, mesh: Mesh, mesh_axis: str = "data",
                 params: Optional[Params] = None,
                 interpret: Optional[bool] = None,
                 fold_bn: bool = True):
        from ..eval.scan_rollout import BatchedScanRollout

        n_dev = mesh.devices.size
        if len(assets_list) != n_dev:
            raise ValueError(
                f"ShardedScanRollout needs exactly one scene per device "
                f"(got {len(assets_list)} scenes, {n_dev} devices); run "
                "groups of n_devices scenes or pad the list")
        # Reuse the batched wrapper's scene prep (shared folded weights,
        # common-shape padding, stacked SceneArrays) — only the program
        # construction differs.
        self._batched = BatchedScanRollout(
            assets_list, nbp_model, nbp_variables, params=params,
            interpret=interpret, mesh=None, fold_bn=fold_bn)
        self.mesh = mesh
        self.mesh_axis = mesh_axis
        self._data = NamedSharding(mesh, P(mesh_axis))
        self._repl = NamedSharding(mesh, P())
        self.scene_batch = jax.device_put(self._batched.scene_batch,
                                          self._data)
        self.n_scenes = len(assets_list)

    def _rollout_fn(self, n_poses: int):
        base = self._batched.rollouts[0]
        sig = base._sig() + ("shardmap", self.n_scenes, n_poses,
                             _mesh_sig(self.mesh, self.mesh_axis))
        if sig not in _PROGRAM_CACHE:
            step = base.make_scene_step()
            axis = self.mesh_axis

            def block(scene_blk, variables, state_blk):
                scene = _block0(scene_blk)
                state = _block0(state_blk)

                def body(s, i):
                    return step(scene, variables, s, i)

                final, cov = jax.lax.scan(body, state, jnp.arange(n_poses))
                return _unblock(final), cov[None]

            sm = jax.shard_map(
                block, mesh=self.mesh,
                in_specs=(P(axis), P(), P(axis)),
                out_specs=(P(axis), P(axis)),
                check_vma=False,
            )
            _PROGRAM_CACHE[sig] = jax.jit(sm)
        return _PROGRAM_CACHE[sig]

    def run(self, n_poses: int = 101, seed: int = 8, variables=None):
        """Same contract as BatchedScanRollout.run: a RolloutResult per
        scene (seed + i per scene, matching the batched wrapper)."""
        import time

        from ..eval.nbp_planning import RolloutResult
        from ..ops.coverage import compute_auc

        states = [r.initial_state(seed=seed + i, n_poses=n_poses)
                  for i, r in enumerate(self._batched.rollouts)]
        batched = jax.device_put(_stack(states), self._data)
        if variables is not None and self._batched._fold_bn:
            variables = fold_bn_variables(variables)
        v = variables if variables is not None else (
            self._batched.rollouts[0].variables)
        v = jax.device_put(v, self._repl)
        rollout = self._rollout_fn(n_poses)
        t1 = time.time()
        final, coverage = rollout(self.scene_batch, v, batched)
        coverage = np.asarray(coverage)  # (n_scenes, n_poses)
        wall = time.time() - t1
        results = []
        for i in range(self.n_scenes):
            curve = coverage[i]
            results.append(RolloutResult(
                coverage_evolution=[float(c) for c in curve],
                auc=compute_auc(curve),
                cam_positions=np.asarray(
                    final.traj.xyz[i][: int(final.traj.count[i])]),
                wall_time_s=wall,
                n_points=int(final.pc.count[i]),
                steps_per_sec=self.n_scenes * n_poses / wall,
            ))
        return results


class ShardedScanCollection:
    """Training-rollout collection sharded one scene per device.

    The distributed analog of train/scan_collection.ScanCollection: every
    device runs its scene's full Boltzmann-exploration scan (with its own
    scalar plan gate and early-stop flags), experiences come back stacked
    (n_scenes, n_poses, ...) in one transfer, and suffix labels are mined
    per scene on the host. This is the collection half of the reference's
    DDP trainer (one scene per rank, macarons_utils.py:279-293).
    """

    def __init__(self, assets_list: Sequence[SceneAssets], nbp_model: NBP,
                 mesh: Mesh, mesh_axis: str = "data",
                 params: Optional[Params] = None,
                 interpret: Optional[bool] = None, **kwargs):
        from ..train.scan_collection import ScanCollection

        n_dev = mesh.devices.size
        if len(assets_list) != n_dev:
            raise ValueError(
                f"ShardedScanCollection needs exactly one scene per device "
                f"(got {len(assets_list)} scenes, {n_dev} devices)")
        self._col = ScanCollection(assets_list, nbp_model, params=params,
                                   interpret=interpret, **kwargs)
        self.mesh = mesh
        self.mesh_axis = mesh_axis
        self._data = NamedSharding(mesh, P(mesh_axis))
        self._repl = NamedSharding(mesh, P())
        self.n_scenes = len(assets_list)
        self.scene_batch = jax.device_put(_stack(self._col.scenes),
                                          self._data)
        self.p = self._col.p

    def _rollout_fn(self, n_poses: int):
        sig = self._col._sig() + ("shardmap", self.n_scenes, n_poses,
                                  _mesh_sig(self.mesh, self.mesh_axis))
        if sig not in _PROGRAM_CACHE:
            step = self._col._step
            axis = self.mesh_axis

            def block(scene_blk, variables, state_blk):
                scene = _block0(scene_blk)
                state = _block0(state_blk)

                def body(s, i):
                    return step(scene, variables, s, i)

                final, out = jax.lax.scan(body, state, jnp.arange(n_poses))
                return _unblock(final), _unblock(out)

            sm = jax.shard_map(
                block, mesh=self.mesh,
                in_specs=(P(axis), P(), P(axis)),
                out_specs=(P(axis), P(axis)),
                check_vma=False,
            )
            _PROGRAM_CACHE[sig] = jax.jit(sm)
        return _PROGRAM_CACHE[sig]

    def run_all(self, variables, seeds: Sequence[int], n_poses: int = 100):
        """One sharded launch over all scenes; returns a host CollectOut
        (leading scene dim) matching per-scene ScanCollection.run outputs."""
        assert len(seeds) == self.n_scenes
        fold_only = []
        if self._col._fold_bn:
            original = {id(l) for l in jax.tree.leaves(variables)}
            variables = fold_bn_variables(variables)
            fold_only = [l for l in jax.tree.leaves(variables)
                         if id(l) not in original]
        states = [self._col.initial_state(i, seeds[i], n_poses)
                  for i in range(self.n_scenes)]
        batched = jax.device_put(_stack(states), self._data)
        v = jax.device_put(variables, self._repl)
        rollout = self._rollout_fn(n_poses)
        final, out = rollout(self.scene_batch, v, batched)
        host = jax.tree.map(np.asarray, out)
        for leaf in (jax.tree.leaves(out) + jax.tree.leaves(final)
                     + fold_only):
            try:
                leaf.delete()
            except Exception:
                pass
        return host

    def collect_all(self, variables, db, seed: int = 0,
                    n_poses: int = 100) -> List[List[float]]:
        """Collect every scene in one sharded launch and stream
        suffix-labeled experiences into the replay DB (per-scene analog of
        collect_trajectory_scan). Returns coverage evolutions per scene."""
        from ..train.scan_collection import suffix_labels_from_out

        p = self.p
        seeds = [seed + i for i in range(self.n_scenes)]
        out = self.run_all(variables, seeds, n_poses=n_poses)
        coverages = []
        for s in range(self.n_scenes):
            one = jax.tree.map(lambda x: x[s], out)
            labeled = suffix_labels_from_out(
                one, int(p.value_map_size[0]), tuple(p.prediction_range))
            for pose_i, pixels, gains in labeled:
                db.append(
                    np.transpose(one.model_input[pose_i], (2, 0, 1)),
                    one.gt_obs[pose_i], pixels, gains, pose_i,
                )
            n_valid = int(np.sum(one.valid))
            coverages.append(
                [float(c) for c in np.asarray(one.coverage)
                 [: max(n_valid + 1, 1)]])
        return coverages
