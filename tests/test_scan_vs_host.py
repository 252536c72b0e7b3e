"""Scan-vs-host rollout equivalence (VERDICT round 1, weak #6).

The jitted lax.scan rollout and the host-orchestrated rollout implement the
same planner; their coverage curves on the same scene from the same start
must track each other. Exact equality is not expected — the two drivers
consume independent RNG streams (subsample keys, random rotations), so the
assertion is on curve agreement, not bitwise identity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nextbestpath_tpu.assets import generate_scene, pack_generated_scene
from nextbestpath_tpu.config import default_params
from nextbestpath_tpu.eval.nbp_planning import NBPPlanningRollout
from nextbestpath_tpu.eval.scan_rollout import ScanRollout
from nextbestpath_tpu.models import NBP
from nextbestpath_tpu.ops.coverage import compute_auc


@pytest.mark.slow
def test_scan_tracks_host_rollout():
    params = default_params(
        image_height=32, image_width=56, points_per_frame=256,
        full_pc_capacity=65536, n_gt_surface_points=2048, max_path_len=32,
        pc2img_size=[64, 64], value_map_size=[16, 16],
    )
    assets = pack_generated_scene(generate_scene("simple", seed=4),
                                  params=params)
    model = NBP()
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 5)))
    # Open the untrained obstacle decoder (sigmoid(0)=0.5 blocks everything;
    # bench.py does the same for the same reason).
    variables = jax.tree_util.tree_map(lambda x: x, variables)
    params_dict = dict(variables["params"])
    f2 = dict(params_dict["final2"])
    c0 = dict(f2["Conv_0"])
    c0["bias"] = c0["bias"] - 4.0
    f2["Conv_0"] = c0
    params_dict["final2"] = f2
    variables = {"params": params_dict,
                 "batch_stats": variables["batch_stats"]}

    n_poses = 20
    scan = ScanRollout(assets, model, variables, params=params)
    res_scan = scan.run(n_poses=n_poses, seed=8)

    host = NBPPlanningRollout(assets, model, variables, params=params, seed=8)
    res_host = host.run(n_poses=n_poses)

    c_scan = np.asarray(res_scan.coverage_evolution)
    c_host = np.asarray(res_host.coverage_evolution)
    assert len(c_scan) == len(c_host) == n_poses
    # Both agents explore the same scene from the same start with the same
    # planner; their coverage curves must land in the same regime.
    assert abs(compute_auc(c_scan) - compute_auc(c_host)) < 0.15
    assert abs(c_scan[-1] - c_host[-1]) < 0.25
    # And both must actually explore (curves rise from the first pose).
    assert c_scan[-1] > c_scan[0] + 0.02
    assert c_host[-1] > c_host[0] + 0.02
