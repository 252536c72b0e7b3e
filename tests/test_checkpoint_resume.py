"""Full-state checkpointing: variables + optimizer state + lr/epoch extras
survive a save/load roundtrip (the resume contract of
run_training_nbp_scan)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from nextbestpath_tpu.models import NBP
from nextbestpath_tpu.train.train_nbp import init_train_state
from nextbestpath_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def test_checkpoint_roundtrip_with_opt_state(tmp_path):
    model = NBP(width=8)
    state = init_train_state(model, jax.random.PRNGKey(0), lr=1e-3)
    # Mutate something so the roundtrip is non-trivial.
    params = dict(state.variables["params"])
    params["log_vars"] = params["log_vars"] + 1.5
    variables = {"params": params, "batch_stats": state.variables["batch_stats"]}

    path = os.path.join(tmp_path, "ck.ckpt")
    save_checkpoint(path, variables, opt_state=state.opt_state, epoch=7,
                    extra={"lr": 2e-4, "best_val": 1.25})

    fresh = init_train_state(model, jax.random.PRNGKey(1), lr=1e-3)
    loaded_vars, loaded_opt, epoch, extra = load_checkpoint(
        path, fresh.variables, fresh.opt_state)
    assert epoch == 7
    assert extra["lr"] == 2e-4 and extra["best_val"] == 1.25
    np.testing.assert_allclose(np.asarray(loaded_vars["params"]["log_vars"]),
                               np.asarray(variables["params"]["log_vars"]))
    # Optimizer state tree restored leaf-for-leaf.
    a = jax.tree.leaves(loaded_opt)
    b = jax.tree.leaves(state.opt_state)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))
