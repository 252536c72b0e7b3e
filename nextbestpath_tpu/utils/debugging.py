"""Debug aids: NaN guards and gradient checks.

The reference's debug toolkit (SURVEY.md §5.2): anomaly_detection config
knob, check_gradients (macarons/utility/utils.py:188-198),
reload_previous_model_if_bad_loss / loss_peak_threshold
(configs/nbp/...json:14-15). TPU equivalents below.
"""

from __future__ import annotations

import contextlib
from typing import Any, Dict, Optional

import jax
import numpy as np


@contextlib.contextmanager
def anomaly_detection(enabled: bool = True):
    """jax_debug_nans context (the torch.autograd anomaly-mode analog)."""
    if not enabled:
        yield
        return
    prev = jax.config.read("jax_debug_nans")
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def check_gradients(grads: Any, verbose: bool = True) -> Dict[str, float]:
    """Report NaN/zero/huge gradient leaves (check_gradients analog)."""
    report = {"n_leaves": 0, "n_nan": 0, "n_zero": 0, "max_abs": 0.0}
    for path, g in jax.tree_util.tree_flatten_with_path(grads)[0]:
        report["n_leaves"] += 1
        g = np.asarray(g)
        if np.isnan(g).any():
            report["n_nan"] += 1
            if verbose:
                print(f"NaN gradient at {jax.tree_util.keystr(path)}")
        if (g == 0).all():
            report["n_zero"] += 1
        report["max_abs"] = max(report["max_abs"], float(np.abs(g).max()))
    return report


class BadLossGuard:
    """reload_previous_model_if_bad_loss: keep the last-good params and roll
    back when the loss spikes above threshold x the running mean."""

    def __init__(self, peak_threshold: float = 10.0, warmup: int = 10):
        self.peak_threshold = peak_threshold
        self.warmup = warmup
        self.history = []
        self.last_good = None

    def update(self, loss: float, params: Any):
        if (len(self.history) >= self.warmup
                and loss > self.peak_threshold * np.mean(self.history[-20:])):
            return self.last_good if self.last_good is not None else params, True
        self.history.append(loss)
        self.last_good = params
        return params, False
