"""Checkpointing (flax serialization; the torch.save analog).

Reference: best-val + every-3-epochs checkpoints with model & optimizer state
(train_nbp_model.py:124-149), loaded at test time (nbp_planning.py:406-409).
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict

from flax import serialization


def save_checkpoint(path: str, variables: Any, opt_state: Any = None,
                    epoch: int = 0, extra: Dict[str, Any] | None = None) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "epoch": epoch,
        "variables": serialization.to_bytes(variables),
        "extra": extra or {},
    }
    if opt_state is not None:
        payload["opt_state"] = serialization.to_bytes(opt_state)
    # Atomic write: a kill mid-save must never corrupt the resume contract
    # (and concurrent readers always see a complete file).
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, path)


def load_checkpoint(path: str, variables_template: Any,
                    opt_state_template: Any = None):
    with open(path, "rb") as f:
        payload = pickle.load(f)
    variables = serialization.from_bytes(variables_template,
                                         payload["variables"])
    opt_state = None
    if opt_state_template is not None and "opt_state" in payload:
        opt_state = serialization.from_bytes(opt_state_template,
                                             payload["opt_state"])
    return variables, opt_state, payload["epoch"], payload.get("extra", {})
