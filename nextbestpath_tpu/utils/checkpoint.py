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
    # (and concurrent readers always see a complete file). The tmp name is
    # per-process — a shared '.tmp' would let two concurrent savers
    # interleave writes and rename a corrupt mixture over the checkpoint —
    # and the data is fsynced before the rename so a crash between the two
    # can't surface a zero-length file.
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def load_checkpoint(path: str, variables_template: Any,
                    opt_state_template: Any = None):
    with open(path, "rb") as f:
        payload = pickle.load(f)
    variables = serialization.from_bytes(variables_template,
                                         payload["variables"])
    opt_state = None
    if opt_state_template is not None:
        if "opt_state" not in payload:
            # Callers that pass a template are resuming and would crash on
            # None downstream with an opaque AttributeError; name the
            # actual problem (e.g. a variables-only best_val checkpoint
            # copied over the latest one).
            raise ValueError(
                f"{path} has no optimizer state: it was saved "
                "variables-only (best-val style) and cannot seed a resume; "
                "use init_from/--init-weights to warm-start instead")
        opt_state = serialization.from_bytes(opt_state_template,
                                             payload["opt_state"])
    return variables, opt_state, payload["epoch"], payload.get("extra", {})
