"""NBP supervised training (the reference's train_nbp / train_experience_data
/ validation_model, next_best_path/utility/nbp_utils.py:293-467, and the
epoch driver run_training_nbp, trainers/train_nbp_model.py:40-158).

optax AdamW(1e-3, b1=.9, b2=.999, eps=1e-8, wd=.01) mirrors initialize_nbp
(:228); gradient accumulation 8 via optax.MultiSteps mirrors the reference's
GradScaler loop (:342-393); 5 inner epochs with ReduceLROnPlateau(factor .1,
patience 2) mirror train_nbp (:445-462). Ragged per-experience pixel lists
are padded to a fixed width with zero weights.
"""

from __future__ import annotations

import dataclasses
import functools
import random
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Params, default_params
from ..models.unet import NBP, nbp_loss
from .replay import Experience, ReplayDB

MAX_PIXELS = 128  # pad width for per-experience target pixel lists
# (a 100-pose rollout can label up to ~99 suffix pixels per early state;
# 64 silently dropped the tail for the first third of each trajectory)
MICRO_BATCH = 8  # fixed device batch: one compile, fits v5e HBM at 256^2


def make_optimizer(lr: float = 1e-3, weight_decay: float = 0.01,
                   accumulation_steps: int = 7):
    """AdamW + gradient accumulation + host-controlled LR scale."""
    opt = optax.inject_hyperparams(optax.adamw)(
        learning_rate=lr, b1=0.9, b2=0.999, eps=1e-8,
        weight_decay=weight_decay,
    )
    return optax.MultiSteps(opt, every_k_schedule=accumulation_steps)


@dataclasses.dataclass
class TrainState:
    variables: Any          # {params, batch_stats}
    opt_state: Any
    optimizer: Any
    lr: float


def init_train_state(model: NBP, key, lr: float = 1e-3,
                     accumulation_steps: int = 7) -> TrainState:
    """accumulation_steps counts MICRO batches: the default 7 x micro 8
    reconstructs the reference's logical batch of 56 per optimizer step
    (nbp_batch_size, configs/nbp/...json:154). For the reference's extra
    8-batch GradScaler accumulation (effective 448) pass 56."""
    x = jnp.zeros((1, 256, 256, 5))
    variables = jax.jit(lambda k, xx: model.init(k, xx, train=True))(key, x)
    optimizer = make_optimizer(lr=lr, accumulation_steps=accumulation_steps)
    opt_state = optimizer.init(variables["params"])
    return TrainState(variables=variables, opt_state=opt_state,
                      optimizer=optimizer, lr=lr)


def _batch_arrays(batch: List[Experience],
                  pad_to: Optional[int] = None) -> Dict[str, np.ndarray]:
    """Fixed-shape batch arrays; rows beyond len(batch) are zero-weighted
    padding (one compiled program regardless of ragged batch tails)."""
    B = pad_to or len(batch)
    S = batch[0].gt_layout.shape[0]
    x = np.zeros((B, S, S, 5), np.float32)
    layout = np.zeros((B, S, S, 1), np.float32)
    pixels = np.zeros((B, MAX_PIXELS, 3), np.int32)
    gains = np.zeros((B, MAX_PIXELS), np.float32)
    weights = np.zeros((B, MAX_PIXELS), np.float32)
    sample_w = np.zeros((B,), np.float32)
    for i, e in enumerate(batch):
        x[i] = e.model_input.astype(np.float32).transpose(1, 2, 0)
        layout[i, :, :, 0] = e.gt_layout.astype(np.float32)
        k = min(len(e.gains), MAX_PIXELS)
        pixels[i, :k] = e.pixels[:k]
        gains[i, :k] = e.gains[:k]
        weights[i, :k] = 1.0
        sample_w[i] = 1.0
    return dict(x=x, layout=layout, pixels=pixels, gains=gains,
                weights=weights, sample_weight=sample_w)


def _gather_pred_values(value_map: jnp.ndarray, pixels: jnp.ndarray):
    """value_map (B, S, S, 8) NHWC; pixels (B, K, 3) = (rot, row, col).

    The reference indexes NCHW value_map[b, rot, row, col]
    (nbp_utils.py:380-381); NHWC equivalent below.
    """
    b_idx = jnp.arange(value_map.shape[0])[:, None]
    return value_map[b_idx, pixels[..., 1], pixels[..., 2], pixels[..., 0]]


@functools.partial(jax.jit, static_argnames=("model", "optimizer"))
def _train_step(model: NBP, optimizer, variables, opt_state, lr_scale, batch):
    def loss_fn(params):
        (vm, om), mutated = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch["x"], train=True, mutable=["batch_stats"],
        )
        pred_vals = _gather_pred_values(vm, batch["pixels"])
        loss = nbp_loss(params["log_vars"], pred_vals, batch["gains"],
                        om, batch["layout"], value_weight=batch["weights"],
                        sample_weight=batch["sample_weight"])
        return loss, mutated

    (loss, mutated), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"]
    )
    grads = jax.tree.map(lambda g: g * lr_scale, grads)
    updates, opt_state = optimizer.update(grads, opt_state,
                                          variables["params"])
    params = optax.apply_updates(variables["params"], updates)
    new_vars = {"params": params, "batch_stats": mutated["batch_stats"]}
    return new_vars, opt_state, loss


@functools.partial(jax.jit, static_argnames=("model",))
def _eval_step(model: NBP, variables, batch):
    vm, om = model.apply(variables, batch["x"], train=False)
    pred_vals = _gather_pred_values(vm, batch["pixels"])
    w = batch["weights"]
    mse = jnp.sum(((pred_vals - batch["gains"]) ** 2) * w) / jnp.maximum(
        jnp.sum(w), 1.0)
    eps = 1e-7
    p_clip = jnp.clip(om, eps, 1 - eps)
    bce_map = -(batch["layout"] * jnp.log(p_clip)
                + (1 - batch["layout"]) * jnp.log(1 - p_clip))
    per_sample = jnp.mean(bce_map.reshape(bce_map.shape[0], -1), axis=-1)
    sw = batch["sample_weight"]
    bce = jnp.sum(per_sample * sw) / jnp.maximum(jnp.sum(sw), 1.0)
    return mse + bce


def train_epoch(model: NBP, state: TrainState, data: List[Experience],
                batch_size: int, current_epoch: int,
                rng: random.Random,
                micro_batch: int = MICRO_BATCH) -> Tuple[TrainState, float]:
    """One pass over the data (train_experience_data, nbp_utils.py:340-428).

    Logical batches of `batch_size` are processed as fixed-shape micro
    batches of `micro_batch` (gradient accumulation through optax.MultiSteps
    handles the averaging; fixed shapes keep a single compiled program and
    fit the 55M-param U-Net in v5e HBM).
    """
    rng.shuffle(data)
    micro = min(micro_batch, batch_size)
    losses = []
    for i in range(0, len(data), batch_size):
        batch = [
            e for e in data[i: i + batch_size]
            if (e.pose_i > 10 and current_epoch == 1) or current_epoch > 1
        ]
        if not batch:
            continue
        for j in range(0, len(batch), micro):
            arrays = {
                k: jnp.asarray(v)
                for k, v in _batch_arrays(batch[j: j + micro],
                                          pad_to=micro).items()
            }
            new_vars, new_opt, loss = _train_step(
                model, state.optimizer, state.variables, state.opt_state,
                jnp.float32(1.0), arrays,
            )
            state = dataclasses.replace(state, variables=new_vars,
                                        opt_state=new_opt)
            losses.append(float(loss))
    return state, float(np.mean(losses)) if losses else 0.0


def validate(model: NBP, state: TrainState, data: List[Experience],
             batch_size: int, micro_batch: int = MICRO_BATCH) -> float:
    micro = min(micro_batch, batch_size)
    losses = []
    for i in range(0, len(data), micro):
        batch = data[i: i + micro]
        arrays = {k: jnp.asarray(v)
                  for k, v in _batch_arrays(batch, pad_to=micro).items()}
        losses.append(float(_eval_step(model, state.variables, arrays)))
    return float(np.mean(losses)) if losses else 0.0


class PlateauScheduler:
    """ReduceLROnPlateau(mode=min, factor, patience) on the host."""

    def __init__(self, factor: float = 0.1, patience: int = 2):
        self.factor = factor
        self.patience = patience
        self.best = float("inf")
        self.bad = 0

    def step(self, metric: float, lr: float) -> float:
        if metric < self.best:
            self.best = metric
            self.bad = 0
            return lr
        self.bad += 1
        if self.bad > self.patience:
            self.bad = 0
            return lr * self.factor
        return lr


def train_nbp(model: NBP, state: TrainState, db: ReplayDB,
              validation_data: List[Experience], current_epoch: int,
              params: Optional[Params] = None, num_epochs: int = 5,
              seed: int = 0, verbose: bool = True
              ) -> Tuple[TrainState, float, float]:
    """5 inner epochs over combined replay data (train_nbp,
    nbp_utils.py:430-467)."""
    p = params or default_params()
    rng = random.Random(seed)
    if current_epoch == 1:
        data = db.read_combined(last_n=None)
    else:
        data = db.read_combined()
    sched = PlateauScheduler()
    lr = state.lr
    train_losses, val_losses = [], []
    for e in range(num_epochs):
        state, tl = train_epoch(model, state, list(data),
                                int(p.nbp_batch_size), current_epoch, rng)
        vl = validate(model, state, validation_data, int(p.nbp_batch_size))
        train_losses.append(tl)
        val_losses.append(vl)
        new_lr = sched.step(vl, lr)
        if new_lr != lr:
            lr = new_lr
            state.opt_state.inner_opt_state.hyperparams["learning_rate"] = (
                jnp.asarray(lr)
            )
        if verbose:
            print(f"  inner epoch {e + 1}: train {tl:.4f} val {vl:.4f} lr {lr:.2e}")
    state = dataclasses.replace(state, lr=lr)
    return state, float(np.mean(train_losses)), float(np.mean(val_losses))
