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
    """AdamW + gradient accumulation; the LR is controlled by mutating the
    injected hyperparam (train_nbp below)."""
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


def _bucket(n: int) -> int:
    """Pad dataset length to a power-of-two bucket: one compiled gather/train
    program per bucket instead of one per epoch-dependent length."""
    return max(256, 1 << max(n - 1, 1).bit_length())


def build_device_dataset(data: List[Experience],
                         pad_cap: Optional[int] = None):
    """Stack a replay slice into ONE device-resident dataset.

    The per-micro-step host->device transfer (13 MB/step through the remote
    tunnel) dominated round 2's first training attempt; staging the epoch's
    data once (f16 inputs, u8 layouts) and gathering micro batches by index
    on device makes the inner loop compute-bound. Returns ({arrays}, n)."""
    import jax.numpy as jnp

    N = len(data)
    cap = pad_cap or _bucket(N)
    S = data[0].gt_layout.shape[0]
    x = np.zeros((cap, S, S, 5), np.float16)
    layout = np.zeros((cap, S, S), np.uint8)
    pixels = np.zeros((cap, MAX_PIXELS, 3), np.int32)
    gains = np.zeros((cap, MAX_PIXELS), np.float32)
    pweights = np.zeros((cap, MAX_PIXELS), np.float32)
    n_dropped = 0
    for i, e in enumerate(data):
        x[i] = e.model_input.transpose(1, 2, 0)
        layout[i] = e.gt_layout
        k = min(len(e.gains), MAX_PIXELS)
        n_dropped += len(e.gains) - k
        pixels[i, :k] = e.pixels[:k]
        gains[i, :k] = e.gains[:k]
        pweights[i, :k] = 1.0
    if n_dropped:
        # Rollouts longer than ~MAX_PIXELS poses can mine more suffix
        # pixels per early state than the pad width holds; never drop the
        # tail silently (the old 64 cap did, biasing value targets for the
        # first third of each trajectory).
        import sys

        print(f"WARNING: build_device_dataset dropped {n_dropped} target "
              f"pixels past the MAX_PIXELS={MAX_PIXELS} pad width "
              "(raise it for longer rollouts)", file=sys.stderr)
    ds = dict(x=jnp.asarray(x), layout=jnp.asarray(layout),
              pixels=jnp.asarray(pixels), gains=jnp.asarray(gains),
              pweights=jnp.asarray(pweights))
    return ds, N


def _gather_pred_values(value_map: jnp.ndarray, pixels: jnp.ndarray):
    """value_map (B, S, S, 8) NHWC; pixels (B, K, 3) = (rot, row, col).

    The reference indexes NCHW value_map[b, rot, row, col]
    (nbp_utils.py:380-381); NHWC equivalent below.
    """
    b_idx = jnp.arange(value_map.shape[0])[:, None]
    return value_map[b_idx, pixels[..., 1], pixels[..., 2], pixels[..., 0]]


@functools.partial(jax.jit, static_argnames=("model", "optimizer"),
                   donate_argnums=(2, 3))
def _train_step_ds(model: NBP, optimizer, variables, opt_state,
                   ds, idx, sw):
    """One micro step gathered from the device-resident dataset.

    ds: build_device_dataset arrays; idx (B,) entry indices; sw (B,) row
    weights (0 for padded tail rows)."""
    x = ds["x"][idx].astype(jnp.float32)
    layout = ds["layout"][idx].astype(jnp.float32)[..., None]
    pixels = ds["pixels"][idx]
    gains = ds["gains"][idx]
    weights = ds["pweights"][idx] * sw[:, None]

    def loss_fn(params):
        (vm, om), mutated = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
        )
        pred_vals = _gather_pred_values(vm, pixels)
        loss = nbp_loss(params["log_vars"], pred_vals, gains,
                        om, layout, value_weight=weights, sample_weight=sw)
        return loss, mutated

    (loss, mutated), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"]
    )
    updates, opt_state = optimizer.update(grads, opt_state,
                                          variables["params"])
    params = optax.apply_updates(variables["params"], updates)
    new_vars = {"params": params, "batch_stats": mutated["batch_stats"]}
    return new_vars, opt_state, loss


@functools.partial(jax.jit, static_argnames=("model",))
def _eval_step_ds(model: NBP, variables, ds, idx, sw):
    x = ds["x"][idx].astype(jnp.float32)
    layout = ds["layout"][idx].astype(jnp.float32)[..., None]
    vm, om = model.apply(variables, x, train=False)
    pred_vals = _gather_pred_values(vm, ds["pixels"][idx])
    w = ds["pweights"][idx] * sw[:, None]
    mse = jnp.sum(((pred_vals - ds["gains"][idx]) ** 2) * w) / jnp.maximum(
        jnp.sum(w), 1.0)
    eps = 1e-7
    p_clip = jnp.clip(om, eps, 1 - eps)
    bce_map = -(layout * jnp.log(p_clip)
                + (1 - layout) * jnp.log(1 - p_clip))
    per_sample = jnp.mean(bce_map.reshape(bce_map.shape[0], -1), axis=-1)
    bce = jnp.sum(per_sample * sw) / jnp.maximum(jnp.sum(sw), 1.0)
    return mse + bce


def _micro_chunks(indices: List[int], micro: int,
                  rng: Optional[random.Random] = None):
    """(idx (micro,), sw (micro,)) chunks; ragged tails zero-weighted.

    Tail rows still flow through BatchNorm batch statistics in training
    (sw only zeroes their loss), so with an rng they are filled with
    random draws from the pool — always padding with entry 0 would skew
    that step's normalization and the running-stats EMA toward one sample
    every epoch."""
    for j in range(0, len(indices), micro):
        chunk = indices[j: j + micro]
        n_pad = micro - len(chunk)
        if n_pad and rng is not None:
            pad = [indices[rng.randrange(len(indices))] for _ in range(n_pad)]
        else:
            pad = [indices[0] if indices else 0] * n_pad
        sw = np.zeros((micro,), np.float32)
        sw[: len(chunk)] = 1.0
        yield jnp.asarray(np.asarray(list(chunk) + pad, np.int32)), (
            jnp.asarray(sw))


def train_epoch_ds(model: NBP, state: TrainState, ds, index_pool: List[int],
                   rng: random.Random, micro_batch: int = MICRO_BATCH
                   ) -> Tuple[TrainState, float]:
    """One pass over the staged dataset (train_experience_data,
    nbp_utils.py:340-428). Gradient accumulation to the logical batch runs
    through optax.MultiSteps; every transfer is a (micro,) index vector."""
    pool = list(index_pool)
    rng.shuffle(pool)
    losses = []
    for idx, sw in _micro_chunks(pool, micro_batch, rng=rng):
        new_vars, new_opt, loss = _train_step_ds(
            model, state.optimizer, state.variables, state.opt_state,
            ds, idx, sw,
        )
        state = dataclasses.replace(state, variables=new_vars,
                                    opt_state=new_opt)
        losses.append(loss)
    return state, float(np.mean([float(l) for l in losses])) if losses else 0.0


def validate_ds(model: NBP, state: TrainState, ds, n: int,
                micro_batch: int = MICRO_BATCH) -> float:
    losses = []
    for idx, sw in _micro_chunks(list(range(n)), micro_batch):
        losses.append(_eval_step_ds(model, state.variables, ds, idx, sw))
    return float(np.mean([float(l) for l in losses])) if losses else 0.0


def _epoch_pool(data: List[Experience], current_epoch: int) -> List[int]:
    """Trainable indices; the reference's epoch-1 rule skips samples with
    pose_i <= 10 (nbp_utils.py:352)."""
    return [i for i, e in enumerate(data)
            if (e.pose_i > 10 and current_epoch == 1) or current_epoch > 1]


def release_device_dataset(ds) -> None:
    """Explicitly free a staged dataset's device buffers. Dropping Python
    refs is not enough on the remote-TPU backend: the client keeps
    host-side mirrors of transferred buffers until explicit deletion
    (~7 GB/epoch of staging accumulated to a host OOM at reference
    scale)."""
    for v in ds.values():
        try:
            v.delete()
        except Exception:
            pass


def train_epoch(model: NBP, state: TrainState, data: List[Experience],
                batch_size: int, current_epoch: int,
                rng: random.Random,
                micro_batch: int = MICRO_BATCH) -> Tuple[TrainState, float]:
    """List-API wrapper: stage `data` on device, run one epoch, release."""
    ds, n = build_device_dataset(data)
    pool = _epoch_pool(data, current_epoch)
    micro = min(micro_batch, batch_size)
    try:
        return train_epoch_ds(model, state, ds, pool, rng, micro_batch=micro)
    finally:
        release_device_dataset(ds)


# One cached staged validation set. The cache entry RETAINS the list object
# and compares by identity — keying on a bare id() served a stale device
# dataset when CPython recycled a freed list's id across runs in the same
# process (tools/finetune_per_level.py runs four trainings per process).
_VAL_DS_CACHE: List[Tuple[Any, int, List[Experience]]] = []


def validate(model: NBP, state: TrainState, data: List[Experience],
             batch_size: int, micro_batch: int = MICRO_BATCH) -> float:
    if not data:
        return 0.0
    if not (_VAL_DS_CACHE and _VAL_DS_CACHE[0][2] is data):
        if _VAL_DS_CACHE:
            release_device_dataset(_VAL_DS_CACHE[0][0])
            _VAL_DS_CACHE.clear()
        ds, n = build_device_dataset(data)
        _VAL_DS_CACHE.append((ds, n, data))
    ds, n, _ = _VAL_DS_CACHE[0]
    return validate_ds(model, state, ds, n,
                       micro_batch=min(micro_batch, batch_size))


class PlateauScheduler:
    """ReduceLROnPlateau(mode=min, factor, patience) on the host.

    min_lr floors the decay (torch defaults to 0; with a small/noisy
    validation set, patience-2 over 5 inner epochs x tens of outer epochs
    would decay the LR to nothing and freeze the run — delta documented).
    The floor is 1e-4: runs at this scale validate on a few hundred samples,
    where inner-epoch val noise trips the plateau long before the policy has
    converged (measured: decay to 1e-5 by outer epoch 5 while held-out eval
    AUC was still climbing)."""

    def __init__(self, factor: float = 0.1, patience: int = 2,
                 min_lr: float = 1e-4):
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
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
            return max(lr * self.factor, self.min_lr)
        return lr


class EarlyStopping:
    """Patience/min-delta early stopping (EarlyStopping, nbp_utils.py:180-199;
    defined by the reference for the NBP trainer, available here on the same
    terms). Call with each validation loss; ``early_stop`` latches True after
    ``patience`` non-improving calls."""

    def __init__(self, patience: int = 5, min_delta: float = 0.2):
        self.patience = patience
        self.min_delta = min_delta
        self.counter = 0
        self.best_loss = float("inf")
        self.early_stop = False

    def __call__(self, val_loss: float) -> bool:
        if self.best_loss - val_loss > self.min_delta:
            self.best_loss = val_loss
            self.counter = 0
        else:
            self.counter += 1
            if self.counter >= self.patience:
                self.early_stop = True
        return self.early_stop


def count_parameters(variables) -> int:
    """Trainable parameter count (count_parameters, nbp_utils.py:201-202)."""
    import numpy as _np

    return sum(int(_np.prod(p.shape))
               for p in jax.tree.leaves(variables["params"]))


def train_nbp(model: NBP, state: TrainState, db: ReplayDB,
              validation_data: List[Experience], current_epoch: int,
              params: Optional[Params] = None, num_epochs: int = 5,
              seed: int = 0, verbose: bool = True
              ) -> Tuple[TrainState, float, float]:
    """5 inner epochs over combined replay data (train_nbp,
    nbp_utils.py:430-467)."""
    p = params or default_params()
    # Callers pass an epoch-dependent seed: a fixed stream would re-sample
    # the same "random" older entries and replay the same shuffle
    # permutations every outer epoch.
    rng = random.Random(seed)
    # Bounded slice (newest 4608 + sampled 2048 older) so the staged device
    # dataset fits HBM next to model/optimizer/activations. This bound now
    # applies to epoch 1 too: the reference's epoch-1 pass reads the ENTIRE
    # replay DB (read_combined_data full scan, nbp_utils.py:101-141), but
    # with 64-scene collection epochs that staged 16384 f16 slots = 10.7 GB
    # of arguments plus a ~5 GB gather-relayout temp on a 15.75 GB chip —
    # compile-time HBM OOM (round-5 diversity retrain, epoch 1). At the
    # reference's own scale (a few scenes) the bound exceeds the whole DB,
    # so behavior only changes where the unbounded read could not run.
    data = db.read_combined(last_n=4608, sample_size=2048, rng=rng)
    sched = PlateauScheduler()
    lr = state.lr
    train_losses, val_losses = [], []
    # Stage the slice on device ONCE for all inner epochs (f16/u8 arrays;
    # micro steps gather by index — no per-step host transfers).
    ds, _ = build_device_dataset(data)
    pool = _epoch_pool(data, current_epoch)
    micro = min(MICRO_BATCH, int(p.nbp_batch_size))
    for e in range(num_epochs):
        state, tl = train_epoch_ds(model, state, ds, pool, rng,
                                   micro_batch=micro)
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
    release_device_dataset(ds)
    import gc

    gc.collect()
    return state, float(np.mean(train_losses)), float(np.mean(val_losses))
