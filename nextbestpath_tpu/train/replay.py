"""Experience replay store (host side).

Replaces the reference's LMDB + msgpack_numpy experience DB
(next_best_path/utility/nbp_utils.py:32-141, train_nbp_model.py:61-63) with
an in-process store + npz persistence. Schema is identical:

    current_model_input    (1, 5, 256, 256) f32  (stored f16 — counts < 2048
                                                  are exactly representable)
    current_gt_2d_layout   (1, 1, 256, 256) f32  (stored u8 — binary)
    target_value_map_pixel (k, 3) i32            (rot, row, col)
    actual_coverage_gain   (k,) f32
    pose_i                 int

Reader utilities mirror the reference's sampling scheme:
- store_validation_data (:77-99): every-Nth entry moved out as validation,
- read_combined_data (:101-141): the newest `last_n` entries plus a random
  sample of the older ones.
"""

from __future__ import annotations

import dataclasses
import math
import os
import random
from typing import Any, Dict, List, Optional

import numpy as np


@dataclasses.dataclass
class Experience:
    model_input: np.ndarray   # (5, 256, 256) f16
    gt_layout: np.ndarray     # (256, 256) u8
    pixels: np.ndarray        # (k, 3) i32
    gains: np.ndarray         # (k,) f32
    pose_i: int


class ReplayDB:
    def __init__(self, path: Optional[str] = None):
        self.path = path
        self.entries: List[Experience] = []
        if path and os.path.exists(path):
            self.load(path)

    def __len__(self) -> int:
        return len(self.entries)

    def append(self, model_input: np.ndarray, gt_layout: np.ndarray,
               pixels: np.ndarray, gains: np.ndarray, pose_i: int) -> None:
        mi = np.asarray(model_input, np.float16)
        gl = np.asarray(gt_layout, np.uint8)
        assert mi.ndim == 3 and mi.shape[0] in (5,), mi.shape  # (C, S, S)
        assert gl.shape == mi.shape[1:], (gl.shape, mi.shape)
        self.entries.append(
            Experience(
                model_input=mi,
                gt_layout=gl,
                pixels=np.asarray(pixels, np.int32).reshape(-1, 3),
                gains=np.asarray(gains, np.float32).reshape(-1),
                pose_i=int(pose_i),
            )
        )

    def extract_validation(self, num: int = 1200) -> List[Experience]:
        """Move every-Nth entry out into a validation set
        (store_validation_data, nbp_utils.py:77-99).

        Min stride 4: the reference carves 1200 out of a DB tens of times
        larger, so its stride is always >> 1; on small runs (few scenes) a
        naive ceil() would move EVERY entry to validation and leave epoch 0's
        data out of training entirely."""
        if not self.entries:
            return []
        n = max(math.ceil(len(self.entries) / num), 4)
        val, keep = [], []
        for i, e in enumerate(self.entries):
            if i % n == 0 and len(val) < num:
                val.append(e)
            else:
                keep.append(e)
        self.entries = keep
        return val

    def read_combined(self, last_n: int = 4608, sample_size: int = 4352,
                      rng: Optional[random.Random] = None) -> List[Experience]:
        """Newest last_n + random sample_size of the older entries
        (read_combined_data, nbp_utils.py:101-141)."""
        rng = rng or random.Random(0)
        if last_n is None or len(self.entries) <= last_n:
            return list(self.entries)
        old = self.entries[:-last_n]
        sampled = rng.sample(old, min(sample_size, len(old)))
        return sampled + self.entries[-last_n:]

    # -- persistence ------------------------------------------------------

    @staticmethod
    def _pack(entries: List[Experience]) -> Dict[str, Any]:
        """One npz-ready dict per entry list (single packing scheme for
        every persistence path)."""
        arrays: Dict[str, Any] = {"n": np.asarray(len(entries))}
        for i, e in enumerate(entries):
            arrays[f"mi_{i}"] = e.model_input
            arrays[f"gl_{i}"] = e.gt_layout
            arrays[f"px_{i}"] = e.pixels
            arrays[f"gn_{i}"] = e.gains
            arrays[f"pi_{i}"] = np.asarray(e.pose_i)
        return arrays

    def save_entries(self, path: str, entries: List[Experience]) -> None:
        """Write a slice of entries as one uncompressed npz (fast on the
        single-core box; used for per-epoch incremental persistence)."""
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.savez(path, **self._pack(entries))

    def save_epoch(self, db_dir: str, epoch: int, start: int) -> int:
        """Persist entries[start:] as <db_dir>/epoch_<epoch>.npz; returns the
        new high-water mark."""
        self.save_entries(os.path.join(db_dir, f"epoch_{epoch:04d}.npz"),
                          self.entries[start:])
        return len(self.entries)

    def load_dir(self, db_dir: str, max_epoch: Optional[int] = None) -> int:
        """Load epoch_*.npz shards (sorted) into the store.

        max_epoch: skip shards from epochs AFTER it. A resume must pass the
        resumed checkpoint's epoch here — shards past it are leftovers from
        a longer previous run (or from an epoch whose checkpoint never
        landed) and loading them would silently mix another policy's data
        into the store as the "newest" entries."""
        if not os.path.isdir(db_dir):
            return 0
        n_loaded = 0
        for fname in sorted(os.listdir(db_dir)):
            if not (fname.startswith("epoch_") and fname.endswith(".npz")):
                continue
            if max_epoch is not None:
                try:
                    shard_epoch = int(fname[len("epoch_"):-len(".npz")])
                except ValueError:
                    shard_epoch = None
                if shard_epoch is not None and shard_epoch > max_epoch:
                    continue
            with np.load(os.path.join(db_dir, fname)) as z:
                n = int(z["n"])
                for i in range(n):
                    self.entries.append(Experience(
                        model_input=z[f"mi_{i}"], gt_layout=z[f"gl_{i}"],
                        pixels=z[f"px_{i}"], gains=z[f"gn_{i}"],
                        pose_i=int(z[f"pi_{i}"]),
                    ))
                n_loaded += n
        return n_loaded

    def save(self, path: Optional[str] = None) -> None:
        """Full-store snapshot, uncompressed: the legacy epoch driver calls
        this every epoch on a growing store, and zlib over gigabytes of
        f16/u8 arrays (which barely compress) dominated late-epoch wall
        time on the single-core box."""
        path = path or self.path
        assert path is not None
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.savez(path, **self._pack(self.entries))

    def save_native(self, path: str) -> None:
        """Persist through the native record store (one incremental record
        per experience — the LMDB-analog tier, native/replay_store.cpp).
        Requires the built library (replay_native.native_available())."""
        from .replay_native import NativeReplayStore

        store = NativeReplayStore(path)
        for i in range(len(store), len(self.entries)):
            store.append(self.entries[i])
        store.close()

    def load_native(self, path: str) -> int:
        """Load every record from a native store file; returns the count."""
        from .replay_native import NativeReplayStore

        store = NativeReplayStore(path)
        loaded = store.read_all()
        self.entries.extend(loaded)
        store.close()
        return len(loaded)

    def load(self, path: str) -> None:
        with np.load(path) as z:
            n = int(z["n"])
            self.entries = [
                Experience(
                    model_input=z[f"mi_{i}"],
                    gt_layout=z[f"gl_{i}"],
                    pixels=z[f"px_{i}"],
                    gains=z[f"gn_{i}"],
                    pose_i=int(z[f"pi_{i}"]),
                )
                for i in range(n)
            ]
