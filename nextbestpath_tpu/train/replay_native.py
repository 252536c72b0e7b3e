"""ctypes binding for the native replay record store
(native/replay_store.cpp) — the LMDB-tier replacement.

Records are the msgpack-free binary serialization of train.replay.Experience
(raw little-endian arrays with a small header). The training drivers
persist through ReplayDB's npz shards by default; this store is the
opt-in incremental-append tier (ReplayDB.save_native/load_native — one
record per experience, crash-tolerant index rebuild on open, like the
reference's per-experience LMDB puts). native_available() is False when
the library isn't built.
"""

from __future__ import annotations

import ctypes
import os
import struct
from typing import List, Optional

import numpy as np

from .replay import Experience

_LIB_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "..", "..", "native", "libreplay_store.so")
_lib: Optional[ctypes.CDLL] = None


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.replay_open.restype = ctypes.c_void_p
    lib.replay_open.argtypes = [ctypes.c_char_p]
    lib.replay_count.restype = ctypes.c_int64
    lib.replay_count.argtypes = [ctypes.c_void_p]
    lib.replay_append.restype = ctypes.c_int64
    lib.replay_append.argtypes = [ctypes.c_void_p,
                                  ctypes.POINTER(ctypes.c_uint8),
                                  ctypes.c_uint64]
    lib.replay_record_len.restype = ctypes.c_int64
    lib.replay_record_len.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.replay_read.restype = ctypes.c_int64
    lib.replay_read.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                ctypes.POINTER(ctypes.c_uint8),
                                ctypes.c_uint64]
    lib.replay_close.restype = None
    lib.replay_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load_lib() is not None


def _pack(e: Experience) -> bytes:
    """Self-describing record: the header carries the model-input spatial
    dims so stores written at non-default resolutions read back correctly
    (a hardcoded 256^2 reshape crashed on any other config)."""
    mi_arr = np.ascontiguousarray(e.model_input, np.float16)
    c, h, w = mi_arr.shape
    mi = mi_arr.tobytes()
    gl = np.ascontiguousarray(e.gt_layout, np.uint8).tobytes()
    px = np.ascontiguousarray(e.pixels, np.int32).tobytes()
    gn = np.ascontiguousarray(e.gains, np.float32).tobytes()
    header = struct.pack("<8q", len(e.pixels), e.pose_i, len(mi), len(gl),
                         len(px), c, h, w)
    return header + mi + gl + px + gn


def _unpack(buf: bytes) -> Experience:
    k, pose_i, n_mi, n_gl, n_px, c, h, w = struct.unpack_from("<8q", buf, 0)
    off = 8 * 8
    mi = np.frombuffer(buf, np.float16, count=n_mi // 2, offset=off
                       ).reshape(c, h, w)
    off += n_mi
    gl = np.frombuffer(buf, np.uint8, count=n_gl, offset=off
                       ).reshape(h, w)
    off += n_gl
    px = np.frombuffer(buf, np.int32, count=n_px // 4, offset=off
                       ).reshape(-1, 3)
    off += n_px
    gn = np.frombuffer(buf, np.float32, count=k, offset=off)
    return Experience(model_input=mi.copy(), gt_layout=gl.copy(),
                      pixels=px.copy(), gains=gn.copy(), pose_i=int(pose_i))


class NativeReplayStore:
    """Append/read Experience records through the C++ store."""

    def __init__(self, path: str):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("native replay store not built; "
                               "run sh native/build.sh")
        self._lib = lib
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._handle = lib.replay_open(path.encode())
        if not self._handle:
            raise IOError(f"cannot open replay store at {path}")

    def __len__(self) -> int:
        return int(self._lib.replay_count(self._handle))

    def append(self, e: Experience) -> int:
        data = _pack(e)
        arr = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
        return int(self._lib.replay_append(self._handle, arr, len(data)))

    def read(self, index: int) -> Experience:
        n = int(self._lib.replay_record_len(self._handle, index))
        if n < 0:
            raise IndexError(index)
        buf = (ctypes.c_uint8 * n)()
        got = self._lib.replay_read(self._handle, index, buf, n)
        if got != n:
            raise IOError(f"short read at record {index}")
        return _unpack(bytes(buf))

    def read_all(self) -> List[Experience]:
        return [self.read(i) for i in range(len(self))]

    def close(self):
        if self._handle:
            self._lib.replay_close(self._handle)
            self._handle = None
