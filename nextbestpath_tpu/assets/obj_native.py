"""ctypes binding for the native OBJ parser (native/obj_fast.cpp).

Falls back to the pure-python parser (obj_io.load_obj) when the shared
library has not been built. Build with: sh native/build.sh
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

from .obj_io import load_obj as _py_load_obj

_LIB_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "..", "..", "native", "libobj_fast.so")
_lib: Optional[ctypes.CDLL] = None


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.obj_parse.restype = ctypes.c_void_p
    lib.obj_parse.argtypes = [ctypes.c_char_p]
    lib.obj_n_verts.restype = ctypes.c_int64
    lib.obj_n_verts.argtypes = [ctypes.c_void_p]
    lib.obj_n_faces.restype = ctypes.c_int64
    lib.obj_n_faces.argtypes = [ctypes.c_void_p]
    lib.obj_copy.restype = None
    lib.obj_copy.argtypes = [ctypes.c_void_p,
                             ctypes.POINTER(ctypes.c_float),
                             ctypes.POINTER(ctypes.c_int32)]
    lib.obj_free.restype = None
    lib.obj_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def load_obj_fast(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Native OBJ load; identical output to obj_io.load_obj."""
    lib = _load_lib()
    if lib is None:
        return _py_load_obj(path)
    handle = lib.obj_parse(path.encode())
    if not handle:
        raise IOError(f"obj_fast failed to open {path}")
    try:
        nv = lib.obj_n_verts(handle)
        nf = lib.obj_n_faces(handle)
        verts = np.empty((nv, 3), np.float32)
        faces = np.empty((max(nf, 1), 3), np.int32)
        lib.obj_copy(handle,
                     verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                     faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        if nf == 0:
            faces = np.zeros((0, 3), np.int32)
        return verts, faces
    finally:
        lib.obj_free(handle)


def native_available() -> bool:
    return _load_lib() is not None
