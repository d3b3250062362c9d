"""ctypes bindings for the native image runtime (libs2f_runtime.so).

Builds lazily with ``make`` on first use; all entry points gracefully fall
back to the PIL/numpy implementations in ``data/transforms.py`` when the
native library is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(__file__)
_LIB_PATH = os.path.join(_DIR, "libs2f_runtime.so")
_lib = None


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load() -> ctypes.CDLL | None:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    intp = ctypes.POINTER(ctypes.c_int)

    lib.s2f_decode_image.restype = u8p
    lib.s2f_decode_image.argtypes = [ctypes.c_char_p, intp, intp, intp]
    lib.s2f_free.argtypes = [ctypes.c_void_p]
    lib.s2f_resize_bilinear_u8.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        u8p, ctypes.c_int, ctypes.c_int]
    lib.s2f_resize_nearest_i32.argtypes = [
        i32p, ctypes.c_int, ctypes.c_int, i32p, ctypes.c_int, ctypes.c_int]
    lib.s2f_normalize_f32.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, f32p, f32p, f32p]
    _lib = lib
    return lib


def available() -> bool:
    return load() is not None


def decode_image(path: str) -> np.ndarray | None:
    """Decode JPEG/PNG → numpy [H, W, C] uint8 (C=3 for jpeg, native for
    png).  None if the native lib is missing or decode fails."""
    lib = load()
    if lib is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    buf = lib.s2f_decode_image(path.encode(), ctypes.byref(h),
                               ctypes.byref(w), ctypes.byref(c))
    if not buf:
        return None
    try:
        n = h.value * w.value * c.value
        arr = np.ctypeslib.as_array(buf, shape=(n,)).copy()
        return arr.reshape(h.value, w.value, c.value)
    finally:
        lib.s2f_free(buf)


def resize_bilinear_u8(img: np.ndarray, oh: int, ow: int) -> np.ndarray | None:
    lib = load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.uint8)
    h, w, c = img.shape
    out = np.empty((oh, ow, c), np.uint8)
    lib.s2f_resize_bilinear_u8(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), oh, ow)
    return out


def resize_nearest_i32(seg: np.ndarray, oh: int, ow: int) -> np.ndarray | None:
    lib = load()
    if lib is None:
        return None
    seg = np.ascontiguousarray(seg, np.int32)
    h, w = seg.shape
    out = np.empty((oh, ow), np.int32)
    lib.s2f_resize_nearest_i32(
        seg.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), oh, ow)
    return out


def normalize_f32(img: np.ndarray, mean, std) -> np.ndarray | None:
    lib = load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.uint8)
    h, w, _ = img.shape
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    out = np.empty((h, w, 3), np.float32)
    lib.s2f_normalize_f32(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
