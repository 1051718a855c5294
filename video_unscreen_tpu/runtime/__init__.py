"""Native runtime bindings (ctypes over the C++ loader).

Builds `libvu_runtime.so` from `loader.cpp` on first import (g++ -O3,
linked against libjpeg) and exposes:

- `decode_batch(paths, target_hw, threads)` -> (n, h, w, 3) BGR uint8
- `encode_batch(paths, imgs, quality, threads)`
- `probe(path)` -> (h, w)

Falls back to None exports if the toolchain or libjpeg is unavailable;
`utils/fileio.py` then uses cv2. The BGR output color space requires
libjpeg-turbo's JCS_EXT_BGR (present on this image).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "loader.cpp")
_SO = os.path.join(_HERE, "libvu_runtime.so")

_lib = None


def _build() -> bool:
    if os.path.exists(_SO) and (os.path.getmtime(_SO)
                                >= os.path.getmtime(_SRC)):
        return True
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
             "-ljpeg", "-o", _SO],
            check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        print(f"vu_runtime build skipped: {e}")
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _build():
        return None
    lib = ctypes.CDLL(_SO)
    lib.vu_decode_batch.restype = ctypes.c_int
    lib.vu_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
    lib.vu_encode_batch.restype = ctypes.c_int
    lib.vu_encode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int]
    lib.vu_probe.restype = ctypes.c_int
    lib.vu_probe.argtypes = [ctypes.c_char_p,
                             ctypes.POINTER(ctypes.c_int),
                             ctypes.POINTER(ctypes.c_int)]
    lib.vu_get_fg_batch.restype = ctypes.c_int
    lib.vu_get_fg_batch.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.vu_unblend_fg_batch.restype = ctypes.c_int
    lib.vu_unblend_fg_batch.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def probe(path: str) -> Optional[Tuple[int, int]]:
    lib = _load()
    if lib is None:
        return None
    h, w = ctypes.c_int(), ctypes.c_int()
    if lib.vu_probe(path.encode(), ctypes.byref(h), ctypes.byref(w)) != 0:
        return None
    return h.value, w.value


def decode_batch(paths: Sequence[str],
                 target_hw: Optional[Tuple[int, int]] = None,
                 threads: int = 16) -> Optional[np.ndarray]:
    """Threaded JPEG decode (+resize) to one (n, h, w, 3) BGR uint8 array."""
    lib = _load()
    if lib is None or not paths:
        return None
    if target_hw is None:
        target_hw = probe(paths[0])
        if target_hw is None:
            return None
    th, tw = target_hw
    n = len(paths)
    out = np.empty((n, th, tw, 3), np.uint8)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failures = lib.vu_decode_batch(
        c_paths, n, th, tw,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), threads)
    if failures:
        print(f"vu_runtime: {failures}/{n} decodes failed (zero-filled)")
    return out


def get_fg_batch(frames: np.ndarray, alphas: np.ndarray,
                 bg_colors: np.ndarray, threads: int = 16) -> np.ndarray:
    """Foreground un-blend on the host (HSV semantics of
    `unscreen/utils/fgfuncs.py:84-110`), threaded in C++."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native runtime unavailable")
    frames = np.ascontiguousarray(frames, np.uint8)
    alphas = np.ascontiguousarray(alphas, np.uint8)
    bg_colors = np.ascontiguousarray(bg_colors, np.float32)
    n, h, w, _ = frames.shape
    out = np.empty_like(frames)
    lib.vu_get_fg_batch(
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        alphas.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        bg_colors.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, h, w, threads)
    return out


def unblend_fg_batch(frames: np.ndarray, alphas: np.ndarray,
                     bgs: np.ndarray, threads: int = 16) -> np.ndarray:
    """Per-pixel-background HSV fg un-blend (`fgfuncs.py:84-110` with a bg
    *image*), threaded in C++ — bg mode's host-side fg reconstruction."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native runtime unavailable")
    frames = np.ascontiguousarray(frames, np.uint8)
    alphas = np.ascontiguousarray(alphas, np.uint8)
    bgs = np.ascontiguousarray(bgs, np.uint8)
    n, h, w, _ = frames.shape
    out = np.empty_like(frames)
    lib.vu_unblend_fg_batch(
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        alphas.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        bgs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, h, w, threads)
    return out


def encode_batch(paths: Sequence[str], imgs: np.ndarray, quality: int = 95,
                 threads: int = 16) -> int:
    """Threaded JPEG encode of (n, h, w, 3) BGR uint8 images."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native runtime unavailable")
    imgs = np.ascontiguousarray(imgs, np.uint8)
    n, h, w, _ = imgs.shape
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    return lib.vu_encode_batch(
        c_paths, imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, h, w, quality, threads)
