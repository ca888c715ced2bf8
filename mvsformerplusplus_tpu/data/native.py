"""ctypes bindings for the native data-pipeline core (native/fastio.cpp).

The input pipeline's Python-side hot loop (crop + ImageNet-normalize +
gamma + GT pyramid) runs as fused multi-threaded C passes when libfastio.so
is built (`make -C native`); otherwise pure-numpy fallbacks keep everything
working. Either path produces bit-identical float32 results (same ops, same
order) — validated in tests/test_native.py.
"""
from __future__ import annotations

import ctypes
import os
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = Path(__file__).resolve().parent.parent.parent / "native" / "libfastio.so"
    if so.exists():
        try:
            lib = ctypes.CDLL(str(so))
            lib.crop_normalize_f32.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_float, ctypes.POINTER(ctypes.c_float)]
            lib.u8_to_f32.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float)]
            lib.stage_pyramid_f32.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
            _LIB = lib
        except OSError:
            _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def crop_normalize(img: np.ndarray, oy: int, ox: int, crop_h: int, crop_w: int,
                   gamma: float = 0.0) -> np.ndarray:
    """float32 [H, W, 3] in [0,1] -> cropped, (gamma'd,) ImageNet-normalized
    [crop_h, crop_w, 3]."""
    lib = _load()
    img = np.ascontiguousarray(img, np.float32)
    if lib is not None:
        out = np.empty((crop_h, crop_w, 3), np.float32)
        lib.crop_normalize_f32(_fptr(img), img.shape[0], img.shape[1],
                               oy, ox, crop_h, crop_w,
                               ctypes.c_float(gamma), _fptr(out))
        return out
    from .transforms import IMAGENET_MEAN, IMAGENET_STD

    patch = img[oy:oy + crop_h, ox:ox + crop_w]
    if gamma > 0 and abs(gamma - 1.0) > 1e-6:
        patch = np.clip(patch, 0, 1) ** gamma
    return ((patch - IMAGENET_MEAN) / IMAGENET_STD).astype(np.float32)


def u8_to_f32(img: np.ndarray) -> np.ndarray:
    lib = _load()
    img = np.ascontiguousarray(img, np.uint8)
    if lib is not None:
        out = np.empty(img.shape, np.float32)
        lib.u8_to_f32(img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                      img.size, _fptr(out))
        return out
    return img.astype(np.float32) / 255.0


def stage_pyramid_native(arr: np.ndarray) -> Optional[dict]:
    """4-level nearest pyramid of a (h, w) float32 map; None if lib absent."""
    lib = _load()
    if lib is None:
        return None
    arr = np.ascontiguousarray(arr, np.float32)
    h, w = arr.shape
    outs = [np.empty((h // f, w // f), np.float32) for f in (8, 4, 2, 1)]
    lib.stage_pyramid_f32(_fptr(arr), h, w, *[_fptr(o) for o in outs])
    return {f"stage{i + 1}": o for i, o in enumerate(outs)}
