"""ctypes bindings for the native (C++/OpenMP) host data-path kernels.

Builds lazily with g++ on first use; falls back to None if no toolchain.
See preprocess.cc for what each kernel replaces in the reference.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _build_and_load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    src = os.path.join(os.path.dirname(__file__), "preprocess.cc")
    out = os.path.join(os.path.dirname(__file__), "_preprocess.so")
    try:
        if not os.path.exists(out) or os.path.getmtime(out) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
                 src, "-o", out],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(out)
        lib.resize_bilinear_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ]
        lib.normalize_pad_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ]
        lib.rgb2id.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p]
        lib.extract_masks_downsample.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return _build_and_load() is not None


def resize_bilinear(img: np.ndarray, dh: int, dw: int) -> np.ndarray:
    lib = _build_and_load()
    img = np.ascontiguousarray(img, np.uint8)
    sh, sw, c = img.shape
    out = np.empty((dh, dw, c), np.uint8)
    lib.resize_bilinear_u8(
        img.ctypes.data, sh, sw, c, out.ctypes.data, dh, dw
    )
    return out


def normalize_pad(img: np.ndarray, mean: np.ndarray, std: np.ndarray,
                  ph: int, pw: int) -> np.ndarray:
    lib = _build_and_load()
    img = np.ascontiguousarray(img, np.uint8)
    h, w, _ = img.shape
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    out = np.empty((ph, pw, 3), np.float32)
    lib.normalize_pad_f32(
        img.ctypes.data, h, w, mean.ctypes.data, std.ctypes.data,
        out.ctypes.data, ph, pw,
    )
    return out


def rgb2id(rgb: np.ndarray) -> np.ndarray:
    lib = _build_and_load()
    rgb = np.ascontiguousarray(rgb, np.uint8)
    h, w, _ = rgb.shape
    out = np.empty((h, w), np.int64)
    lib.rgb2id(rgb.ctypes.data, h * w, out.ctypes.data)
    return out


def extract_masks(seg_ids: np.ndarray, ids: np.ndarray, mh: int, mw: int) -> np.ndarray:
    lib = _build_and_load()
    seg_ids = np.ascontiguousarray(seg_ids, np.int64)
    ids = np.ascontiguousarray(ids, np.int64)
    h, w = seg_ids.shape
    out = np.empty((len(ids), mh, mw), np.float32)
    lib.extract_masks_downsample(
        seg_ids.ctypes.data, h, w, ids.ctypes.data, len(ids),
        out.ctypes.data, mh, mw,
    )
    return out
