"""ctypes binding for the native data-path library (native/decoder.cpp).

Auto-builds ``native/libcurvdata.so`` with g++ on first use and falls back
to pure numpy when a compiler is unavailable. All entry points mirror a
numpy implementation exactly (tests compare them).
"""
import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__),
                                          "..", ".."))
_SO_PATH = os.path.join(_REPO_ROOT, "native", "libcurvdata.so")
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO_PATH):
        build = os.path.join(_REPO_ROOT, "native", "build.sh")
        try:
            subprocess.run(["sh", build], check=True, capture_output=True,
                           timeout=120)
        except (OSError, subprocess.SubprocessError):
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    lib.ct_decode_idx.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
        ctypes.c_int]
    lib.ct_decode_cifar.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_int]
    lib.ct_normalize_nhwc3.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _threads() -> int:
    return min(8, os.cpu_count() or 1)


def decode_idx(raw: np.ndarray) -> np.ndarray:
    """[n, ...] uint8 -> float32 in [0, 1] (native or numpy)."""
    raw = np.ascontiguousarray(raw, np.uint8)
    lib = _load()
    if lib is None:
        return raw.astype(np.float32) / 255.0
    out = np.empty(raw.shape, np.float32)
    n = raw.shape[0]
    pixels = int(raw.size // max(n, 1))
    lib.ct_decode_idx(raw.ctypes.data, n, pixels, out.ctypes.data, _threads())
    return out


def decode_cifar(raw: np.ndarray, mean: Optional[np.ndarray] = None,
                 std: Optional[np.ndarray] = None) -> np.ndarray:
    """CIFAR [n, 3072] CHW uint8 -> [n, 32, 32, 3] NHWC float32,
    optionally channel-normalized in the same pass."""
    raw = np.ascontiguousarray(raw, np.uint8)
    n = raw.shape[0]
    lib = _load()
    if lib is None:
        x = raw.reshape(n, 3, 32, 32).transpose(0, 2, 3, 1)
        x = x.astype(np.float32) / 255.0
        if mean is not None:
            x = (x - mean) / std
        return x
    out = np.empty((n, 32, 32, 3), np.float32)
    m = s = None
    if mean is not None:
        m = np.ascontiguousarray(mean, np.float32)
        s = np.ascontiguousarray(1.0 / np.asarray(std, np.float32))
    lib.ct_decode_cifar(raw.ctypes.data, n, out.ctypes.data,
                        m.ctypes.data if m is not None else None,
                        s.ctypes.data if s is not None else None,
                        _threads())
    return out


def normalize_nhwc3(x: np.ndarray, mean: np.ndarray,
                    std: np.ndarray) -> np.ndarray:
    """In-place channel normalization of NHWC float32 RGB batches."""
    lib = _load()
    if lib is None or x.dtype != np.float32 or x.shape[-1] != 3 \
            or not x.flags.c_contiguous:
        return ((x - mean) / std).astype(np.float32)
    inv = np.ascontiguousarray(1.0 / np.asarray(std, np.float32))
    m = np.ascontiguousarray(mean, np.float32)
    rows = x.size // 3
    lib.ct_normalize_nhwc3(x.ctypes.data, rows, m.ctypes.data,
                           inv.ctypes.data, _threads())
    return x
