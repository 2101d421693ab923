"""Lazy build + ctypes loader for the native framecodec library.

The reference's host-side pixel plumbing lives in external native code
(OpenCV C++, FFmpeg C — SURVEY.md §2.3). This framework's equivalent is a
small first-party C++ library (native/framecodec.cpp) compiled once with
g++ on first use and cached next to the package. Everything degrades
gracefully to numpy when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = Path(__file__).resolve().parent.parent.parent
_SRC = _REPO_ROOT / "native" / "framecodec.cpp"
_CACHE_DIR = Path(
    os.environ.get("VRT_NATIVE_CACHE", Path.home() / ".cache" / "video_restore_tpu")
)

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[Path]:
    if not _SRC.exists():
        return None
    _CACHE_DIR.mkdir(parents=True, exist_ok=True)
    out = _CACHE_DIR / "libframecodec.so"
    if out.exists() and out.stat().st_mtime >= _SRC.stat().st_mtime:
        return out
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-fopenmp",
        str(_SRC), "-o", str(out),
    ]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        if r.returncode != 0:
            # retry without OpenMP
            cmd.remove("-fopenmp")
            r = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
            if r.returncode != 0:
                return None
        return out
    except (OSError, subprocess.TimeoutExpired):
        return None


def load() -> Optional[ctypes.CDLL]:
    """Build-once, load-once; returns None when native is unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("VRT_DISABLE_NATIVE") == "1":
            return None
        path = _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(str(path))
            u8p = ctypes.POINTER(ctypes.c_uint8)
            for name, argt in {
                "rgb_to_yuv420": [u8p, ctypes.c_int, ctypes.c_int, u8p, u8p, u8p],
                "rgb_to_yuv444": [u8p, ctypes.c_int, ctypes.c_int, u8p, u8p, u8p],
                "yuv420_to_rgb": [u8p, u8p, u8p, ctypes.c_int, ctypes.c_int, u8p],
                "yuv444_to_rgb": [u8p, u8p, u8p, ctypes.c_int, ctypes.c_int, u8p],
                "swap_rb": [u8p, ctypes.c_int, ctypes.c_int, u8p],
            }.items():
                fn = getattr(lib, name)
                fn.argtypes = argt
                fn.restype = None
            lib.framecodec_abi_version.restype = ctypes.c_int
            assert lib.framecodec_abi_version() == 1
            _lib = lib
        except (OSError, AttributeError, AssertionError):
            _lib = None
        return _lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def rgb_to_yuv(frame: np.ndarray, subsample: str) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Native RGB->YUV; returns None if unavailable or shape unsupported."""
    lib = load()
    if lib is None or subsample not in ("420", "444"):
        return None
    h, w = frame.shape[:2]
    if subsample == "420" and (h % 2 or w % 2):
        return None
    frame = np.ascontiguousarray(frame)
    y = np.empty((h, w), np.uint8)
    if subsample == "420":
        u = np.empty((h // 2, w // 2), np.uint8)
        v = np.empty((h // 2, w // 2), np.uint8)
        lib.rgb_to_yuv420(_ptr(frame), h, w, _ptr(y), _ptr(u), _ptr(v))
    else:
        u = np.empty((h, w), np.uint8)
        v = np.empty((h, w), np.uint8)
        lib.rgb_to_yuv444(_ptr(frame), h, w, _ptr(y), _ptr(u), _ptr(v))
    return y, u, v


def yuv_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    h, w = y.shape
    y, u, v = map(np.ascontiguousarray, (y, u, v))
    rgb = np.empty((h, w, 3), np.uint8)
    if u.shape == y.shape:
        lib.yuv444_to_rgb(_ptr(y), _ptr(u), _ptr(v), h, w, _ptr(rgb))
    elif u.shape == (h // 2, w // 2):
        lib.yuv420_to_rgb(_ptr(y), _ptr(u), _ptr(v), h, w, _ptr(rgb))
    else:
        return None
    return rgb
