"""Native (C++) host-side layer: PIL-bit-exact image resampling.

The reference's only native-performance surface outside torch kernels is
PIL's C resize running inside DataLoader workers (dataloaders/JSRT.py:62-65,
SURVEY §2.2). This package is our native equivalent: ``cc/resample.cpp``
reimplements Pillow's fixed-point separable resampling (single-band 8-bit;
BICUBIC — PIL's mode-'L' resize default — plus BILINEAR and NEAREST) with a
``std::thread`` batch fan-out, bound via ctypes.

Build story: compiled on first use with ``g++ -O3`` into ``_resample.so``
next to this file (no pip/pybind11 dependency). Every entry point degrades
gracefully — if the toolchain or the .so is unavailable, ``available()``
returns False and callers (tedm_tpu/data/datasets.py) fall back to PIL with
identical output bytes (bit-exactness is pinned by
tests/test_native_resample.py), so the fast path can never change a number.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "cc", "resample.cpp")
_SRC_IO = os.path.join(_DIR, "cc", "imageio.cpp")
_SO = os.path.join(_DIR, "_resample.so")

FILTERS = {"nearest": 0, "bilinear": 1, "bicubic": 2}

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False
_has_png = False


def _build() -> bool:
    """Compile the .so if missing/stale. Returns True on success.

    Tries resample + PNG imageio linked against libpng first; if the
    toolchain lacks libpng, falls back to a resize-only library (the PNG
    entry points are then absent and ``png_available()`` is False). A
    sidecar ``.meta`` file records which flavor was built so a libpng-less
    build is retried once libpng headers appear (rather than being frozen
    by the mtime check forever)."""
    meta = _SO + ".meta"
    tmp = _SO + f".tmp{os.getpid()}"
    try:
        srcs = [_SRC, _SRC_IO]
        newest = max(os.path.getmtime(s) for s in srcs)
        if os.path.exists(_SO) and os.path.getmtime(_SO) >= newest:
            flavor = ""
            if os.path.exists(meta):
                with open(meta) as f:
                    flavor = f.read().strip()
            png_header = os.path.exists("/usr/include/png.h")
            if flavor == "png" or not png_header:
                return True
            # fall through: rebuild to pick up newly-available libpng
        base = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread"]
        try:
            subprocess.run(
                base + srcs + ["-lpng", "-lz", "-o", tmp],
                check=True, capture_output=True, timeout=120,
            )
            flavor = "png"
        except Exception:
            subprocess.run(
                base + [_SRC, "-o", tmp],
                check=True, capture_output=True, timeout=120,
            )
            flavor = "nopng"
        os.replace(tmp, _SO)  # atomic: concurrent builders race safely
        with open(meta, "w") as f:
            f.write(flavor)
        return True
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    with _lock:
        if _lib is not None:
            return _lib
        if not _build():
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _build_failed = True
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.tedm_resize_u8.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, u8p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
        ]
        lib.tedm_resize_u8.restype = ctypes.c_int
        lib.tedm_resize_batch_u8.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, u8p, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.tedm_resize_batch_u8.restype = ctypes.c_int
        global _has_png
        try:
            lib.tedm_png_decode_resize.argtypes = [
                ctypes.c_char_p, u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ]
            lib.tedm_png_decode_resize.restype = ctypes.c_int
            lib.tedm_png_decode_resize_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, u8p,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.tedm_png_decode_resize_batch.restype = ctypes.c_int
            _has_png = True
        except AttributeError:
            _has_png = False
        _lib = lib
        return _lib


def available() -> bool:
    """True iff the native library is built/loadable (and not disabled via
    TEDM_NATIVE=0)."""
    if os.environ.get("TEDM_NATIVE", "1") == "0":
        return False
    return _load() is not None


def resize_u8(img: np.ndarray, size: Tuple[int, int],
              filter: str = "bicubic") -> np.ndarray:
    """Resize a (H, W) uint8 image to ``size`` = (out_h, out_w).

    Byte-identical to ``PIL.Image.fromarray(img).resize((out_w, out_h),
    <filter>)`` (BICUBIC is PIL's default for mode 'L')."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native resample library unavailable")
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 2:
        raise ValueError(f"expected (H, W) uint8, got {img.shape}")
    oh, ow = size
    out = np.empty((oh, ow), np.uint8)
    rc = lib.tedm_resize_u8(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        img.shape[0], img.shape[1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        oh, ow, FILTERS[filter],
    )
    if rc != 0:
        raise RuntimeError(f"tedm_resize_u8 failed: {rc}")
    return out


def resize_batch_u8(imgs: np.ndarray, size: Tuple[int, int],
                    filter: str = "bicubic",
                    num_threads: Optional[int] = None) -> np.ndarray:
    """Resize a (B, H, W) uint8 stack to (B, out_h, out_w), threaded."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native resample library unavailable")
    imgs = np.ascontiguousarray(imgs, dtype=np.uint8)
    if imgs.ndim != 3:
        raise ValueError(f"expected (B, H, W) uint8, got {imgs.shape}")
    oh, ow = size
    b = imgs.shape[0]
    nt = num_threads or min(b, os.cpu_count() or 1)
    out = np.empty((b, oh, ow), np.uint8)
    rc = lib.tedm_resize_batch_u8(
        imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        b, imgs.shape[1], imgs.shape[2],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        oh, ow, FILTERS[filter], nt,
    )
    if rc != 0:
        raise RuntimeError(f"tedm_resize_batch_u8 failed: {rc}")
    return out


def png_available() -> bool:
    """True iff the library was linked against libpng."""
    return available() and _has_png


def load_resize_png(path: str, size: Tuple[int, int],
                    filter: str = "bicubic") -> Optional[np.ndarray]:
    """Fused PNG decode -> PIL-'L' grayscale -> PIL-exact resize.

    Matches ``Image.open(path).convert('L').resize((ow, oh))`` byte-for-byte
    for gray8/gray16/RGB/RGBA/palette PNGs (the reference host pipeline,
    dataloaders/CXR14.py:63-74). Returns None if the file can't be decoded
    natively (caller falls back to PIL)."""
    lib = _load()
    if lib is None or not _has_png:
        return None
    oh, ow = size
    out = np.empty((oh, ow), np.uint8)
    rc = lib.tedm_png_decode_resize(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        oh, ow, FILTERS[filter],
    )
    return out if rc == 0 else None


def load_resize_png_batch(paths, size: Tuple[int, int],
                          filter: str = "bicubic",
                          num_threads: Optional[int] = None):
    """Batch fused decode+resize across C++ threads (no GIL).

    Returns (out (B, oh, ow) u8, ok (B,) bool). Rows with ok=False failed to
    decode natively and must be loaded by the caller's fallback."""
    lib = _load()
    if lib is None or not _has_png:
        return None, None
    oh, ow = size
    n = len(paths)
    out = np.empty((n, oh, ow), np.uint8)
    status = (ctypes.c_int * n)()
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    nt = num_threads or min(n, os.cpu_count() or 1)
    lib.tedm_png_decode_resize_batch(
        c_paths, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        oh, ow, FILTERS[filter], nt, status,
    )
    ok = np.array([status[i] == 0 for i in range(n)], bool)
    return out, ok
