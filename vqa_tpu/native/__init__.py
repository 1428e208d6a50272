"""ctypes binding for the native C++ host-preprocessing library.

The TPU-native analog of the reference's implicit native layer: where the
reference leans on torchvision→PIL C internals for image preprocessing
(reference: data/preprocess.py:98-121), this framework ships its own C++
implementation (vqa_tpu/native/vqa_preprocess.cc) — a bit-identical reimplementation
of PIL's two-pass fixed-point bilinear resample, batched across a thread
pool — bound via ctypes (no pybind11 dependency).

Degrades gracefully: if the .so is missing it is built on first import when
a compiler is available; if that fails, ``available()`` returns False and
callers fall back to the PIL path. Output parity with PIL is asserted in
tests/test_native.py, so switching paths never changes results.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_PKG_DIR, "vqa_preprocess.cc")


def _so_path() -> str:
    """Build target: next to the source when the package dir is writable
    (repo checkout, editable install), else a per-user cache dir
    (read-only site-packages)."""
    if os.access(_PKG_DIR, os.W_OK):
        return os.path.join(_PKG_DIR, "libvqa_preprocess.so")
    cache = os.path.join(
        os.environ.get(
            "XDG_CACHE_HOME", os.path.join(os.path.expanduser("~"), ".cache")
        ),
        "vqa_tpu",
    )
    os.makedirs(cache, exist_ok=True)
    return os.path.join(cache, "libvqa_preprocess.so")


_SO = _so_path()

_lib: Optional[ctypes.CDLL] = None
_tried = False
_lock = threading.Lock()


def _build() -> bool:
    # Compile to a private temp file and rename() into place: rename is
    # atomic on POSIX, so a concurrent process (server + tests, or a
    # source-mtime rebuild) can never CDLL a partially written .so.
    import tempfile

    fd, tmp = tempfile.mkstemp(
        suffix=".so", prefix=".libvqa_preprocess.", dir=os.path.dirname(_SO)
    )
    os.close(fd)
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
             "-o", tmp, _SRC],
            check=True,
            capture_output=True,
            timeout=120,
        )
        os.rename(tmp, _SO)
        return True
    except Exception:
        return False
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
        ):
            if not (os.path.exists(_SRC) and _build()):
                if not os.path.exists(_SO):
                    return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None

        lib.vqa_resize_bilinear_u8.restype = ctypes.c_int
        lib.vqa_resize_bilinear_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
        ]
        lib.vqa_resize_bilinear_u8_batch.restype = ctypes.c_int
        lib.vqa_resize_bilinear_u8_batch.argtypes = [
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.vqa_normalize_f32.restype = ctypes.c_int
        lib.vqa_normalize_f32.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.vqa_native_abi_version.restype = ctypes.c_int
        if lib.vqa_native_abi_version() != 1:
            return None
        _lib = lib
        return _lib


def available() -> bool:
    """True when the native library is loadable (building it if needed)."""
    return _load() is not None


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def resize_bilinear(src: np.ndarray, height: int, width: int) -> np.ndarray:
    """[H,W,C] u8 → [height,width,C] u8; bit-identical to PIL BILINEAR."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    src = np.ascontiguousarray(src, dtype=np.uint8)
    if src.ndim != 3:
        raise ValueError(f"expected [H,W,C], got shape {src.shape}")
    sh, sw, ch = src.shape
    dst = np.empty((height, width, ch), np.uint8)
    rc = lib.vqa_resize_bilinear_u8(_u8p(src), sh, sw, _u8p(dst), height,
                                    width, ch)
    if rc != 0:
        raise RuntimeError(f"vqa_resize_bilinear_u8 failed: {rc}")
    return dst


def resize_bilinear_batch(
    srcs: Sequence[np.ndarray],
    height: int,
    width: int,
    num_threads: int = 0,
) -> np.ndarray:
    """Variable-size [Hi,Wi,C] u8 images → [N,height,width,C] u8, resized in
    parallel on the native thread pool (0 ⇒ hardware concurrency)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    n = len(srcs)
    if n == 0:
        return np.empty((0, height, width, 3), np.uint8)
    arrs = [np.ascontiguousarray(a, dtype=np.uint8) for a in srcs]
    ch = arrs[0].shape[2]
    if any(a.ndim != 3 or a.shape[2] != ch for a in arrs):
        raise ValueError("all images must be [H,W,C] with matching C")
    dst = np.empty((n, height, width, ch), np.uint8)
    ptrs = (ctypes.POINTER(ctypes.c_uint8) * n)(*[_u8p(a) for a in arrs])
    shs = (ctypes.c_int * n)(*[a.shape[0] for a in arrs])
    sws = (ctypes.c_int * n)(*[a.shape[1] for a in arrs])
    rc = lib.vqa_resize_bilinear_u8_batch(ptrs, shs, sws, _u8p(dst), n,
                                          height, width, ch, num_threads)
    if rc != 0:
        raise RuntimeError(f"vqa_resize_bilinear_u8_batch failed: {rc}")
    return dst


def normalize_f32(
    src: np.ndarray, mean: np.ndarray, std: np.ndarray
) -> np.ndarray:
    """u8 [..., C] → f32 (x/255 - mean) / std, fused in C."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    src = np.ascontiguousarray(src, dtype=np.uint8)
    ch = src.shape[-1]
    mean32 = np.ascontiguousarray(mean, np.float32)
    std_inv = np.ascontiguousarray(1.0 / np.asarray(std, np.float32))
    dst = np.empty(src.shape, np.float32)
    rc = lib.vqa_normalize_f32(
        _u8p(src),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        src.size // ch,
        ch,
        mean32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std_inv.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise RuntimeError(f"vqa_normalize_f32 failed: {rc}")
    return dst
