"""ctypes bindings for the native I/O runtime (native/libeppm_io.so).

The shared library implements the PPM/PGM codec (spec:
basic/bao_basic.cpp:137-218), the Middlebury .flo codec (spec:
3rdparty/middlebury/flowIO.cpp) and a threaded batch frame decoder.
Binding is lazy and failure-tolerant: if the library is absent or
unloadable, ``lib()`` returns None and callers fall back to the pure
Python implementations in io/ppm.py and io/flo.py.

Build:  make -C native
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional

import numpy as np

__all__ = ["lib", "available", "read_ppm_native", "write_ppm_native",
           "read_flo_native", "write_flo_native", "read_ppm_batch",
           "png_unfilter_native"]

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _lib_path() -> str:
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # Installed layout: setup.py ships the library as package data.
    installed = os.path.join(pkg, "libeppm_io.so")
    if os.path.exists(installed):
        return installed
    return os.path.join(os.path.dirname(pkg), "native", "libeppm_io.so")


def _try_build(path: str) -> None:
    """Build the shared library on demand (it is not checked into git).
    Quiet best-effort: any failure simply leaves the Python fallbacks."""
    import subprocess

    try:
        subprocess.run(
            ["make", "-C", os.path.dirname(path)],
            capture_output=True, timeout=120, check=False,
        )
    except (OSError, subprocess.SubprocessError):
        pass


def lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    src = os.path.join(os.path.dirname(path), "eppm_io.cpp")
    if not os.path.exists(path) or (
        os.path.exists(src)
        and os.path.getmtime(src) > os.path.getmtime(path)
    ):
        _try_build(path)
    if not os.path.exists(path):
        return None
    try:
        L = ctypes.CDLL(path)
        L.eppm_ppm_probe.argtypes = [
            ctypes.c_char_p] + [ctypes.POINTER(ctypes.c_int)] * 4
        L.eppm_ppm_read.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int]
        L.eppm_ppm_write.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int]
        L.eppm_ppm_read_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int]
        L.eppm_flo_probe.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        L.eppm_flo_read.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
        L.eppm_flo_write.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
        for fn in ("eppm_ppm_probe", "eppm_ppm_read", "eppm_ppm_write",
                   "eppm_ppm_read_batch", "eppm_flo_probe",
                   "eppm_flo_read", "eppm_flo_write"):
            getattr(L, fn).restype = ctypes.c_int
        # Present in libraries built after round 1; optional for stale .so
        try:
            L.eppm_png_unfilter.argtypes = [
                ctypes.c_void_p, ctypes.c_long, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_void_p]
            L.eppm_png_unfilter.restype = ctypes.c_int
        except AttributeError:
            pass
        _LIB = L
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return lib() is not None


def read_ppm_native(path: str) -> Optional[np.ndarray]:
    L = lib()
    if L is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    b = ctypes.c_int()
    if L.eppm_ppm_probe(path.encode(), h, w, c, b) != 0:
        raise ValueError(f"{path}: not a valid PPM/PGM")
    dtype = np.uint16 if b.value == 2 else np.uint8
    out = np.empty((h.value, w.value, c.value), dtype)
    rc = L.eppm_ppm_read(
        path.encode(), out.ctypes.data_as(ctypes.c_void_p),
        h.value, w.value, c.value, b.value,
    )
    if rc != 0:
        raise IOError(f"{path}: PPM read failed ({rc})")
    return out[..., 0] if c.value == 1 else out


def write_ppm_native(path: str, img: np.ndarray) -> bool:
    L = lib()
    if L is None:
        return False
    img = np.ascontiguousarray(img)
    if img.dtype != np.uint8:
        raise ValueError("native PPM writer takes uint8")
    if img.ndim == 2:
        img = img[..., None]
    h, w, c = img.shape
    rc = L.eppm_ppm_write(
        path.encode(), img.ctypes.data_as(ctypes.c_void_p), h, w, c
    )
    if rc != 0:
        raise IOError(f"{path}: PPM write failed ({rc})")
    return True


def read_flo_native(path: str) -> Optional[np.ndarray]:
    L = lib()
    if L is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    if L.eppm_flo_probe(path.encode(), h, w) != 0:
        # ValueError matches the pure-Python reader's contract
        raise ValueError(f"{path}: not a valid .flo")
    out = np.empty((h.value, w.value, 2), np.float32)
    rc = L.eppm_flo_read(
        path.encode(), out.ctypes.data_as(ctypes.c_void_p), h.value, w.value
    )
    if rc != 0:
        raise IOError(f"{path}: .flo read failed ({rc})")
    return out


def write_flo_native(path: str, flow: np.ndarray) -> bool:
    L = lib()
    if L is None:
        return False
    flow = np.ascontiguousarray(flow, np.float32)
    h, w = flow.shape[:2]
    rc = L.eppm_flo_write(
        path.encode(), flow.ctypes.data_as(ctypes.c_void_p), h, w
    )
    if rc != 0:
        raise IOError(f"{path}: .flo write failed ({rc})")
    return True


def png_unfilter_native(
    raw: bytes, h: int, stride: int, bpp: int
) -> Optional[np.ndarray]:
    """Undo PNG scanline filters natively -> (h, stride) uint8, or None
    when the library (or the symbol, in a stale build) is unavailable."""
    L = lib()
    if L is None or not hasattr(L, "eppm_png_unfilter"):
        return None
    out = np.empty((h, stride), np.uint8)
    rc = L.eppm_png_unfilter(
        raw, len(raw), h, stride, bpp,
        out.ctypes.data_as(ctypes.c_void_p),
    )
    if rc == -1:
        raise ValueError("PNG data truncated")
    if rc != 0:
        raise ValueError(f"unsupported PNG filter (rc={rc})")
    return out


def read_ppm_batch(
    paths: List[str], nthreads: int = 0
) -> Optional[np.ndarray]:
    """Decode N same-shaped uint8 PPM frames in parallel -> (N, H, W, C).

    Returns None when the native library is unavailable (callers loop
    over the Python reader instead).
    """
    L = lib()
    if L is None or not paths:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    b = ctypes.c_int()
    if L.eppm_ppm_probe(paths[0].encode(), h, w, c, b) != 0:
        raise IOError(f"{paths[0]}: not a valid PPM/PGM")
    if b.value != 1:
        return None  # 16-bit: fall back to per-file reader
    out = np.empty((len(paths), h.value, w.value, c.value), np.uint8)
    arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    rc = L.eppm_ppm_read_batch(
        arr, len(paths), out.ctypes.data_as(ctypes.c_void_p),
        h.value, w.value, c.value, nthreads,
    )
    if rc != 0:
        raise IOError(f"batch read failed at {paths[-rc - 1]}")
    return out
