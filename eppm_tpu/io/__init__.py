"""Image and flow I/O: PPM/PGM (spec: basic/bao_basic.cpp:137-218) and
Middlebury .flo (spec: 3rdparty/middlebury/flowIO.cpp).

Two implementations with identical formats: the native C++ runtime
(native/libeppm_io.so via ctypes, including a threaded batch decoder) and
pure Python/NumPy.  The native path is preferred when built; every entry
point falls back transparently.
"""

from . import native as _native
from .flo import read_flo as _read_flo_py, write_flo as _write_flo_py
from .ppm import read_ppm as _read_ppm_py, write_ppm as _write_ppm_py

__all__ = [
    "read_ppm", "write_ppm", "read_flo", "write_flo", "read_ppm_batch",
    "native_available",
]


def native_available() -> bool:
    return _native.available()


def read_ppm(path: str):
    if _native.available():
        try:
            return _native.read_ppm_native(path)
        except (IOError, ValueError):
            pass  # ASCII P2/P3 or odd header -> python reader decides
    return _read_ppm_py(path)


def write_ppm(path: str, img) -> None:
    if _native.available():
        import numpy as np

        a = np.asarray(img)
        if a.dtype == np.uint8 and (a.ndim == 2 or a.shape[-1] == 3):
            _native.write_ppm_native(path, a)
            return
    _write_ppm_py(path, img)


def read_flo(path: str):
    if _native.available():
        return _native.read_flo_native(path)
    return _read_flo_py(path)


def write_flo(path: str, flow) -> None:
    if _native.available():
        _native.write_flo_native(path, flow)
        return
    _write_flo_py(path, flow)


def read_ppm_batch(paths, nthreads: int = 0):
    """(N, H, W, C) uint8 stack of same-shaped frames; threaded natively,
    sequential Python otherwise."""
    out = _native.read_ppm_batch(list(paths), nthreads)
    if out is not None:
        return out
    import numpy as np

    return np.stack([read_ppm(p) for p in paths])
