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
    "read_image", "read_image_batch", "native_available",
]

IMAGE_EXTS = (".ppm", ".pgm", ".pnm", ".png")


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


def read_image(path: str):
    """Load a frame as (H, W, 3) uint8 RGB: PPM/PGM (native loader),
    PNG (io/png.py codec — covers Sintel 8-bit frames), or anything PIL
    can read as a last resort."""
    import numpy as np

    low = path.lower()
    if low.endswith((".ppm", ".pgm", ".pnm")):
        img = read_ppm(path)
    elif low.endswith(".png"):
        from .png import read_png

        img = read_png(path)
        if img.dtype == np.uint16:
            img = (img // 257).astype(np.uint8)
    else:
        try:
            from PIL import Image

            return np.asarray(Image.open(path).convert("RGB"))
        except ImportError as e:
            raise ValueError(
                f"{path}: only PPM/PGM/PNG supported without PIL ({e})"
            )
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=2)
    elif img.shape[2] == 4:
        img = img[..., :3]
    return np.ascontiguousarray(img)


def read_image_batch(paths, nthreads: int = 0):
    """(N, H, W, 3) uint8 stack of same-shaped frames of any supported
    format.  All-PPM batches go through the native threaded decoder;
    mixed/PNG batches decode on a thread pool (zlib releases the GIL)."""
    paths = list(paths)
    if all(p.lower().endswith((".ppm", ".pgm", ".pnm")) for p in paths):
        return read_ppm_batch(paths, nthreads)
    import os
    from concurrent.futures import ThreadPoolExecutor

    import numpy as np

    nthreads = nthreads or min(8, os.cpu_count() or 1)
    with ThreadPoolExecutor(max_workers=nthreads) as ex:
        return np.stack(list(ex.map(read_image, paths)))
