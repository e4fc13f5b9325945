"""Minimal self-contained PNG codec: 8/16-bit gray/RGB/RGBA, no interlace.

The reference reads only binary PPM (basic/bao_basic.cpp:137-218); this
module exists for the dataset configs in BASELINE.md — MPI-Sintel frames
are 8-bit RGB PNGs and KITTI flow fields are 16-bit RGB PNGs (io/kitti.py
builds its uv+valid packing on top of this codec).  Scope is exactly the
subset those datasets use: bit depth 8 or 16, color types 0 (gray),
2 (truecolor), 6 (truecolor+alpha), non-interlaced, no palette.

Scanline unfiltering dispatches to the native C pass
(native/eppm_io.cpp `eppm_png_unfilter`) when built: Average/Paeth
predictors are sequentially dependent along the row — a linear C loop —
with a vectorized NumPy fallback (per-column over byte lanes).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["read_png", "write_png"]

_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel
_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data)) + tag + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def write_png(path: str, img: np.ndarray) -> None:
    """Write (H, W[, C]) uint8/uint16 as gray / RGB / RGBA PNG."""
    img = np.asarray(img)
    if img.dtype == np.uint8:
        depth, arr = 8, np.ascontiguousarray(img)
    elif img.dtype == np.uint16:
        depth, arr = 16, np.ascontiguousarray(img, ">u2")
    else:
        raise ValueError(f"write_png expects uint8/uint16, got {img.dtype}")
    if img.ndim == 2:
        ctype = 0
    elif img.ndim == 3 and img.shape[2] in (3, 4):
        ctype = 2 if img.shape[2] == 3 else 6
    else:
        raise ValueError(f"write_png expects (H,W), (H,W,3) or (H,W,4); got {img.shape}")
    h, w = img.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    with open(path, "wb") as f:
        f.write(_SIG)
        f.write(_chunk(b"IHDR", ihdr))
        f.write(_chunk(b"IDAT", zlib.compress(raw, 6)))
        f.write(_chunk(b"IEND", b""))


def unfilter(raw: bytes, h: int, w: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filters -> (h, w*bpp) uint8 rows.

    ``bpp`` is bytes per pixel (the PNG filter unit).  Native C pass when
    available; the fallback vectorizes filters 0/1/2 over the row and
    walks Average/Paeth per column, vectorized over the bpp byte lanes.
    """
    from .native import png_unfilter_native

    stride = w * bpp
    native = png_unfilter_native(raw, h, stride, bpp)
    if native is not None:
        return native
    out = np.empty((h, stride), np.uint8)
    pos = 0
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        ftype = raw[pos]
        pos += 1
        line = np.frombuffer(raw, np.uint8, stride, pos).astype(np.int32)
        pos += stride
        if ftype == 0:
            cur = line
        elif ftype == 1:  # Sub: bpp strided modular cumulative sums
            cur = line.copy()
            for r in range(bpp):
                cur[r::bpp] = np.cumsum(cur[r::bpp]) & 0xFF
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average: recurrence on the left pixel only —
            # walk columns, vectorized over the bpp byte lanes
            px = line.reshape(w, bpp)
            up = prev.reshape(w, bpp)
            cur2 = np.empty((w, bpp), np.int32)
            left = np.zeros(bpp, np.int32)
            for x in range(w):
                left = (px[x] + ((left + up[x]) >> 1)) & 0xFF
                cur2[x] = left
            cur = cur2.reshape(stride)
        elif ftype == 4:  # Paeth: same column walk, bpp lanes at a time
            px = line.reshape(w, bpp)
            up = prev.reshape(w, bpp)
            cur2 = np.empty((w, bpp), np.int32)
            left = np.zeros(bpp, np.int32)
            upleft = np.zeros(bpp, np.int32)
            for x in range(w):
                p = left + up[x] - upleft
                pa = np.abs(p - left)
                pb = np.abs(p - up[x])
                pc = np.abs(p - upleft)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left,
                    np.where(pb <= pc, up[x], upleft),
                )
                left = (px[x] + pred) & 0xFF
                upleft = up[x]
                cur2[x] = left
            cur = cur2.reshape(stride)
        else:
            raise ValueError(f"unsupported PNG filter {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


def read_png(path: str) -> np.ndarray:
    """Read a PNG -> (H, W) or (H, W, C) array, uint8 or uint16."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:8] != _SIG:
        raise ValueError(f"{path}: not a PNG")
    pos = 8
    idat = b""
    w = h = depth = ctype = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, ilace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth not in (8, 16) or ctype not in _CHANNELS or ilace != 0:
                raise ValueError(
                    f"{path}: only 8/16-bit gray/RGB/RGBA non-interlaced "
                    f"PNGs supported (depth={depth} ctype={ctype} "
                    f"interlace={ilace})"
                )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if w is None or h is None:
        raise ValueError(f"{path}: missing IHDR chunk")
    raw = zlib.decompress(idat)
    nch = _CHANNELS[ctype]
    bpp = nch * (depth // 8)
    rows = unfilter(raw, h, w, bpp)
    if depth == 8:
        out = rows.reshape(h, w, nch)
    else:
        pairs = rows.reshape(h, w, nch, 2).astype(np.uint16)
        out = pairs[..., 0] * 256 + pairs[..., 1]
    return out[:, :, 0] if nch == 1 else out
