"""KITTI optical-flow PNG format (16-bit RGB, uv+valid encoding).

KITTI 2012/2015 store flow as 16-bit 3-channel PNG: channels 1/2 hold
(u, v) * 64 + 2^15, channel 3 the validity mask.  PIL has no 16-bit RGB
mode, so this module carries a minimal self-contained PNG16 codec
(truecolor, bit depth 16, no interlace — exactly the KITTI subset).
Covers the BASELINE KITTI-2015 evaluation config.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = [
    "read_kitti_flow", "write_kitti_flow", "read_png16", "write_png16",
]

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data)) + tag + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def write_png16(path: str, img: np.ndarray) -> None:
    """Write (H, W, 3) uint16 as a 16-bit truecolor PNG."""
    img = np.ascontiguousarray(img, ">u2")
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("write_png16 expects (H, W, 3)")
    h, w = img.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    with open(path, "wb") as f:
        f.write(_SIG)
        f.write(_chunk(b"IHDR", ihdr))
        f.write(_chunk(b"IDAT", zlib.compress(raw, 6)))
        f.write(_chunk(b"IEND", b""))


def _unfilter(raw: bytes, h: int, w: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filters for a 16-bit RGB image.

    Dispatches to the native C unfilter (native/eppm_io.cpp
    eppm_png_unfilter) when the library is built — Average/Paeth
    predictors are sequentially dependent along the row, a linear C pass.
    The pure-NumPy fallback vectorizes filters 0/1/2 over the row and
    Average/Paeth per pixel-lane (bpp bytes at a time, one Python step
    per column rather than per byte)."""
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
        elif ftype == 1:  # Sub: 6 strided modular cumulative sums
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


def read_png16(path: str) -> np.ndarray:
    """Read a 16-bit truecolor PNG -> (H, W, 3) uint16."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:8] != _SIG:
        raise ValueError(f"{path}: not a PNG")
    pos = 8
    idat = b""
    w = h = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, ilace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 16 or ctype != 2 or ilace != 0:
                raise ValueError(
                    f"{path}: only 16-bit truecolor non-interlaced "
                    f"supported (depth={depth} ctype={ctype})"
                )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if w is None or h is None:
        raise ValueError(f"{path}: missing IHDR chunk")
    raw = zlib.decompress(idat)
    bpp = 6  # 3 channels x 2 bytes
    rows = _unfilter(raw, h, w, bpp)
    return rows.reshape(h, w, 3, 2).astype(np.uint16)[..., 0] * 256 + rows.reshape(
        h, w, 3, 2
    ).astype(np.uint16)[..., 1]


def read_kitti_flow(path: str):
    """Returns (flow (H, W, 2) float32, valid (H, W) bool)."""
    img = read_png16(path)
    flow = (img[..., :2].astype(np.float32) - 2**15) / 64.0
    valid = img[..., 2] > 0
    flow[~valid] = 0.0
    return flow, valid


def write_kitti_flow(path: str, flow, valid=None) -> None:
    flow = np.asarray(flow, np.float32)
    h, w = flow.shape[:2]
    if valid is None:
        valid = np.ones((h, w), bool)
    out = np.zeros((h, w, 3), np.uint16)
    q = np.clip(flow * 64.0 + 2**15, 0, 2**16 - 1)
    out[..., :2] = (q + 0.5).astype(np.uint16)
    out[..., 2] = np.asarray(valid).astype(np.uint16)
    write_png16(path, out)
