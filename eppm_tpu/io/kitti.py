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

    Filters 0/1/2 (None/Sub/Up) are vectorized; Average/Paeth fall back
    to per-byte loops (their predictors are sequentially dependent) — slow
    for libpng-encoded files that chose them, fine for the common cases
    and for everything this codec writes (filter 0)."""
    stride = w * bpp
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
        elif ftype == 3:  # Average
            cur = line.copy()
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (cur[i] + pred) & 0xFF
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
