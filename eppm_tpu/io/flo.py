"""Middlebury .flo optical-flow file I/O.

Format spec (3rdparty/README.txt and 3rdparty/middlebury/flowIO.cpp in the
reference): little-endian; a float32 sanity tag 202021.25 ("PIEH" as bytes),
int32 width, int32 height, then h*w*2 float32 values interleaved (u, v) in
row-major order.  Values with |v| > 1e9 are treated as unknown flow.
"""

from __future__ import annotations

import numpy as np

TAG_FLOAT = 202021.25
TAG_BYTES = b"PIEH"

__all__ = ["read_flo", "write_flo", "TAG_FLOAT"]


def read_flo(path: str) -> np.ndarray:
    """Read a .flo file -> float32 array of shape (H, W, 2) as (u, v)."""
    with open(path, "rb") as f:
        tag = np.frombuffer(f.read(4), dtype="<f4")[0]
        if not np.isclose(tag, TAG_FLOAT):
            raise ValueError(f"bad .flo tag {tag} in {path}")
        w, h = np.frombuffer(f.read(8), dtype="<i4")
        if not (0 < w < 99999 and 0 < h < 99999):
            raise ValueError(f"bad .flo dims {w}x{h} in {path}")
        data = np.frombuffer(f.read(int(w) * int(h) * 8), dtype="<f4")
    if data.size != w * h * 2:
        raise ValueError(f"truncated .flo file {path}")
    return data.reshape(int(h), int(w), 2).copy()


def write_flo(path: str, flow: np.ndarray) -> None:
    """Write a float32 (H, W, 2) flow array as .flo."""
    flow = np.asarray(flow, dtype="<f4")
    if flow.ndim != 3 or flow.shape[2] != 2:
        raise ValueError(f"bad flow shape {flow.shape}")
    h, w = flow.shape[:2]
    with open(path, "wb") as f:
        f.write(np.float32(TAG_FLOAT).tobytes())
        f.write(np.array([w, h], dtype="<i4").tobytes())
        f.write(flow.tobytes())
