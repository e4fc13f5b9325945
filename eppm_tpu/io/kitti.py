"""KITTI optical-flow PNG format (16-bit RGB, uv+valid encoding).

KITTI 2012/2015 store flow as 16-bit 3-channel PNG: channels 1/2 hold
(u, v) * 64 + 2^15, channel 3 the validity mask.  The PNG container
itself is handled by the shared minimal codec in io/png.py; this module
adds the KITTI-specific packing.  Covers the BASELINE KITTI-2015
evaluation config.
"""

from __future__ import annotations

import numpy as np

from .png import read_png, write_png

__all__ = [
    "read_kitti_flow", "write_kitti_flow", "read_png16", "write_png16",
]


def write_png16(path: str, img: np.ndarray) -> None:
    """Write (H, W, 3) uint16 as a 16-bit truecolor PNG."""
    img = np.asarray(img)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("write_png16 expects (H, W, 3)")
    write_png(path, img.astype(np.uint16))


def read_png16(path: str) -> np.ndarray:
    """Read a 16-bit truecolor PNG -> (H, W, 3) uint16."""
    img = read_png(path)
    if img.dtype != np.uint16 or img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(
            f"{path}: expected 16-bit truecolor PNG, got "
            f"{img.dtype} shape {img.shape}"
        )
    return img


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
