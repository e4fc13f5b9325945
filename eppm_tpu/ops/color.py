"""Color utilities: luminance and Middlebury flow visualization.

Spec sources in /root/reference:
  - luminance weights 0.3R + 0.6G + 0.1B: bao_pmflow_census_kernel.cu:41
  - Middlebury color wheel (55 entries; RY=15, YG=6, GC=4, CB=11, BM=13,
    MR=6): 3rdparty/middlebury/colorcode.cpp and the device rewrite at
    basic/bao_basic_cuda.cuh:743-845.

Implemented as vectorized jnp ops so the visualization can run fully
on-device (the reference renders on-GPU too: bao_cuda_convert_flow_to_colorshow).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import UNKNOWN_FLOW_THRESH

__all__ = ["luminance", "make_color_wheel", "flow_to_color"]


def luminance(img: jnp.ndarray) -> jnp.ndarray:
    """Census-comparison luminance: 0.3R + 0.6G + 0.1B (census_kernel.cu:41)."""
    return 0.3 * img[..., 0] + 0.6 * img[..., 1] + 0.1 * img[..., 2]


def make_color_wheel() -> np.ndarray:
    """55x3 float color wheel in [0, 1] (colorcode.cpp makecolorwheel)."""
    RY, YG, GC, CB, BM, MR = 15, 6, 4, 11, 13, 6
    ncols = RY + YG + GC + CB + BM + MR
    wheel = np.zeros((ncols, 3))
    col = 0
    wheel[col : col + RY] = np.stack(
        [np.full(RY, 1.0), np.arange(RY) / RY, np.zeros(RY)], axis=1
    )
    col += RY
    wheel[col : col + YG] = np.stack(
        [1.0 - np.arange(YG) / YG, np.full(YG, 1.0), np.zeros(YG)], axis=1
    )
    col += YG
    wheel[col : col + GC] = np.stack(
        [np.zeros(GC), np.full(GC, 1.0), np.arange(GC) / GC], axis=1
    )
    col += GC
    wheel[col : col + CB] = np.stack(
        [np.zeros(CB), 1.0 - np.arange(CB) / CB, np.full(CB, 1.0)], axis=1
    )
    col += CB
    wheel[col : col + BM] = np.stack(
        [np.arange(BM) / BM, np.zeros(BM), np.full(BM, 1.0)], axis=1
    )
    col += BM
    wheel[col : col + MR] = np.stack(
        [np.full(MR, 1.0), np.zeros(MR), 1.0 - np.arange(MR) / MR], axis=1
    )
    return wheel


_WHEEL = make_color_wheel()


def flow_to_color(flow: jnp.ndarray, max_rad: float | None = None) -> jnp.ndarray:
    """Middlebury color coding of a (H, W, 2) flow field -> (H, W, 3) uint8.

    When ``max_rad`` is None, normalizes by the max flow magnitude over the
    image (host colorcode behavior, flow_tools.cpp:200-231); otherwise uses
    the fixed normalization (device variant takes explicit max_disp args,
    bao_flow_patchmatch_multiscale_cuda.cpp:311 passes 20,20).
    Unknown flow renders black.
    """
    u = flow[..., 0]
    v = flow[..., 1]
    unknown = (jnp.abs(u) > UNKNOWN_FLOW_THRESH) | (jnp.abs(v) > UNKNOWN_FLOW_THRESH)
    u = jnp.where(unknown, 0.0, u)
    v = jnp.where(unknown, 0.0, v)
    rad = jnp.sqrt(u * u + v * v)
    if max_rad is None:
        norm = jnp.maximum(jnp.max(rad), 1e-9)
    else:
        norm = jnp.maximum(float(max_rad), 1e-9)
    u = u / norm
    v = v / norm
    rad = rad / norm

    wheel = jnp.asarray(_WHEEL, dtype=jnp.float32)
    ncols = wheel.shape[0]
    a = jnp.arctan2(-v, -u) / jnp.pi  # [-1, 1]
    fk = (a + 1.0) / 2.0 * (ncols - 1)
    k0 = jnp.floor(fk).astype(jnp.int32)
    k1 = (k0 + 1) % ncols
    f = (fk - k0)[..., None]
    col = (1.0 - f) * wheel[k0] + f * wheel[k1]
    radc = jnp.clip(rad, 0.0, None)[..., None]
    col = jnp.where(radc <= 1.0, 1.0 - radc * (1.0 - col), col * 0.75)
    col = jnp.where(unknown[..., None], 0.0, col)
    return (255.0 * col).astype(jnp.uint8)
