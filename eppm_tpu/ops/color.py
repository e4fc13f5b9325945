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

__all__ = [
    "rgb2yuv", "yuv2rgb", "rgb2luv", "luminance", "make_color_wheel",
    "flow_to_color",
]


def rgb2yuv(img: jnp.ndarray) -> jnp.ndarray:
    """BT.601-style RGB->YUV on uint8-range values with the reference's
    coefficients, +128 chroma offset, +0.5 round and [0,255] clamp
    (bao_rgb2yuv_pixel, basic/bao_basic.h:736-746)."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b + 0.5
    u = -0.169 * r - 0.331 * g + 0.5 * b + 128.0 + 0.5
    v = 0.5 * r - 0.419 * g - 0.081 * b + 128.0 + 0.5
    return jnp.clip(jnp.stack([y, u, v], -1), 0.0, 255.0)


def yuv2rgb(img: jnp.ndarray) -> jnp.ndarray:
    """Inverse of rgb2yuv with the reference's (asymmetric) coefficients
    (bao_yuv2rgb_pixel, basic/bao_basic.h:757-770)."""
    y = img[..., 0]
    u = img[..., 1] - 128.0
    v = img[..., 2] - 128.0
    r = y + 1.4 * v
    g = y - 0.3437 * u - 0.71417 * v
    b = y + 1.77 * u
    return jnp.clip(jnp.stack([r, g, b], -1) + 0.5, 0.0, 255.0)


def rgb2luv(img: jnp.ndarray) -> jnp.ndarray:
    """RGB (uint8 range) -> CIE LUV rescaled to [0,255] per channel
    (bao_rgb2luv_pixel, basic/bao_basic.h:629-670)."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    x = 0.4125 * r + 0.3576 * g + 0.1804 * b
    y = 0.2125 * r + 0.7154 * g + 0.0721 * b
    z = 0.0193 * r + 0.1192 * g + 0.9502 * b
    l0 = y / 255.0
    L = jnp.where(
        l0 > 0.008856, 116.0 * jnp.cbrt(l0) - 16.0, 903.3 * l0
    )
    const = x + 15.0 * y + 3.0 * z
    u_p = jnp.where(const != 0, 4.0 * x / jnp.where(const != 0, const, 1.0), 4.0)
    v_p = jnp.where(const != 0, 9.0 * y / jnp.where(const != 0, const, 1.0), 0.6)
    us = 13.0 * L * (u_p - 0.19784977571475)
    vs = 13.0 * L * (v_p - 0.46834507665248)
    return jnp.stack(
        [
            L * (255.0 / 100.0),
            jnp.minimum((us + 83.138) * 255.0 / 258.343, 255.0),
            jnp.minimum((vs + 134.104) * 255.0 / 241.518, 255.0),
        ],
        -1,
    )


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
