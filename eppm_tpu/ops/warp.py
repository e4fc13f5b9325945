"""Image warping by a flow field.

Spec: ``bao_cuda_warping_by_flow`` (basic/bao_basic_cuda.cuh:667-740).
Despite its helper's name (``_d_bao_bicubic_interp_pixel``) the reference
samples with a 2x2 *bilinear* kernel at (x + u, y + v): integer part by
C truncation, fractional part clamped to [0, 1], taps clamped to the
image.  Unknown-flow pixels (sentinel > 1e9) fall back to the source
pixel.

One 4-tap gather; a utility op (visualization, photometric error,
dataset tooling), not on the hot path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import UNKNOWN_FLOW_THRESH

__all__ = ["warp_image_by_flow"]


def warp_image_by_flow(img: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """warped(p) = img(p + flow(p)) with bilinear sampling; (H, W, C)."""
    h, w = img.shape[0], img.shape[1]
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    c = img.shape[2]
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).astype(jnp.float32)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(jnp.float32)
    u = flow[..., 0]
    v = flow[..., 1]
    unknown = (u > UNKNOWN_FLOW_THRESH) | (v > UNKNOWN_FLOW_THRESH)
    x = xs + jnp.where(unknown, 0.0, u)
    y = ys + jnp.where(unknown, 0.0, v)
    x0 = jnp.trunc(x)
    y0 = jnp.trunc(y)
    fx = jnp.clip(x - x0, 0.0, 1.0)
    fy = jnp.clip(y - y0, 0.0, 1.0)
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    flat = img.reshape(-1, c)

    def tap(dy, dx):
        cy = jnp.clip(y0 + dy, 0, h - 1)
        cx = jnp.clip(x0 + dx, 0, w - 1)
        return jnp.take(flat, cy * w + cx, axis=0)

    wx0, wx1 = (1.0 - fx)[..., None], fx[..., None]
    wy0, wy1 = (1.0 - fy)[..., None], fy[..., None]
    out = (
        tap(0, 0) * wy0 * wx0
        + tap(0, 1) * wy0 * wx1
        + tap(1, 0) * wy1 * wx0
        + tap(1, 1) * wy1 * wx1
    )
    return out[..., 0] if squeeze else out
