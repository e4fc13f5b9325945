"""Pallas TPU kernel for joint-bilateral flow smoothing.

Spec: ``d_flow_bilateral_filtering`` (bao_pmflow_refine_kernel.cu:749-826)
— flow smoothed under image-guided bilateral weights over a radius-10
window (441 taps), skipping unknown-flow taps; pixels whose window holds
no known flow keep their value.  ops/refine.py::flow_smoothing is the XLA
oracle; the XLA form costs ~19 ms per call at 640x480 against a ~2 ms
VPU roofline because each of 441 taps is a separate HBM-bound fused op.

Kernel shape follows ops/pallas_cost.py (see its docstring for the
Mosaic constraints that dictate it): channel-first planes, aligned
halos, ``fori_loop`` over a scalar-prefetched tap table, non-negative
dynamic rolls, VMEM accumulators.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import UNKNOWN_FLOW, UNKNOWN_FLOW_THRESH, RefineConfig
from ._util import (
    on_tpu as _on_tpu,
    round_up as _round_up,
    tpu_params as _tpu_params,
)

__all__ = ["flow_smoothing_pallas", "flow_smoothing_auto"]


def _smooth_kernel(
    dys_ref, gys_ref,
    state_ref,            # (6, Hp, Wp): u, v, known, r, g, b  (HBM)
    out_ref,              # (2, TH, TW) block
    win_ref, yslab_ref, acc_ref, sem,
    *,
    n_dys: int,
    dxs: Tuple[int, ...],
    gxs: Tuple[float, ...],
    HY: int, HX: int, TH: int, TW: int,
    inv_sig_r2: float,
):
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    WH = TH + 2 * HY
    WW = TW + 2 * HX

    cp = pltpu.make_async_copy(
        state_ref.at[:, pl.ds(ti * TH, WH), pl.ds(tj * TW, WW)],
        win_ref, sem,
    )
    cp.start()
    cp.wait()

    c_r = win_ref[3, HY : HY + TH, HX : HX + TW]
    c_g = win_ref[4, HY : HY + TH, HX : HX + TW]
    c_b = win_ref[5, HY : HY + TH, HX : HX + TW]

    # acc: u_sum, v_sum, w_sum
    acc_ref[:] = jnp.zeros((3, TH, TW), jnp.float32)

    # Dynamic rolls are the expensive op (a variable shift costs several
    # elementwise selects over the whole padded window).  Structure: ONE
    # dynamic y-roll per row offset (materialized as a TH-row slab), then
    # the 2r+1 column offsets are *static* slices of that slab — Mosaic
    # lowers a constant-offset slice to a lane rotate on load, touching
    # only out-sized data.  (2r+1)^2 -> (2r+1) dynamic rolls vs the
    # tap-loop form.
    def dy_body(t, _):
        dy = dys_ref[t, 0]
        gy = gys_ref[t, 0]
        wv = win_ref[:]
        yslab_ref[:] = pltpu.roll(wv, (WH - dy) % WH, 1)[:, HY : HY + TH, :]
        acc_u = acc_ref[0]
        acc_v = acc_ref[1]
        acc_w = acc_ref[2]
        for dx, gx in zip(dxs, gxs):
            u = yslab_ref[0, :, HX + dx : HX + dx + TW]
            v = yslab_ref[1, :, HX + dx : HX + dx + TW]
            known = yslab_ref[2, :, HX + dx : HX + dx + TW]
            pr = yslab_ref[3, :, HX + dx : HX + dx + TW]
            pg = yslab_ref[4, :, HX + dx : HX + dx + TW]
            pb = yslab_ref[5, :, HX + dx : HX + dx + TW]
            dr = jnp.maximum(
                jnp.maximum(jnp.abs(pr - c_r), jnp.abs(pg - c_g)),
                jnp.abs(pb - c_b),
            )
            w = jnp.exp(-(dr * dr) * inv_sig_r2) * (gy * gx) * known
            acc_u = acc_u + w * u
            acc_v = acc_v + w * v
            acc_w = acc_w + w
        acc_ref[0] = acc_u
        acc_ref[1] = acc_v
        acc_ref[2] = acc_w
        return 0

    jax.lax.fori_loop(0, n_dys, dy_body, 0)

    wsum = acc_ref[2]
    has = wsum > 0
    u0 = win_ref[0, HY : HY + TH, HX : HX + TW]
    v0 = win_ref[1, HY : HY + TH, HX : HX + TW]
    inv = 1.0 / jnp.maximum(wsum, 1e-30)
    out_ref[0] = jnp.where(has, acc_ref[0] * inv, u0)
    out_ref[1] = jnp.where(has, acc_ref[1] * inv, v0)


def flow_smoothing_pallas(
    flow: jnp.ndarray,
    img: jnp.ndarray,
    cfg: RefineConfig = RefineConfig(),
    tile: Tuple[int, int] = (128, 512),
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for ops.refine.flow_smoothing on TPU."""
    h, w = flow.shape[:2]
    r = cfg.blf_radius
    sig_s2 = cfg.blf_sigma_spatial**2

    dys = np.asarray([[dy] for dy in range(-r, r + 1)], np.int32)
    gys = np.asarray(
        [[math.exp(-(dy * dy) / sig_s2)] for dy in range(-r, r + 1)],
        np.float32,
    )
    dxs = tuple(range(-r, r + 1))
    gxs = tuple(math.exp(-(dx * dx) / sig_s2) for dx in dxs)

    TH, TW = tile
    TH = min(TH, _round_up(h, 8))
    TW = min(TW, _round_up(w, 128))
    HY = _round_up(r, 8)
    HX = _round_up(r, 128)
    ph = (-h) % TH
    pw = (-w) % TW
    hp, wp = h + ph, w + pw

    u = flow[..., 0]
    v = flow[..., 1]
    known = (
        (u <= UNKNOWN_FLOW_THRESH) & (v <= UNKNOWN_FLOW_THRESH)
    ).astype(jnp.float32)
    # the sentinel rides along: unknown taps get weight exactly 0, so
    # w*u == 0 (the sentinel is finite), and the empty-window fallback
    # returns the original (possibly sentinel) value like the oracle
    state = jnp.stack(
        [u, v, known, img[..., 0], img[..., 1], img[..., 2]]
    )
    # halo: flow/known pad with 0 known (reference skips out-of-image
    # taps); image pads edge (only used via dr at in-image taps, but edge
    # keeps dr finite)
    statep = jnp.pad(state, ((0, 0), (HY, HY + ph), (HX, HX + pw)))
    img_edge = jnp.pad(
        jnp.stack([img[..., 0], img[..., 1], img[..., 2]]),
        ((0, 0), (HY, HY + ph), (HX, HX + pw)),
        mode="edge",
    )
    statep = statep.at[3:6].set(img_edge)

    kern = functools.partial(
        _smooth_kernel,
        n_dys=len(dxs),
        dxs=dxs,
        gxs=gxs,
        HY=HY, HX=HX, TH=TH, TW=TW,
        inv_sig_r2=1.0 / (cfg.blf_sigma_range**2),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(hp // TH, wp // TW),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((2, TH, TW), lambda i, j, *_: (0, i, j)),
        scratch_shapes=[
            pltpu.VMEM((6, TH + 2 * HY, TW + 2 * HX), jnp.float32),
            pltpu.VMEM((6, TH, TW + 2 * HX), jnp.float32),
            pltpu.VMEM((3, TH, TW), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((2, hp, wp), jnp.float32),
        compiler_params=_tpu_params(),
        interpret=interpret,
    )(jnp.asarray(dys), jnp.asarray(gys), statep)
    return jnp.stack([out[0, :h, :w], out[1, :h, :w]], axis=-1)


def flow_smoothing_auto(
    flow, img, cfg: RefineConfig = RefineConfig(), chunk: int = 21
):
    """Dispatch: Pallas kernel on TPU, XLA oracle elsewhere."""
    if _on_tpu():
        return flow_smoothing_pallas(flow, img, cfg)
    from .refine import flow_smoothing

    return flow_smoothing(flow, img, cfg, chunk)
