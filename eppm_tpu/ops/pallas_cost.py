"""Pallas TPU kernel for the dense residual patch cost — the hot op.

Computes, for K candidate offsets and a set of plane-hypothesis tap
tables, the bilateral AD+census patch cost between ``pack1`` and the
pre-warped frame-2 ``warped2`` (see ops/dense.py for the math and the
reference citations: _d_compute_patch_dist, bao_pmflow_kernel.cu:255-301;
plane hypotheses :334-513).

Why a kernel: the XLA formulation materializes an (H, W) intermediate per
tap x candidate x hypothesis (~3600 of them) — every term is a round trip
to HBM.  Here each grid step DMAs one image tile + halo into VMEM once and
streams all taps over it; HBM traffic drops by ~2 orders of magnitude.

Mosaic-shaped design (each point is a measured constraint of this
toolchain, not a stylistic choice):
  * channel-first (4, H, W) layout — minor dims are image rows/cols, so
    VMEM tiles are (8, 128)-dense; channel-last pads 4 channels onto 128
    lanes (32x VMEM waste).
  * the tap loop is a ``fori_loop`` over a scalar-prefetched offset table
    — fully unrolling 100 taps x 9 candidates x 4 tables makes Mosaic's
    compile superlinear (224 s for a 32-step body at one unlucky halo
    size; hours at full size).
  * tap shifts are ``pltpu.roll`` with *non-negative* dynamic amounts —
    dynamic VMEM slices must be provably 8/128-aligned, and negative
    dynamic roll shifts silently wrap modulo the vreg span (measured);
    ``(-d) mod dim`` keeps shifts positive and exact.
  * halos are full sublane/lane tiles (8 / 128): an 8-aligned window
    compiles ~100x faster than a 4-aligned one (measured 0.7 s vs 209 s).
  * candidates and hypothesis tables unroll *inside* the tap body as
    static slices of the rolled window; per-(candidate, table) cost and
    weight accumulators live in VMEM scratch.

CPU fallback: ops/dense.py's residual_costs is the semantic oracle; the
auto dispatcher uses it off-TPU (tests compare the two for equality).
"""

from __future__ import annotations

import functools
import math
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import CostConfig
from ._util import (
    on_tpu as _on_tpu,
    round_up as _round_up,
    tpu_params as _tpu_params,
)
from .cost import plane_offsets

__all__ = ["residual_costs_pallas", "residual_costs_auto"]


def _cost_kernel(
    taps_ref,            # (n_taps, 2 + 2*T) int32 scalar prefetch
    gws_ref,             # (n_taps, 1) float32 scalar prefetch
    pack1_ref, warped_ref,   # HBM
    out_ref,             # (K*T, TH, TW) VMEM block
    p1_ref, w2_ref, r1_ref, r2_ref, acc_ref, sem,
    *,
    cands: Tuple[Tuple[int, int], ...],
    chan_bases: Tuple[int, ...],
    n_taps: int,
    n_tables: int,
    HY: int, HX: int, TH: int, TW: int,
    lam_ad2: float, lam_cen2: float, inv_sig_r2: float,
):
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    WH = TH + 2 * HY
    WW = TW + 2 * HX

    copy1 = pltpu.make_async_copy(
        pack1_ref.at[:, pl.ds(ti * TH, WH), pl.ds(tj * TW, WW)],
        p1_ref, sem.at[0],
    )
    copy2 = pltpu.make_async_copy(
        warped_ref.at[:, pl.ds(ti * TH, WH), pl.ds(tj * TW, WW)],
        w2_ref, sem.at[1],
    )
    copy1.start()
    copy2.start()
    copy1.wait()
    copy2.wait()

    K = len(cands)
    acc_ref[:] = jnp.zeros((2 * K * n_tables, TH, TW), jnp.float32)

    p1v = p1_ref[:]
    w2v = w2_ref[:]
    c1r = p1v[0, HY : HY + TH, HX : HX + TW]
    c1g = p1v[1, HY : HY + TH, HX : HX + TW]
    c1b = p1v[2, HY : HY + TH, HX : HX + TW]
    centers2 = [
        (
            w2v[cb + 0, HY + cy : HY + cy + TH, HX + cx : HX + cx + TW],
            w2v[cb + 1, HY + cy : HY + cy + TH, HX + cx : HX + cx + TW],
            w2v[cb + 2, HY + cy : HY + cy + TH, HX + cx : HX + cx + TW],
        )
        for (cy, cx), cb in zip(cands, chan_bases)
    ]

    def tap_body(t, _):
        dy1 = taps_ref[t, 0]
        dx1 = taps_ref[t, 1]
        gw = gws_ref[t, 0]
        # Non-negative roll amounts (negative dynamic shifts miscompile).
        # Rolled windows are materialized into scratch refs: slicing a
        # roll *value* makes Mosaic re-derive the roll per use (~10x the
        # candidate-loop cost, measured); a ref load is just a load.
        r1_ref[:] = pltpu.roll(
            pltpu.roll(p1v, (WH - dy1) % WH, 1), (WW - dx1) % WW, 2
        )
        r1 = r1_ref[0, HY : HY + TH, HX : HX + TW]
        g1 = r1_ref[1, HY : HY + TH, HX : HX + TW]
        b1 = r1_ref[2, HY : HY + TH, HX : HX + TW]
        s1 = r1_ref[3, HY : HY + TH, HX : HX + TW].astype(jnp.int32)
        dr1 = jnp.maximum(
            jnp.maximum(jnp.abs(c1r - r1), jnp.abs(c1g - g1)),
            jnp.abs(c1b - b1),
        )
        e1 = jnp.exp(-(dr1 * dr1) * inv_sig_r2) * gw
        for tb in range(n_tables):
            dy2 = taps_ref[t, 2 + 2 * tb]
            dx2 = taps_ref[t, 3 + 2 * tb]
            r2_ref[:] = pltpu.roll(
                pltpu.roll(w2v, (WH - dy2) % WH, 1), (WW - dx2) % WW, 2
            )
            for k, ((cy, cx), cb) in enumerate(zip(cands, chan_bases)):
                r2 = r2_ref[cb + 0, HY + cy : HY + cy + TH, HX + cx : HX + cx + TW]
                g2 = r2_ref[cb + 1, HY + cy : HY + cy + TH, HX + cx : HX + cx + TW]
                b2 = r2_ref[cb + 2, HY + cy : HY + cy + TH, HX + cx : HX + cx + TW]
                s2 = r2_ref[cb + 3, HY + cy : HY + cy + TH, HX + cx : HX + cx + TW]
                ad = jnp.maximum(
                    jnp.maximum(jnp.abs(r1 - r2), jnp.abs(g1 - g2)),
                    jnp.abs(b1 - b2),
                )
                c_ad = 1.0 - jnp.exp(-(ad * ad) * (1.0 / lam_ad2))
                x = s1 ^ s2.astype(jnp.int32)
                x = x - ((x >> 1) & 0x55)
                x = (x & 0x33) + ((x >> 2) & 0x33)
                ham = ((x + (x >> 4)) & 0x0F).astype(jnp.float32)
                c_cen = 1.0 - jnp.exp(-(ham * ham) * (1.0 / lam_cen2))
                k2r, k2g, k2b = centers2[k]
                dr2 = jnp.maximum(
                    jnp.maximum(jnp.abs(k2r - r2), jnp.abs(k2g - g2)),
                    jnp.abs(k2b - b2),
                )
                wgt = jnp.exp(-(dr2 * dr2) * inv_sig_r2) * e1
                idx = 2 * (tb * K + k)
                acc_ref[idx] = acc_ref[idx] + wgt * (c_ad + c_cen)
                acc_ref[idx + 1] = acc_ref[idx + 1] + wgt
        return 0

    jax.lax.fori_loop(0, n_taps, tap_body, 0)

    for tb in range(n_tables):
        for k in range(K):
            idx = 2 * (tb * K + k)
            cost = acc_ref[idx] / jnp.maximum(acc_ref[idx + 1], 1e-30)
            # tie-stability quantization, same grid as the XLA oracle
            out_ref[tb * K + k] = jnp.round(cost * 131072.0) * (
                1.0 / 131072.0
            )


def _cost_kernel_sep(
    dys_ref, gys_ref,
    pack1_ref, warped_ref,   # HBM
    out_ref,             # (K, TH, TW) VMEM block
    p1_ref, w2_ref, p1s_ref, w2s_ref, e2_ref, acc_ref, sem,
    *,
    cands: Tuple[Tuple[int, int], ...],
    n_dys: int,
    dxs: Tuple[int, ...],
    gxs: Tuple[float, ...],
    HY: int, HX: int, TH: int, TW: int,
    lam_ad2: float, lam_cen2: float, inv_sig_r2: float,
):
    """Fronto-only (single tap table) variant of ``_cost_kernel``.

    The default tap grid is an outer product dys x dxs, so the tap loop
    separates: ONE dynamic y-roll per row offset materializes a slab,
    and every column offset (and candidate column) is a *static* slice
    of it — (n_dy*n_dx)*2 dynamic full-window rolls collapse to n_dy*2
    slab rolls.  Dynamic rolls cost several selects per element over
    the whole padded window; static slices are lane rotates on load.
    Candidate row offsets read the w2 slab at +-cmax rows (slab is
    sublane-extended by 8 each side, so cmax <= 8).

    Frame-2 range-weight hoist: dr2 for candidate c at tap d is
    maxabs3(W(p+c), W(p+c+d)) — a pure SHIFT by c of the candidate-
    independent field D_d(q) = maxabs3(W(q), W(q+d)).  Each tap
    therefore computes exp(-D_d^2/sig_r^2) ONCE on a candidate-extended
    region (e2_ref) and every candidate just slices it: the per-
    tap-candidate cost drops by one maxabs3 + one exp (~22% of kernel
    time at K=9), with bit-identical results.
    """
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    WH = TH + 2 * HY
    WW = TW + 2 * HX
    K = len(cands)

    copy1 = pltpu.make_async_copy(
        pack1_ref.at[:, pl.ds(ti * TH, WH), pl.ds(tj * TW, WW)],
        p1_ref, sem.at[0],
    )
    copy2 = pltpu.make_async_copy(
        warped_ref.at[:, pl.ds(ti * TH, WH), pl.ds(tj * TW, WW)],
        w2_ref, sem.at[1],
    )
    copy1.start()
    copy2.start()
    copy1.wait()
    copy2.wait()

    c1r = p1_ref[0, HY : HY + TH, HX : HX + TW]
    c1g = p1_ref[1, HY : HY + TH, HX : HX + TW]
    c1b = p1_ref[2, HY : HY + TH, HX : HX + TW]

    acc_ref[:] = jnp.zeros((2 * K, TH, TW), jnp.float32)

    def dy_body(t, _):
        dy = dys_ref[t, 0]
        gy = gys_ref[t, 0]
        sh = (WH - dy) % WH
        p1s_ref[:] = pltpu.roll(p1_ref[:], sh, 1)[:, HY : HY + TH, :]
        w2s_ref[:] = pltpu.roll(w2_ref[:], sh, 1)[
            :, HY - 8 : HY + TH + 8, :
        ]
        for dx, gx in zip(dxs, gxs):
            # hoisted frame-2 range weight E(a, b) over the candidate-
            # extended region: rows HY-8.., cols HX-8.. of the window
            # paired with the dy-rolled slab at column offset +dx
            wr = w2_ref[0, HY - 8 : HY + TH + 8, HX - 8 : HX + TW + 8]
            wg = w2_ref[1, HY - 8 : HY + TH + 8, HX - 8 : HX + TW + 8]
            wb = w2_ref[2, HY - 8 : HY + TH + 8, HX - 8 : HX + TW + 8]
            tr = w2s_ref[0, :, HX - 8 + dx : HX + TW + 8 + dx]
            tg = w2s_ref[1, :, HX - 8 + dx : HX + TW + 8 + dx]
            tb = w2s_ref[2, :, HX - 8 + dx : HX + TW + 8 + dx]
            d2f = jnp.maximum(
                jnp.maximum(jnp.abs(wr - tr), jnp.abs(wg - tg)),
                jnp.abs(wb - tb),
            )
            e2_ref[:] = jnp.exp(-(d2f * d2f) * inv_sig_r2)

            r1 = p1s_ref[0, :, HX + dx : HX + dx + TW]
            g1 = p1s_ref[1, :, HX + dx : HX + dx + TW]
            b1 = p1s_ref[2, :, HX + dx : HX + dx + TW]
            s1 = p1s_ref[3, :, HX + dx : HX + dx + TW].astype(jnp.int32)
            dr1 = jnp.maximum(
                jnp.maximum(jnp.abs(c1r - r1), jnp.abs(c1g - g1)),
                jnp.abs(c1b - b1),
            )
            e1 = jnp.exp(-(dr1 * dr1) * inv_sig_r2) * (gy * gx)
            for k, (cy, cx) in enumerate(cands):
                ro = 8 + cy
                co = HX + dx + cx
                r2 = w2s_ref[0, ro : ro + TH, co : co + TW]
                g2 = w2s_ref[1, ro : ro + TH, co : co + TW]
                b2 = w2s_ref[2, ro : ro + TH, co : co + TW]
                s2 = w2s_ref[3, ro : ro + TH, co : co + TW]
                ad = jnp.maximum(
                    jnp.maximum(jnp.abs(r1 - r2), jnp.abs(g1 - g2)),
                    jnp.abs(b1 - b2),
                )
                c_ad = 1.0 - jnp.exp(-(ad * ad) * (1.0 / lam_ad2))
                x = s1 ^ s2.astype(jnp.int32)
                x = x - ((x >> 1) & 0x55)
                x = (x & 0x33) + ((x >> 2) & 0x33)
                ham = ((x + (x >> 4)) & 0x0F).astype(jnp.float32)
                c_cen = 1.0 - jnp.exp(-(ham * ham) * (1.0 / lam_cen2))
                wgt = e2_ref[8 + cy : 8 + cy + TH, 8 + cx : 8 + cx + TW] * e1
                # accumulate by read-modify-write on the scratch ref —
                # holding 2K accumulators as live values across the
                # unrolled loop is the other half of the stack blow-up
                acc_ref[2 * k] = acc_ref[2 * k] + wgt * (c_ad + c_cen)
                acc_ref[2 * k + 1] = acc_ref[2 * k + 1] + wgt
        return 0

    jax.lax.fori_loop(0, n_dys, dy_body, 0)

    for k in range(K):
        cost = acc_ref[2 * k] / jnp.maximum(acc_ref[2 * k + 1], 1e-30)
        out_ref[k] = jnp.round(cost * 131072.0) * (1.0 / 131072.0)


def _residual_costs_sep(
    pack1: jnp.ndarray,
    warped2: jnp.ndarray,
    cand_offsets: Sequence[Tuple[int, int]],
    cfg: CostConfig,
    tile: Tuple[int, int] = (64, 512),
    interpret: bool = False,
) -> jnp.ndarray:
    """Separable-grid dispatch target of ``residual_costs_pallas`` for
    ``use_planes=False`` (the default path since fronto-only refine
    measured EPE-neutral)."""
    h, w = pack1.shape[0], pack1.shape[1]
    taps = tuple(cfg.tap_offsets)
    dys_l = sorted({i for (i, _) in taps})
    dxs_l = sorted({j for (_, j) in taps})
    assert len(dys_l) * len(dxs_l) == len(taps)
    sig_s2 = cfg.sigma_spatial * cfg.sigma_spatial
    dys = np.asarray([[d] for d in dys_l], np.int32)
    gys = np.asarray(
        [[math.exp(-(d * d) / sig_s2)] for d in dys_l], np.float32
    )
    gxs = tuple(math.exp(-(d * d) / sig_s2) for d in dxs_l)

    R = cfg.patch_radius
    cmax = max(max(abs(a), abs(b)) for (a, b) in cand_offsets)
    assert cmax <= 8, "separable kernel slab covers candidate rows <= 8"
    reach = max(cmax + R, R)

    TH, TW = tile
    TH = min(TH, _round_up(h, 8))
    TW = min(TW, _round_up(w, 128))
    HY = max(8, _round_up(reach, 8))
    HX = _round_up(reach, 128)
    K = len(cand_offsets)

    def vmem_bytes(th, tw):
        win = 4 * (th + 2 * HY) * (tw + 2 * HX) * 4
        slab = 4 * th * (tw + 2 * HX) * 4 + 4 * (th + 16) * (tw + 2 * HX) * 4
        e2 = (th + 16) * (tw + 16) * 4
        acc = 2 * K * th * tw * 4
        outb = 2 * K * th * tw * 4
        return 2 * win + slab + e2 + acc + outb

    while TH > 8 and vmem_bytes(TH, TW) > 14 * 2**20:
        TH = max(8, _round_up(TH // 2, 8))

    ph = (-h) % TH
    pw = (-w) % TW
    hp, wp = h + ph, w + pw

    p1 = jnp.moveaxis(pack1, -1, 0)
    wd = jnp.moveaxis(warped2, -1, 0)
    pack1p = jnp.pad(p1, ((0, 0), (HY, HY + ph), (HX, HX + pw)), mode="edge")
    warped2p = jnp.pad(wd, ((0, 0), (HY, HY + ph), (HX, HX + pw)), mode="edge")

    kern = functools.partial(
        _cost_kernel_sep,
        cands=tuple(cand_offsets),
        n_dys=len(dys_l),
        dxs=tuple(dxs_l),
        gxs=gxs,
        HY=HY, HX=HX, TH=TH, TW=TW,
        lam_ad2=cfg.lambda_ad**2,
        lam_cen2=(cfg.lambda_census * cfg.census_max_diff) ** 2,
        inv_sig_r2=1.0 / (cfg.sigma_range**2),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(hp // TH, wp // TW),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((K, TH, TW), lambda i, j, *_: (0, i, j)),
        scratch_shapes=[
            pltpu.VMEM((4, TH + 2 * HY, TW + 2 * HX), jnp.float32),
            pltpu.VMEM((4, TH + 2 * HY, TW + 2 * HX), jnp.float32),
            pltpu.VMEM((4, TH, TW + 2 * HX), jnp.float32),
            pltpu.VMEM((4, TH + 16, TW + 2 * HX), jnp.float32),
            pltpu.VMEM((TH + 16, TW + 16), jnp.float32),
            pltpu.VMEM((2 * K, TH, TW), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        compiler_params=_tpu_params(),
        out_shape=jax.ShapeDtypeStruct((K, hp, wp), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(dys), jnp.asarray(gys), pack1p, warped2p)
    return out[:, :h, :w]


def residual_costs_pallas(
    pack1: jnp.ndarray,
    warped2: jnp.ndarray,
    cand_offsets: Sequence[Tuple[int, int]],
    cfg: CostConfig,
    use_planes: bool = True,
    tile: Tuple[int, int] = (128, 128),
) -> jnp.ndarray:
    """Per-candidate residual cost, min over plane hypotheses: (K, H, W).

    Semantically identical to ops.dense.residual_costs (the XLA oracle).
    """
    if not use_planes:
        taps = tuple(cfg.tap_offsets)
        dys_l = {i for (i, _) in taps}
        dxs_l = {j for (_, j) in taps}
        cmax = max(max(abs(a), abs(b)) for (a, b) in cand_offsets)
        if len(dys_l) * len(dxs_l) == len(taps) and cmax <= 8:
            return _residual_costs_sep(pack1, warped2, cand_offsets, cfg)
    h, w = pack1.shape[0], pack1.shape[1]
    tables = plane_offsets(cfg) if use_planes else [tuple(cfg.tap_offsets)]
    T = len(tables)
    sig_s2 = cfg.sigma_spatial * cfg.sigma_spatial
    n_taps = len(cfg.tap_offsets)
    taps_arr = np.zeros((n_taps, 2 + 2 * T), np.int32)
    gws_arr = np.zeros((n_taps, 1), np.float32)
    for t, (dy1, dx1) in enumerate(cfg.tap_offsets):
        taps_arr[t, 0] = dy1
        taps_arr[t, 1] = dx1
        gws_arr[t, 0] = math.exp(-(dy1 * dy1) / sig_s2) * math.exp(
            -(dx1 * dx1) / sig_s2
        )
        for tb, table in enumerate(tables):
            taps_arr[t, 2 + 2 * tb] = table[t][0]
            taps_arr[t, 3 + 2 * tb] = table[t][1]

    R = cfg.patch_radius
    cmax = max(max(abs(a), abs(b)) for (a, b) in cand_offsets)
    tmax = max(max(abs(i), abs(j)) for tbl in tables for (i, j) in tbl)
    reach = max(cmax + tmax, R)

    TH, TW = tile
    TH = min(TH, _round_up(h, 8))
    TW = min(TW, _round_up(w, 128))
    HY = _round_up(reach, 8)
    HX = _round_up(reach, 128)

    # VMEM budget: 4 window scratches + accumulators + double-buffered out
    # block; shrink the tile's sublane extent for large K so the scoped
    # VMEM stays under the hardware limit.
    K = len(cand_offsets)

    def vmem_bytes(th, tw):
        win = 4 * (th + 2 * HY) * (tw + 2 * HX) * 4
        acc = 2 * K * T * th * tw * 4
        outb = 2 * K * T * th * tw * 4
        return 4 * win + acc + outb

    while TH > 8 and vmem_bytes(TH, TW) > 14 * 2**20:
        TH = max(8, _round_up(TH // 2, 8))

    ph = (-h) % TH
    pw = (-w) % TW
    hp, wp = h + ph, w + pw

    p1 = jnp.moveaxis(pack1, -1, 0)
    wd = jnp.moveaxis(warped2, -1, 0)
    pack1p = jnp.pad(p1, ((0, 0), (HY, HY + ph), (HX, HX + pw)), mode="edge")
    warped2p = jnp.pad(wd, ((0, 0), (HY, HY + ph), (HX, HX + pw)), mode="edge")

    kern = functools.partial(
        _cost_kernel,
        cands=tuple(cand_offsets),
        chan_bases=(0,) * K,
        n_taps=n_taps,
        n_tables=T,
        HY=HY, HX=HX, TH=TH, TW=TW,
        lam_ad2=cfg.lambda_ad**2,
        lam_cen2=(cfg.lambda_census * cfg.census_max_diff) ** 2,
        inv_sig_r2=1.0 / (cfg.sigma_range**2),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(hp // TH, wp // TW),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (K * T, TH, TW), lambda i, j, *_: (0, i, j)
        ),
        scratch_shapes=[
            pltpu.VMEM((4, TH + 2 * HY, TW + 2 * HX), jnp.float32),
            pltpu.VMEM((4, TH + 2 * HY, TW + 2 * HX), jnp.float32),
            pltpu.VMEM((4, TH + 2 * HY, TW + 2 * HX), jnp.float32),
            pltpu.VMEM((4, TH + 2 * HY, TW + 2 * HX), jnp.float32),
            pltpu.VMEM((2 * K * T, TH, TW), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        compiler_params=_tpu_params(),
        out_shape=jax.ShapeDtypeStruct((K * T, hp, wp), jnp.float32),
    )(jnp.asarray(taps_arr), jnp.asarray(gws_arr), pack1p, warped2p)

    out = out[:, :h, :w].reshape(T, K, h, w)
    return out.min(axis=0)


def residual_costs_multiwarp_pallas(
    pack1: jnp.ndarray,
    warped_stack: jnp.ndarray,
    cfg: CostConfig,
    tile: Tuple[int, int] = (128, 128),
) -> jnp.ndarray:
    """Fronto-parallel residual cost of K *different* warped frames in one
    kernel launch: warped_stack (K, H, W, 4) -> (K, H, W).

    Used by the dense matcher's propagation rounds (ops/match.py
    rescore_multi), where K candidate flow fields each produce their own
    warp; evaluating them as channel groups of one window avoids K
    sequential kernel dispatches.
    """
    K, h, w = warped_stack.shape[0], warped_stack.shape[1], warped_stack.shape[2]
    sig_s2 = cfg.sigma_spatial * cfg.sigma_spatial
    n_taps = len(cfg.tap_offsets)
    taps_arr = np.zeros((n_taps, 4), np.int32)
    gws_arr = np.zeros((n_taps, 1), np.float32)
    for t, (dy1, dx1) in enumerate(cfg.tap_offsets):
        taps_arr[t] = (dy1, dx1, dy1, dx1)
        gws_arr[t, 0] = math.exp(-(dy1 * dy1) / sig_s2) * math.exp(
            -(dx1 * dx1) / sig_s2
        )

    R = cfg.patch_radius
    TH, TW = tile
    TH = min(TH, _round_up(h, 8))
    TW = min(TW, _round_up(w, 128))
    HY = _round_up(R, 8)
    HX = _round_up(R, 128)
    C2 = 4 * K

    def vmem_bytes(th, tw):
        win1 = 4 * (th + 2 * HY) * (tw + 2 * HX) * 4
        win2 = C2 * (th + 2 * HY) * (tw + 2 * HX) * 4
        acc = 2 * K * th * tw * 4
        outb = 2 * K * th * tw * 4
        return 2 * win1 + 2 * win2 + acc + outb

    # tighter budget than the single-warp kernel: the wide (4K-channel)
    # windows leave less headroom for the compiler's own scoped buffers
    # (the helper crashes without a diagnostic when exceeded)
    while TH > 8 and vmem_bytes(TH, TW) > 9 * 2**20:
        TH = max(8, _round_up(TH // 2, 8))

    ph = (-h) % TH
    pw = (-w) % TW
    hp, wp = h + ph, w + pw
    p1 = jnp.moveaxis(pack1, -1, 0)
    # (K, H, W, 4) -> (4K, H, W), candidate k in channels 4k..4k+3
    wd = jnp.moveaxis(warped_stack, -1, 1).reshape(C2, h, w)
    pack1p = jnp.pad(p1, ((0, 0), (HY, HY + ph), (HX, HX + pw)), mode="edge")
    warpedp = jnp.pad(wd, ((0, 0), (HY, HY + ph), (HX, HX + pw)), mode="edge")

    kern = functools.partial(
        _cost_kernel,
        cands=((0, 0),) * K,
        chan_bases=tuple(4 * k for k in range(K)),
        n_taps=n_taps,
        n_tables=1,
        HY=HY, HX=HX, TH=TH, TW=TW,
        lam_ad2=cfg.lambda_ad**2,
        lam_cen2=(cfg.lambda_census * cfg.census_max_diff) ** 2,
        inv_sig_r2=1.0 / (cfg.sigma_range**2),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(hp // TH, wp // TW),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((K, TH, TW), lambda i, j, *_: (0, i, j)),
        scratch_shapes=[
            pltpu.VMEM((4, TH + 2 * HY, TW + 2 * HX), jnp.float32),
            pltpu.VMEM((C2, TH + 2 * HY, TW + 2 * HX), jnp.float32),
            pltpu.VMEM((4, TH + 2 * HY, TW + 2 * HX), jnp.float32),
            pltpu.VMEM((C2, TH + 2 * HY, TW + 2 * HX), jnp.float32),
            pltpu.VMEM((2 * K, TH, TW), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        compiler_params=_tpu_params(),
        out_shape=jax.ShapeDtypeStruct((K, hp, wp), jnp.float32),
    )(jnp.asarray(taps_arr), jnp.asarray(gws_arr), pack1p, warpedp)
    return out[:, :h, :w]


def residual_costs_auto(
    pack1: jnp.ndarray,
    warped2: jnp.ndarray,
    cand_offsets: Sequence[Tuple[int, int]],
    cfg: CostConfig,
    use_planes: bool = True,
    tap_chunk: int = 25,
) -> jnp.ndarray:
    """Dispatch: Pallas kernel on TPU, XLA oracle elsewhere."""
    if _on_tpu():
        return residual_costs_pallas(
            pack1, warped2, cand_offsets, cfg, use_planes
        )
    from .dense import residual_costs

    return residual_costs(
        pack1, warped2, cand_offsets, cfg, use_planes, tap_chunk
    )
