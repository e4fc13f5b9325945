"""Pallas TPU kernel for the weighted median displacement filter.

Spec: ``d_weighted_median_filtering`` (bao_pmflow_refine_kernel.cu:206-286)
— for each pixel, every valid displacement in the (2R+1)^2 window is a
candidate; the winner minimizes the bilateral-weighted L-inf deviation
from the window's valid displacements; iterated (20x occlusion-only on
the coarsest level, bao_flow_patchmatch_multiscale_cuda.cpp:239).
ops/refine.py's ``weighted_median_filter`` is the XLA oracle with
identical semantics; this kernel exists because the XLA form dispatches
81 x 81 x 20 small stencil ops (~560 ms at 160x120 — 75% of the whole
pipeline), while here the entire iteration runs out of VMEM in a single
kernel launch.

Structure: the full (coarse-level) image lives in VMEM; candidate and
support windows iterate in 2-level blocked loops so each dynamic roll of
the displacement planes is reused across a block of pairs; the bilateral
support weights (image-dependent, iteration-invariant) are precomputed in
XLA, stored (81, H, W) in HBM, and DMA'd slab-by-slab.  The 20 Jacobi
iterations run inside the kernel — zero HBM round trips between them.

Padding doubles as the boundary mask: arrays are padded to vreg-aligned
dims with valid=0, so circular rolls wrap into dead (zero-weight) pixels
— provided pad >= window radius on each axis, which the caller enforces.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import FLT_MAX, INVALID_LOCATION, RefineConfig
from ._util import (
    on_tpu as _on_tpu,
    round_up as _round_up,
    tpu_params as _tpu_params,
)

__all__ = [
    "weighted_median_filter_pallas",
    "weighted_median_filter_auto",
    "wmf_polish_occlusions",
]


def _wmf_kernel(
    offs_ref,                       # (81, 2) int32 window offsets
    ox_in, oy_in, valid_in, wimg_ref,   # inputs (wimg in HBM)
    ox_out, oy_out, valid_out,      # outputs (VMEM)
    ox_ref, oy_ref, val_ref,        # state planes
    c_ref,                          # (3*SB, H, W) candidate-block rolls
    s_ref,                          # (3*SB, H, W) support-block rolls
    w_ref,                          # (SB, H, W) DMA'd support weights
    acc_ref,                        # (2*SB, H, W) per-candidate cost/weight
    best_ref,                       # (3, H, W) best cost/ox/oy
    sem,
    *,
    n_offs: int,
    SB: int,
    num_iter: int,
    only_occlusion: bool,
    HP: int, WP: int,
    freeze_valid: bool = False,
):
    ox_ref[:] = ox_in[:]
    oy_ref[:] = oy_in[:]
    val_ref[:] = valid_in[:]
    n_blocks = n_offs // SB

    def roll2(x, dy, dx):
        return pltpu.roll(pltpu.roll(x, (HP - dy) % HP, 0), (WP - dx) % WP, 1)

    def one_iter(it, _):
        ox = ox_ref[:]
        oy = oy_ref[:]
        val = val_ref[:]
        best_ref[0] = jnp.full((HP, WP), FLT_MAX, jnp.float32)
        best_ref[1] = ox
        best_ref[2] = oy

        def c_block(cb, _):
            # roll the SB candidates of this block
            def load_c(i, _):
                dy = offs_ref[cb * SB + i, 0]
                dx = offs_ref[cb * SB + i, 1]
                c_ref[3 * i] = roll2(ox, dy, dx)
                c_ref[3 * i + 1] = roll2(oy, dy, dx)
                c_ref[3 * i + 2] = roll2(val, dy, dx)
                return 0

            jax.lax.fori_loop(0, SB, load_c, 0)
            acc_ref[:] = jnp.zeros((2 * SB, HP, WP), jnp.float32)

            def s_block(sb, _):
                cp = pltpu.make_async_copy(
                    wimg_ref.at[pl.ds(sb * SB, SB)], w_ref, sem
                )
                cp.start()

                def load_s(i, _):
                    dy = offs_ref[sb * SB + i, 0]
                    dx = offs_ref[sb * SB + i, 1]
                    s_ref[3 * i] = roll2(ox, dy, dx)
                    s_ref[3 * i + 1] = roll2(oy, dy, dx)
                    s_ref[3 * i + 2] = roll2(val, dy, dx)
                    return 0

                jax.lax.fori_loop(0, SB, load_s, 0)
                cp.wait()
                for si in range(SB):
                    sox = s_ref[3 * si]
                    soy = s_ref[3 * si + 1]
                    w = w_ref[si] * s_ref[3 * si + 2]
                    for ci in range(SB):
                        dev = jnp.maximum(
                            jnp.abs(c_ref[3 * ci] - sox),
                            jnp.abs(c_ref[3 * ci + 1] - soy),
                        )
                        acc_ref[2 * ci] = acc_ref[2 * ci] + w * dev
                        acc_ref[2 * ci + 1] = acc_ref[2 * ci + 1] + w
                return 0

            jax.lax.fori_loop(0, n_blocks, s_block, 0)

            for ci in range(SB):
                cost = jnp.where(
                    c_ref[3 * ci + 2] > 0, acc_ref[2 * ci], FLT_MAX
                )
                better = (acc_ref[2 * ci + 1] > 0) & (cost < best_ref[0])
                best_ref[0] = jnp.where(better, cost, best_ref[0])
                best_ref[1] = jnp.where(better, c_ref[3 * ci], best_ref[1])
                best_ref[2] = jnp.where(
                    better, c_ref[3 * ci + 1], best_ref[2]
                )
            return 0

        jax.lax.fori_loop(0, n_blocks, c_block, 0)

        # negative reconstructed targets are not written (the reference's
        # write guard, refine_kernel.cu:286)
        ys_f = jax.lax.broadcasted_iota(jnp.int32, (HP, WP), 0).astype(
            jnp.float32
        )
        xs_f = jax.lax.broadcasted_iota(jnp.int32, (HP, WP), 1).astype(
            jnp.float32
        )
        found = (
            (best_ref[0] < FLT_MAX)
            & (best_ref[1] + xs_f >= 0)
            & (best_ref[2] + ys_f >= 0)
        )
        if only_occlusion:
            replace = found & (val_ref[:] == 0)
        else:
            replace = found
        ox_ref[:] = jnp.where(replace, best_ref[1], ox_ref[:])
        oy_ref[:] = jnp.where(replace, best_ref[2], oy_ref[:])
        if not freeze_valid:
            # replaced pixels join the valid set for later iterations
            # (Jacobi diffusion).  freeze_valid keeps the original set:
            # every iteration re-medians holes from originally-valid
            # data only, so reconstruction errors never compound inward.
            val_ref[:] = jnp.where(replace, 1.0, val_ref[:])
        return 0

    jax.lax.fori_loop(0, num_iter, one_iter, 0)
    ox_out[:] = ox_ref[:]
    oy_out[:] = oy_ref[:]
    valid_out[:] = val_ref[:]


def weighted_median_filter_pallas(
    tx: jnp.ndarray,
    ty: jnp.ndarray,
    img: jnp.ndarray,
    cfg: RefineConfig = RefineConfig(),
    num_iter: int = 1,
    only_occlusion: bool = False,
    polish_init: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    dilation: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in for ops.refine.weighted_median_filter on TPU.

    Semantics notes vs the oracle: replaced pixels become valid for
    subsequent iterations in both implementations; INVALID target fields
    are reconstructed as offset+position for replaced pixels and passed
    through unchanged otherwise.

    ``polish_init`` (tx_fill, ty_fill) switches to frozen-valid polish
    mode (see ``wmf_polish_occlusions``): holes start from the given
    fill, every iteration re-medians them from ORIGINALLY-valid window
    data (holes never join the valid set), and holes beyond the window's
    reach keep their fill.  The output is fully valid.

    ``dilation`` scales the window offsets (jump-flood style): radius-4
    at dilation 4 reaches 16 px with the same 81 samples — the tool for
    re-medianing wide occluded bands from original data.  The spatial
    weight table keeps its undilated values (sigma effectively scales
    with the dilation) so relative weighting within the window is
    unchanged.  The image term of the bilateral weight is still the true
    color difference at the dilated offset.
    """
    from ..config import INVALID_LOCATION

    h, w = tx.shape
    r = cfg.wmf_radius
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    valid = ((tx >= 0) & (ty >= 0)).astype(jnp.float32)
    if polish_init is not None:
        ftx, fty = polish_init
        tx = jnp.where(valid > 0, tx, ftx)
        ty = jnp.where(valid > 0, ty, fty)
        ox = (tx - xs).astype(jnp.float32)
        oy = (ty - ys).astype(jnp.float32)
    else:
        ox = jnp.where(valid > 0, (tx - xs).astype(jnp.float32), 0.0)
        oy = jnp.where(valid > 0, (ty - ys).astype(jnp.float32), 0.0)

    # pad to vreg-aligned dims; pad area has valid=0 (boundary mask).
    # The pad must cover the window's true reach r*dilation on every
    # side so circular rolls always wrap into dead (valid=0) pixels.
    reach = r * dilation
    HP = _round_up(h, 8) + _round_up(max(8, reach), 8)
    WP = _round_up(w + 2 * reach, 128)
    pys, pxs = HP - h, WP - w
    oxp = jnp.pad(ox, ((0, pys), (0, pxs)))
    oyp = jnp.pad(oy, ((0, pys), (0, pxs)))
    vp = jnp.pad(valid, ((0, pys), (0, pxs)))

    # bilateral support weights, iteration-invariant (image term)
    offs = [
        (dy * dilation, dx * dilation)
        for dy in range(-r, r + 1) for dx in range(-r, r + 1)
    ]
    sig_s2 = cfg.wmf_sigma_spatial**2
    sig_r2 = cfg.wmf_sigma_range**2
    # spatial term from UNDILATED offsets (see the dilation note above)
    gws = np.asarray(
        [
            math.exp(-(dy * dy) / sig_s2) * math.exp(-(dx * dx) / sig_s2)
            for dy in range(-r, r + 1) for dx in range(-r, r + 1)
        ],
        np.float32,
    )
    pimg = jnp.pad(img, ((reach, reach), (reach, reach), (0, 0)),
                   mode="edge")
    wimgs = []
    for k, (dy, dx) in enumerate(offs):
        spix = jax.lax.dynamic_slice(
            pimg, (reach + dy, reach + dx, 0), (h, w, 3)
        )
        d = jnp.abs(spix - img)
        dr = jnp.maximum(jnp.maximum(d[..., 0], d[..., 1]), d[..., 2])
        wimgs.append(jnp.exp(-(dr * dr) / sig_r2) * gws[k])
    wimg = jnp.pad(jnp.stack(wimgs), ((0, 0), (0, pys), (0, pxs)))

    n_offs = len(offs)
    SB = 9  # block size; 81 = 9 x 9
    offs_arr = jnp.asarray(offs, jnp.int32)

    kern = functools.partial(
        _wmf_kernel,
        n_offs=n_offs, SB=SB, num_iter=num_iter,
        only_occlusion=only_occlusion or polish_init is not None,
        HP=HP, WP=WP, freeze_valid=polish_init is not None,
    )
    plane = lambda n: pltpu.VMEM((n, HP, WP), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        scratch_shapes=[
            pltpu.VMEM((HP, WP), jnp.float32),
            pltpu.VMEM((HP, WP), jnp.float32),
            pltpu.VMEM((HP, WP), jnp.float32),
            plane(3 * SB),
            plane(3 * SB),
            plane(SB),
            plane(2 * SB),
            plane(3),
            pltpu.SemaphoreType.DMA,
        ],
    )
    ox2, oy2, v2 = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        compiler_params=_tpu_params(),
        out_shape=[jax.ShapeDtypeStruct((HP, WP), jnp.float32)] * 3,
    )(offs_arr, oxp, oyp, vp, wimg)

    ox2 = ox2[:h, :w]
    oy2 = oy2[:h, :w]
    if polish_init is not None:
        # polish mode: every pixel carries a value (valid ones untouched,
        # holes polished or keeping their fill) — output is fully valid
        return ox2.astype(jnp.int32) + xs, oy2.astype(jnp.int32) + ys
    v2 = v2[:h, :w] > 0
    new_tx = jnp.where(v2, ox2.astype(jnp.int32) + xs, tx)
    new_ty = jnp.where(v2, oy2.astype(jnp.int32) + ys, ty)
    return new_tx, new_ty


def _wmf_tile_kernel(
    offs_ref, gws_ref,
    state_in,             # (6, HP, WP): ox, oy, valid, r, g, b (HBM)
    ox_out, oy_out, valid_out,
    win_ref,              # (6, WH, WW) windowed state
    c_ref, s_ref, w_ref, acc_ref, best_ref, sem,
    *,
    n_offs: int, SB: int, only_occlusion: bool,
    HY: int, HX: int, TH: int, TW: int,
    inv_sig_r2: float,
    freeze_valid: bool = False,
):
    """One WMF Jacobi iteration over a (TH, TW) tile with halo — the
    large-image form (whole-image state stays in HBM between iterations;
    the iteration loop lives in XLA).  Bilateral image weights are
    computed in-kernel from the windowed image planes (one pass per tile,
    stored in ``w_ref``)."""
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    WH = TH + 2 * HY
    WW = TW + 2 * HX
    cp = pltpu.make_async_copy(
        state_in.at[:, pl.ds(ti * TH, WH), pl.ds(tj * TW, WW)],
        win_ref, sem,
    )
    cp.start()
    cp.wait()

    ox = win_ref[0]
    oy = win_ref[1]
    val = win_ref[2]
    n_blocks = n_offs // SB

    def roll2(x, dy, dx):
        return pltpu.roll(pltpu.roll(x, (WH - dy) % WH, 0), (WW - dx) % WW, 1)

    def crop(x):
        return x[HY : HY + TH, HX : HX + TW]

    # bilateral image weights for all supports, once per tile
    c_r, c_g, c_b = crop(win_ref[3]), crop(win_ref[4]), crop(win_ref[5])

    def wgt_body(s, _):
        dy = offs_ref[s, 0]
        dx = offs_ref[s, 1]
        pr = crop(roll2(win_ref[3], dy, dx))
        pg = crop(roll2(win_ref[4], dy, dx))
        pb = crop(roll2(win_ref[5], dy, dx))
        dr = jnp.maximum(
            jnp.maximum(jnp.abs(pr - c_r), jnp.abs(pg - c_g)),
            jnp.abs(pb - c_b),
        )
        w_ref[s] = jnp.exp(-(dr * dr) * inv_sig_r2) * gws_ref[s, 0]
        return 0

    jax.lax.fori_loop(0, n_offs, wgt_body, 0)

    best_ref[0] = jnp.full((TH, TW), FLT_MAX, jnp.float32)
    best_ref[1] = crop(ox)
    best_ref[2] = crop(oy)

    def c_block(cb, _):
        def load_c(i, _):
            dy = offs_ref[cb * SB + i, 0]
            dx = offs_ref[cb * SB + i, 1]
            c_ref[3 * i] = crop(roll2(ox, dy, dx))
            c_ref[3 * i + 1] = crop(roll2(oy, dy, dx))
            c_ref[3 * i + 2] = crop(roll2(val, dy, dx))
            return 0

        jax.lax.fori_loop(0, SB, load_c, 0)
        acc_ref[:] = jnp.zeros((2 * SB, TH, TW), jnp.float32)

        def s_block(sb, _):
            def load_s(i, _):
                dy = offs_ref[sb * SB + i, 0]
                dx = offs_ref[sb * SB + i, 1]
                s_ref[3 * i] = crop(roll2(ox, dy, dx))
                s_ref[3 * i + 1] = crop(roll2(oy, dy, dx))
                s_ref[3 * i + 2] = crop(roll2(val, dy, dx))
                return 0

            jax.lax.fori_loop(0, SB, load_s, 0)
            for si in range(SB):
                sox = s_ref[3 * si]
                soy = s_ref[3 * si + 1]
                w = (
                    w_ref[pl.ds(sb * SB + si, 1)][0]
                    * s_ref[3 * si + 2]
                )
                for ci in range(SB):
                    dev = jnp.maximum(
                        jnp.abs(c_ref[3 * ci] - sox),
                        jnp.abs(c_ref[3 * ci + 1] - soy),
                    )
                    acc_ref[2 * ci] = acc_ref[2 * ci] + w * dev
                    acc_ref[2 * ci + 1] = acc_ref[2 * ci + 1] + w
            return 0

        jax.lax.fori_loop(0, n_blocks, s_block, 0)

        for ci in range(SB):
            cost = jnp.where(c_ref[3 * ci + 2] > 0, acc_ref[2 * ci], FLT_MAX)
            better = (acc_ref[2 * ci + 1] > 0) & (cost < best_ref[0])
            best_ref[0] = jnp.where(better, cost, best_ref[0])
            best_ref[1] = jnp.where(better, c_ref[3 * ci], best_ref[1])
            best_ref[2] = jnp.where(better, c_ref[3 * ci + 1], best_ref[2])
        return 0

    jax.lax.fori_loop(0, n_blocks, c_block, 0)

    # negative reconstructed targets are not written (the reference's
    # write guard, refine_kernel.cu:286)
    ys_f = (
        jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 0) + ti * TH
    ).astype(jnp.float32)
    xs_f = (
        jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 1) + tj * TW
    ).astype(jnp.float32)
    found = (
        (best_ref[0] < FLT_MAX)
        & (best_ref[1] + xs_f >= 0)
        & (best_ref[2] + ys_f >= 0)
    )
    cval = crop(val)
    if only_occlusion:
        replace = found & (cval == 0)
    else:
        replace = found
    ox_out[:] = jnp.where(replace, best_ref[1], crop(ox))
    oy_out[:] = jnp.where(replace, best_ref[2], crop(oy))
    if freeze_valid:
        # polish mode (wmf_polish_occlusions): holes stay out of the
        # valid set so later iterations keep re-medianing them from
        # originally-valid data only
        valid_out[:] = cval
    else:
        valid_out[:] = jnp.where(replace, 1.0, cval)


def _wmf_tiled(
    tx, ty, img, cfg: RefineConfig, num_iter: int, only_occlusion: bool,
    tile: Tuple[int, int] = (128, 128),
    polish_init: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    dilation: int = 1,
):
    """Large-image WMF: per-iteration tiled kernel, state in HBM.

    The (128, 128) tile keeps the ~162 scratch planes (81 support
    weights + candidate/support/accumulator blocks) under the 16 MB
    scoped-VMEM limit; larger tiles crash the Mosaic compile helper.
    """
    import functools as _ft

    from ..config import INVALID_LOCATION

    h, w = tx.shape
    r = cfg.wmf_radius
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    valid = ((tx >= 0) & (ty >= 0)).astype(jnp.float32)
    if polish_init is not None:
        ftx, fty = polish_init
        tx = jnp.where(valid > 0, tx, ftx)
        ty = jnp.where(valid > 0, ty, fty)
        ox = (tx - xs).astype(jnp.float32)
        oy = (ty - ys).astype(jnp.float32)
    else:
        ox = jnp.where(valid > 0, (tx - xs).astype(jnp.float32), 0.0)
        oy = jnp.where(valid > 0, (ty - ys).astype(jnp.float32), 0.0)

    TH, TW = tile
    TH = min(TH, _round_up(h, 8))
    TW = min(TW, _round_up(w, 128))
    reach = r * dilation
    HY = _round_up(reach, 8)
    HX = _round_up(reach, 128)
    ph = (-h) % TH
    pw = (-w) % TW
    hp, wp = h + ph, w + pw

    import math as _math

    offs = [
        (dy * dilation, dx * dilation)
        for dy in range(-r, r + 1) for dx in range(-r, r + 1)
    ]
    sig_s2 = cfg.wmf_sigma_spatial**2
    # spatial term from UNDILATED offsets (sigma scales with dilation)
    gws = np.asarray(
        [
            [_math.exp(-(dy * dy) / sig_s2) * _math.exp(-(dx * dx) / sig_s2)]
            for dy in range(-r, r + 1) for dx in range(-r, r + 1)
        ],
        np.float32,
    )

    SB = 9
    offs_arr = jnp.asarray(offs, jnp.int32)
    kern = _ft.partial(
        _wmf_tile_kernel,
        n_offs=len(offs), SB=SB,
        only_occlusion=only_occlusion or polish_init is not None,
        HY=HY, HX=HX, TH=TH, TW=TW,
        inv_sig_r2=1.0 / (cfg.wmf_sigma_range**2),
        freeze_valid=polish_init is not None,
    )
    WH, WW = TH + 2 * HY, TW + 2 * HX
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(hp // TH, wp // TW),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=[
            pl.BlockSpec((TH, TW), lambda i, j, *_: (i, j))
        ] * 3,
        scratch_shapes=[
            pltpu.VMEM((6, WH, WW), jnp.float32),
            pltpu.VMEM((3 * SB, TH, TW), jnp.float32),
            pltpu.VMEM((3 * SB, TH, TW), jnp.float32),
            pltpu.VMEM((len(offs), TH, TW), jnp.float32),
            pltpu.VMEM((2 * SB, TH, TW), jnp.float32),
            pltpu.VMEM((3, TH, TW), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    call = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        compiler_params=_tpu_params(),
        out_shape=[jax.ShapeDtypeStruct((hp, wp), jnp.float32)] * 3,
    )

    # image channels (iteration-invariant): edge-padded for the halo
    imgp = jnp.pad(
        jnp.stack([img[..., 0], img[..., 1], img[..., 2]]),
        ((0, 0), (HY, HY + ph), (HX, HX + pw)),
        mode="edge",
    )

    def one_iter(_, state):
        oxp, oyp, vp = state
        # halo pad: out-of-image supports invalid (valid=0 padding)
        flowh = jnp.stack([
            jnp.pad(oxp, ((HY, HY), (HX, HX))),
            jnp.pad(oyp, ((HY, HY), (HX, HX))),
            jnp.pad(vp, ((HY, HY), (HX, HX))),
        ])
        state6 = jnp.concatenate([flowh, imgp], axis=0)
        return tuple(call(offs_arr, jnp.asarray(gws), state6))

    state = (
        jnp.pad(ox, ((0, ph), (0, pw))),
        jnp.pad(oy, ((0, ph), (0, pw))),
        jnp.pad(valid, ((0, ph), (0, pw))),
    )
    ox2, oy2, v2 = jax.lax.fori_loop(0, num_iter, one_iter, state)
    ox2, oy2, v2 = ox2[:h, :w], oy2[:h, :w], v2[:h, :w] > 0
    if polish_init is not None:
        return ox2.astype(jnp.int32) + xs, oy2.astype(jnp.int32) + ys
    new_tx = jnp.where(v2, ox2.astype(jnp.int32) + xs, tx)
    new_ty = jnp.where(v2, oy2.astype(jnp.int32) + ys, ty)
    return new_tx, new_ty


def weighted_median_filter_auto(
    tx, ty, img, cfg: RefineConfig = RefineConfig(),
    num_iter: int = 1, only_occlusion: bool = False,
    support_chunk: int = 27,
    polish_init: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    dilation: int = 1,
):
    """Dispatch: in-VMEM Pallas kernel when the whole level fits (all
    iterations in one launch), tiled per-iteration Pallas kernel for
    larger levels, XLA oracle off-TPU."""
    h, w = tx.shape
    square = (2 * cfg.wmf_radius + 1) ** 2 == 81
    if _on_tpu() and square:
        # VMEM need of the in-VMEM variant ~ (3 + 9*SB + ...) ~100 planes
        reach = cfg.wmf_radius * dilation
        HP = _round_up(h, 8) + _round_up(max(8, reach), 8)
        WP = _round_up(w + 2 * reach, 128)
        if 100 * HP * WP * 4 < 14 * 2**20:
            return weighted_median_filter_pallas(
                tx, ty, img, cfg, num_iter, only_occlusion,
                polish_init=polish_init, dilation=dilation,
            )
        return _wmf_tiled(
            tx, ty, img, cfg, num_iter, only_occlusion,
            polish_init=polish_init, dilation=dilation,
        )
    from .refine import weighted_median_filter

    return weighted_median_filter(
        tx, ty, img, cfg, num_iter, only_occlusion, support_chunk,
        polish_init=polish_init, dilation=dilation,
    )


def _photometric_arbitrate(
    tx, ty, ftx, fty, cands, packs, cost_cfg, thresh: float, orig,
):
    """Re-decide each hole's fill by TRUE patch cost where the scene is
    visible in frame 2.

    The strict LR check + outlier removal invalidate over half the
    foreground on layered content (tools/layered_diag.py) although those
    pixels are visible in both frames; for them the frame-2 appearance
    picks the right candidate where the scanline fill's frame-1 color
    test is a coin flip.  Truly occluded pixels have NO good candidate
    (all costs above ``thresh`` — their content does not exist in
    frame 2) and keep the color/majority fill, where photometric voting
    systematically prefers the WRONG layer (round-4 negative result,
    ops/refine.py::fill_holes docstring).

    Candidates: the 4 directional fill sources (slope-extrapolated) plus
    the pixel's own pre-LR match (``orig`` — exactly right wherever the
    invalidation was quantization noise rather than occlusion).  Costs
    come from the exact gather path (ops/cost.py::patch_cost_stack) on
    the coarse-level packs — a K<=5-field rescore of a ~110x256 level,
    negligible next to the matcher's own exact stage.
    """
    from .cost import make_patch_stack, patch_cost_stack

    p1, p2 = packs
    h, w = tx.shape
    h2, w2 = p2.shape[0], p2.shape[1]
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)

    fields = []
    for found, gox, goy in cands:
        ctx = xs + jnp.round(gox).astype(jnp.int32)
        cty = ys + jnp.round(goy).astype(jnp.int32)
        fields.append((found, ctx, cty))
    if orig is not None:
        # Corroboration gate (zero extra cost evals): the pre-LR match
        # is admitted only where SOME directional fill source roughly
        # agrees with it (L-inf <= 2 px).  A mis-invalidated visible
        # pixel sits among same-surface valid neighbors whose flow
        # matches its own, so the gate passes; an out-of-frame border
        # band's pre-LR matches are lone garbage no neighbor seconds
        # (measured: admitting them un-gated costs large_disp_120
        # 0.183 -> 1.183 — they score under the cost threshold on
        # featureless border content).
        otx, oty = orig
        agree = jnp.zeros((h, w), bool)
        for found, ctx, cty in fields:
            d = jnp.maximum(jnp.abs(ctx - otx), jnp.abs(cty - oty))
            agree = agree | (found & (d <= 2))
        fields.append((agree, otx, oty))

    txs = jnp.stack([f[1] for f in fields])
    tys = jnp.stack([f[2] for f in fields])
    offs = cost_cfg.tap_offsets
    stack2 = make_patch_stack(p2, offs)
    costs = patch_cost_stack(p1, stack2, txs, tys, cost_cfg, offs)
    for k, (found, ctx, cty) in enumerate(fields):
        inb = (ctx >= 0) & (ctx < w2) & (cty >= 0) & (cty < h2)
        costs = costs.at[k].set(
            jnp.where(found & inb, costs[k], FLT_MAX)
        )
    kbest = jnp.argmin(costs, axis=0)
    cmin = jnp.min(costs, axis=0)
    btx = jnp.take_along_axis(txs, kbest[None], axis=0)[0]
    bty = jnp.take_along_axis(tys, kbest[None], axis=0)[0]

    hole = (tx < 0) | (ty < 0)
    use = hole & (cmin < jnp.float32(thresh))
    return (
        jnp.where(use, btx, ftx),
        jnp.where(use, bty, fty),
    )


def wmf_polish_occlusions(
    tx, ty, img, cfg: RefineConfig = RefineConfig(), num_iter: int = 1,
    dilations: Tuple[int, ...] = (1,),
    fill_patch_radius: int = 0,
    accept_thresh: float = 0.0,
    fill_linear_baseline: int = 0,
    fill_linear_slope_tol: float = 0.3,
    packs=None,
    cost_cfg=None,
    fill_cost_thresh: float = 0.0,
    orig=None,
):
    """Occlusion reconstruction as fill-then-polish (the TPU-native
    answer to the reference's 20 sequential in-place occlusion-WMF
    sweeps, bao_flow_patchmatch_multiscale_cuda.cpp:239).

    The reference's in-place scan diffuses values across an arbitrarily
    wide occluded band in few passes because each thread reads its
    neighbors' already-updated values.  A clean Jacobi port needs
    ~band_width/radius iterations, and its inward reconstruction
    compounds errors (diag on the layered stress case: 6.7 px mean error
    in an ~20 px coarse band after 5 Jacobi iterations).  Here the holes
    are instead initialized by ``fill_holes`` (the reference's own
    4-direction color-nearest rule, refine_kernel.cu:297-371 — exact
    for band-shaped occlusions whose two sides differ in texture), then
    ``num_iter`` frozen-valid WMF iterations re-median each hole from
    originally-valid window data: edge holes get the full bilateral
    median, unreachable band centers keep the color-chosen fill, and
    nothing compounds.  Cheaper AND more accurate than the Jacobi
    schedule it replaces.

    ``dilations`` chains one polish pass per entry, coarse-to-fine
    (e.g. (4, 1)): the dilated pass re-medians wide-band holes from
    original data up to radius*dilation away (81 color-weighted samples
    beat the scanline fill's single-pixel color pick), then the
    dilation-1 pass re-medians near-edge holes at full precision — holes
    it cannot reach keep the previous pass's value (each pass's output
    is the next pass's ``polish_init``).

    ``accept_thresh`` > 0 gates every dilated (>1) pass: a hole adopts
    the dilated median only when it agrees with its current (fill)
    hypothesis within the threshold per component.  This resolves the
    measured content conflict: on single-layer bands (image borders at
    large translations) the dilated median denoises the scanline fill's
    single-source jitter and agrees within ±1, while on two-layer
    occlusions whose coarse colors homogenize the wide median mixes
    layers — a large jump vs the one-sided fill — and is rejected.
    """
    from .refine import fill_holes

    arbitrate = (
        packs is not None and cost_cfg is not None and fill_cost_thresh > 0
    )
    if arbitrate:
        ftx, fty, cands = fill_holes(
            tx, ty, img, patch_radius=fill_patch_radius,
            linear_baseline=fill_linear_baseline,
            linear_slope_tol=fill_linear_slope_tol,
            return_candidates=True,
        )
        ftx, fty = _photometric_arbitrate(
            tx, ty, ftx, fty, cands, packs, cost_cfg,
            fill_cost_thresh, orig,
        )
    else:
        ftx, fty = fill_holes(
            tx, ty, img, patch_radius=fill_patch_radius,
            linear_baseline=fill_linear_baseline,
            linear_slope_tol=fill_linear_slope_tol,
        )
    # A diagonal translation invalidates a full-height column band AND a
    # full-width row band; at their intersection all 4 scan directions
    # fail and the fill keeps the INVALID sentinel.  A second fill pass
    # over the first pass's output reaches such corners (their rows/
    # columns now hold pass-1 values).  Without this, sentinel VALUES
    # smear through the median stages into plausible-looking garbage
    # flows (the round-4 QUALITY blowup).
    h, w = ftx.shape
    sent = jnp.int32(INVALID_LOCATION // 2)
    # single-pixel color test here: pass 2 only serves the rare corner
    # holes, and the patch-SAD gathers are the fill's dominant cost
    ftx2, fty2 = fill_holes(ftx, fty, img)
    ftx = jnp.where(ftx > sent, ftx, ftx2)
    fty = jnp.where(fty > sent, fty, fty2)
    # last resort (whole image occluded): zero offset, the reference's
    # own unreachable-hole rule (INVALID+pos, refine_kernel.cu:368-370)
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    ftx = jnp.where(ftx > sent, ftx, xs)
    fty = jnp.where(fty > sent, fty, ys)
    hole = (tx < 0) | (ty < 0)
    cur = (ftx, fty)
    for d in dilations:
        nxt = weighted_median_filter_auto(
            tx, ty, img, cfg, num_iter, only_occlusion=True,
            polish_init=cur, dilation=d,
        )
        if d > 1 and accept_thresh > 0:
            # float comparison: int32-truncating the threshold would turn
            # e.g. a configured 0.5 into an exact-equality gate (0).
            t = jnp.float32(accept_thresh)
            agree = (jnp.abs(nxt[0] - cur[0]).astype(jnp.float32) <= t) & (
                jnp.abs(nxt[1] - cur[1]).astype(jnp.float32) <= t
            )
            keep = hole & ~agree
            nxt = (
                jnp.where(keep, cur[0], nxt[0]),
                jnp.where(keep, cur[1], nxt[1]),
            )
        cur = nxt
    return cur


def coarse_occlusion_reconstruct(tx, ty, img, rcfg: RefineConfig,
                                 packs=None, cost_cfg=None, orig=None):
    """The coarse level's occlusion chain, shared by the single-chip and
    sharded pipelines: reconstruct LR-invalidated pixels, then the
    optional full-image WMF pass.

    ``rcfg.wmf_fill_first`` selects fill-then-polish
    (``wmf_polish_occlusions``) over the faithful WMF-then-fill Jacobi
    order (reference schedule, compute_flow .cpp:236-243).
    ``wmf_coarse_iters`` drives only the Jacobi path: the fill-first
    polish runs exactly ONE frozen-valid iteration per dilation pass by
    construction — one iteration is that pass's fixed point (see the
    comment below), so an iteration knob would be a no-op there.
    """
    if rcfg.wmf_fill_first:
        hole = (tx < 0) | (ty < 0)
        # one iteration per pass IS the fixed point: polish candidates/
        # supports are the frozen originally-valid data, so iteration 2
        # re-derives identical medians (verified iter5 == iter2 == iter1).
        tx, ty = wmf_polish_occlusions(
            tx, ty, img, rcfg, num_iter=1,
            dilations=rcfg.wmf_polish_dilations,
            fill_patch_radius=rcfg.fill_patch_radius,
            accept_thresh=rcfg.wmf_polish_accept_thresh,
            fill_linear_baseline=rcfg.fill_linear_baseline,
            fill_linear_slope_tol=rcfg.fill_linear_slope_tol,
            packs=packs, cost_cfg=cost_cfg,
            fill_cost_thresh=rcfg.fill_photometric_thresh,
            orig=orig,
        )
        if rcfg.fill_median_rounds > 0:
            # majority correction over the reconstructed holes: wrong
            # scanline-fill picks are streak-correlated (~20% of band
            # pixels on layered content); iterated 3x3 component medians
            # over ALL values, applied to holes only, let the correct
            # majority overwrite wrong streaks.
            from .dense import median3

            ys2 = jax.lax.broadcasted_iota(jnp.int32, tx.shape, 0)
            xs2 = jax.lax.broadcasted_iota(jnp.int32, tx.shape, 1)
            ox = (tx - xs2).astype(jnp.float32)
            oy = (ty - ys2).astype(jnp.float32)
            for _ in range(rcfg.fill_median_rounds):
                ox = jnp.where(hole, median3(ox), ox)
                oy = jnp.where(hole, median3(oy), oy)
            tx = jnp.where(hole, ox.astype(jnp.int32) + xs2, tx)
            ty = jnp.where(hole, oy.astype(jnp.int32) + ys2, ty)
    else:
        tx, ty = weighted_median_filter_auto(
            tx, ty, img, rcfg, num_iter=rcfg.wmf_coarse_iters,
            only_occlusion=True,
        )
        from .refine import fill_holes

        tx, ty = fill_holes(tx, ty, img)
    if rcfg.wmf_coarse_full_iters > 0:
        tx, ty = weighted_median_filter_auto(
            tx, ty, img, rcfg, num_iter=rcfg.wmf_coarse_full_iters,
            only_occlusion=False,
        )
    return tx, ty
