#!/usr/bin/env python
"""On-device validation of the Pallas kernels against their XLA oracles.

The CPU test suite (tests/) exercises the oracles; the kernels only run
on TPU.  This script is the TPU-side gate: every kernel is compared with
its oracle on real data.  Run on a TPU host:

    python tools/tpu_check.py
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from eppm_tpu.config import DEFAULT_CONFIG as cfg, INVALID_LOCATION
from eppm_tpu.io import read_ppm
from eppm_tpu.pipeline import prepare_pyramids
from eppm_tpu.ops.dense import residual_costs, warp_pack
from eppm_tpu.ops.match import global_match, patch_descriptors
from eppm_tpu.ops.pallas_cost import residual_costs_pallas
from eppm_tpu.ops.pallas_match import global_argmax_pallas
from eppm_tpu.ops.pallas_smooth import flow_smoothing_pallas
from eppm_tpu.ops.pallas_wmf import _wmf_tiled, weighted_median_filter_pallas
from eppm_tpu.ops.refine import flow_smoothing, weighted_median_filter

FAILED = []


def check(name, ok, detail=""):
    status = "PASS" if ok else "FAIL"
    print(f"[{status}] {name} {detail}", flush=True)
    if not ok:
        FAILED.append(name)


def main():
    platform = jax.devices()[0].platform
    print(f"device: {jax.devices()[0]} (platform {platform})")
    if platform in ("cpu", "gpu"):
        print("not a TPU — nothing to check (CPU oracles are the tests/)")
        return 0

    img1 = jnp.asarray(read_ppm("/root/reference/frame10.ppm"))
    img2 = jnp.asarray(read_ppm("/root/reference/frame11.ppm"))
    levels1, packs1 = jax.jit(lambda a: prepare_pyramids(a, cfg))(img1)
    levels2, packs2 = jax.jit(lambda a: prepare_pyramids(a, cfg))(img2)
    rng = np.random.default_rng(0)

    # --- residual cost kernel ---
    h, w = packs1[0].shape[:2]
    gx = jnp.asarray(rng.integers(-8, 9, (h, w)), jnp.int32)
    gy = jnp.asarray(rng.integers(-8, 9, (h, w)), jnp.int32)
    J = warp_pack(packs2[0], gx, gy)
    cands = [(m, n) for m in (-1, 0, 1) for n in (-1, 0, 1)]
    o_p = np.asarray(residual_costs_pallas(packs1[0], J, cands, cfg.cost, True))
    o_x = np.asarray(residual_costs(packs1[0], J, cands, cfg.cost, True, 100))
    d = float(np.abs(o_p - o_x).max())
    check("residual_costs_pallas", d < 1e-4, f"maxdiff={d:.2e}")

    # --- fronto-only (separable) cost kernel — the default refine path ---
    o_p = np.asarray(
        residual_costs_pallas(packs1[0], J, cands, cfg.cost, False)
    )
    o_x = np.asarray(residual_costs(packs1[0], J, cands, cfg.cost, False, 100))
    d = float(np.abs(o_p - o_x).max())
    check("residual_costs_sep", d < 1e-4, f"maxdiff={d:.2e}")

    # --- WMF kernels (in-VMEM and tiled) ---
    for name, (hh, ww), fn in [
        ("wmf_pallas", (120, 160),
         lambda tx, ty, im: weighted_median_filter_pallas(
             tx, ty, im, cfg.refine, 10, True)),
        ("wmf_tiled", (270, 480),
         lambda tx, ty, im: _wmf_tiled(tx, ty, im, cfg.refine, 10, True)),
    ]:
        im = jnp.asarray(
            np.clip(rng.normal(0.5, 0.2, (hh, ww, 3)), 0, 1), jnp.float32
        )
        ys, xs = np.mgrid[0:hh, 0:ww]
        tx = (xs + rng.integers(-10, 11, (hh, ww))).astype(np.int32)
        ty = (ys + rng.integers(-10, 11, (hh, ww))).astype(np.int32)
        occ = rng.random((hh, ww)) < 0.3
        tx = jnp.asarray(np.where(occ, INVALID_LOCATION, tx))
        ty = jnp.asarray(np.where(occ, INVALID_LOCATION, ty))
        a = fn(tx, ty, im)
        b = weighted_median_filter(
            tx, ty, im, cfg.refine, num_iter=10, only_occlusion=True
        )
        mism = (np.asarray(a[0]) != np.asarray(b[0])) | (
            np.asarray(a[1]) != np.asarray(b[1])
        )
        frac = float(mism.mean())
        # float tie-breaks differ at the 0.1% level (summation order)
        check(name, frac < 0.005, f"mismatch={frac:.4%}")

    # --- WMF frozen-valid polish mode (fill-first reconstruction) ---
    from eppm_tpu.ops.refine import fill_holes

    for name, (hh, ww), fn in [
        ("wmf_pallas polish", (120, 160),
         lambda tx, ty, im, pi: weighted_median_filter_pallas(
             tx, ty, im, cfg.refine, 1, True, polish_init=pi)),
        ("wmf_tiled polish", (270, 480),
         lambda tx, ty, im, pi: _wmf_tiled(
             tx, ty, im, cfg.refine, 1, True, polish_init=pi)),
    ]:
        im = jnp.asarray(
            np.clip(rng.normal(0.5, 0.2, (hh, ww, 3)), 0, 1), jnp.float32
        )
        ys, xs = np.mgrid[0:hh, 0:ww]
        tx = (xs + rng.integers(-10, 11, (hh, ww))).astype(np.int32)
        ty = (ys + rng.integers(-10, 11, (hh, ww))).astype(np.int32)
        # band + scattered holes (the occlusion-reconstruction shape)
        occ = (rng.random((hh, ww)) < 0.2) | (
            (xs > ww // 3) & (xs < ww // 3 + 24)
        )
        tx = jnp.asarray(np.where(occ, INVALID_LOCATION, tx))
        ty = jnp.asarray(np.where(occ, INVALID_LOCATION, ty))
        pi = fill_holes(tx, ty, im)
        a = fn(tx, ty, im, pi)
        b = weighted_median_filter(
            tx, ty, im, cfg.refine, num_iter=1, only_occlusion=True,
            polish_init=pi,
        )
        mism = (np.asarray(a[0]) != np.asarray(b[0])) | (
            np.asarray(a[1]) != np.asarray(b[1])
        )
        frac = float(mism.mean())
        check(name, frac < 0.005, f"mismatch={frac:.4%}")

    # --- smoothing kernel ---
    fl = rng.normal(0, 5, (h, w, 2)).astype(np.float32)
    fl[rng.random((h, w)) < 0.15] = 1e10
    fl = jnp.asarray(fl)
    a = np.asarray(flow_smoothing_pallas(fl, levels1[0], cfg.refine))
    b = np.asarray(flow_smoothing(fl, levels1[0], cfg.refine))
    d = float(np.abs(a - b).max())
    check("flow_smoothing_pallas", d < 1e-3, f"maxdiff={d:.2e}")

    # --- global argmax kernel ---
    d1 = patch_descriptors(packs1[-1], cfg.match)
    d2 = patch_descriptors(packs2[-1], cfg.match)
    ty_x, tx_x = jax.jit(
        lambda a, b: global_match(a, b, cfg.match.global_block)
    )(d1, d2)
    ty_p, tx_p = jax.jit(global_argmax_pallas)(d1, d2)
    mism = (np.asarray(ty_x) != np.asarray(ty_p)) | (
        np.asarray(tx_x) != np.asarray(tx_p)
    )
    check("global_argmax_pallas", int(mism.sum()) == 0,
          f"mismatch={int(mism.sum())}")

    # --- large-N dispatch: global_match routes to the Pallas kernel
    # above GLOBAL_MATCH_PALLAS_MIN_N2 frame-2 targets; validate that
    # real dispatch path against the XLA oracle at a just-above-gate
    # shape (the regime reference-faithful depth-3 4K configs hit).
    from eppm_tpu.ops.match import (
        GLOBAL_MATCH_PALLAS_MIN_N2, global_match_xla,
    )

    dd = d1.shape[-1]
    big1 = jnp.asarray(
        rng.normal(0, 1, (48, 128, dd)).astype(np.float32)
    ).astype(d1.dtype)
    h_big = -(-GLOBAL_MATCH_PALLAS_MIN_N2 // 512)
    big2 = jnp.asarray(
        rng.normal(0, 1, (h_big, 512, dd)).astype(np.float32)
    ).astype(d1.dtype)
    assert h_big * 512 >= GLOBAL_MATCH_PALLAS_MIN_N2
    ty_d, tx_d = jax.jit(global_match)(big1, big2)
    ty_o, tx_o = jax.jit(
        lambda a, b: global_match_xla(a, b, cfg.match.global_block)
    )(big1, big2)
    mism = (np.asarray(ty_d) != np.asarray(ty_o)) | (
        np.asarray(tx_d) != np.asarray(tx_o)
    )
    check("global_match large-N dispatch", int(mism.sum()) == 0,
          f"mismatch={int(mism.sum())}")

    # --- end-to-end quality gate (Grove) ---
    from eppm_tpu.metrics import warp_error
    from eppm_tpu.pipeline import compute_flow_jit

    flow = np.asarray(compute_flow_jit(img1, img2, jax.random.PRNGKey(0)))
    a1 = np.asarray(img1, np.float64) / 255.0
    a2 = np.asarray(img2, np.float64) / 255.0
    we = warp_error(a1, a2, flow)
    we0 = warp_error(a1, a2, np.zeros_like(flow))
    check("grove_quality", bool(np.isfinite(flow).all()) and we < 0.6 * we0,
          f"warp={we:.4f} zero={we0:.4f}")

    print(f"\n{len(FAILED)} failures" if FAILED else "\nall checks passed")
    return 1 if FAILED else 0


if __name__ == "__main__":
    sys.exit(main())
