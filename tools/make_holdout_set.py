#!/usr/bin/env python
"""Generate the HELD-OUT evaluation group (evalset/holdout).

Guard against tuning overfit (round-4 verdict): every quality knob in
config.py was selected by measuring the sequences tools/make_eval_set.py
generates.  This group exists so EVAL.md can report numbers on content
the tuning loop has NEVER seen:

  * fresh RNG seed (20260821 vs the tuning set's 20260817);
  * two texture families absent from the tuning set — flat-color
    Voronoi "cartoon" cells (piecewise-constant color, step edges, no
    multi-octave noise) and anisotropic oriented stripes;
  * two geometry/motion families absent from the tuning set — DISK
    shaped foreground occluders (tuning uses boxes) and a smooth
    SINUSOIDAL flow field (tuning uses constant/affine/rotation).

RULE (stated here and in EVAL.md): the holdout group is never used for
knob selection.  It is generated once, frozen, and only *reported*.
Metric spec: /root/reference/basic/bao_flow_tools.cpp:64-141.

Usage: python tools/make_holdout_set.py [--root evalset]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from make_eval_set import (  # noqa: E402
    const_flow,
    rotation_flow,
    save_pair,
    warp,
)


def cartoon(rng, h, w, cells=60):
    """Flat-color Voronoi cells: piecewise-constant color, step edges —
    the opposite texture statistic of the tuning set's value noise."""
    cy = rng.uniform(0, h, cells)
    cx = rng.uniform(0, w, cells)
    colors = rng.random((cells, 3))
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    d = (ys[None] - cy[:, None, None]) ** 2 + (
        xs[None] - cx[:, None, None]
    ) ** 2
    lbl = np.argmin(d, 0)
    return colors[lbl].astype(np.float32)


def stripes(rng, h, w):
    """Anisotropic oriented stripes at three scales + phase noise."""
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    img = np.zeros((h, w, 3))
    for (fy, fx), amp in (((0.9, 0.45), 0.4), ((0.2, 0.8), 0.35),
                          ((0.05, 0.12), 0.25)):
        th = rng.uniform(0, 2 * np.pi, 3)
        period = rng.uniform(9, 26)
        phase = 2 * np.pi * (fy * ys + fx * xs) / period
        for c in range(3):
            img[..., c] += amp * 0.5 * (1 + np.sin(phase + th[c]))
    return np.clip(img, 0, 1).astype(np.float32)


def sine_flow(h, w, au, av, period_frac=0.45):
    """Smooth sinusoidal field: continuously varying, non-affine —
    a motion family no tuning knob ever saw."""
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    ky = 2 * np.pi / (h * period_frac)
    kx = 2 * np.pi / (w * period_frac)
    u = au * np.sin(kx * xs) * np.cos(0.5 * ky * ys)
    v = av * np.cos(kx * xs * 0.7) * np.sin(ky * ys)
    return np.stack([u, v], -1).astype(np.float32)


def disk_layered_scene(rng, h, w, bg_uv, fg_uv, tex_fn, n_disks=3):
    """True two-layer occlusion with DISK foregrounds (tuning set uses
    boxes): independently-textured disks at integer motion over a warped
    background."""
    bg2 = tex_fn(rng, h, w)
    bg_flow = const_flow(h, w, *bg_uv)
    img2 = bg2.copy()
    img1 = warp(bg2, bg_flow)
    gt = bg_flow.copy()
    dx, dy = int(fg_uv[0]), int(fg_uv[1])
    ys, xs = np.mgrid[0:h, 0:w]
    for _ in range(n_disks):
        r = int(rng.uniform(0.08, 0.16) * min(h, w))
        y0 = int(rng.integers(r + max(0, -dy), h - r - max(0, dy)))
        x0 = int(rng.integers(r + max(0, -dx), w - r - max(0, dx)))
        patch = tex_fn(rng, h, w)
        m1 = (ys - y0) ** 2 + (xs - x0) ** 2 <= r * r
        m2 = (ys - y0 - dy) ** 2 + (xs - x0 - dx) ** 2 <= r * r
        img1[m1] = patch[m1]
        img2[m2] = np.roll(patch, (dy, dx), axis=(0, 1))[m2]
        gt[m1] = (dx, dy)
    return img1.astype(np.float32), img2.astype(np.float32), gt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="evalset")
    args = p.parse_args()
    rng = np.random.default_rng(20260821)
    ho = os.path.join(args.root, "holdout")
    print("holdout (fresh seed + unseen content; NEVER used for tuning):")

    h, w = 480, 640
    # cartoon texture family
    img2 = cartoon(rng, h, w)
    gt = const_flow(h, w, 17.3, -6.1)
    save_pair(ho, "cartoon_trans", warp(img2, gt), img2, gt)
    img2 = cartoon(rng, h, w)
    gt = rotation_flow(h, w, 1.8, zoom=1.05)
    save_pair(ho, "cartoon_rot_zoom", warp(img2, gt), img2, gt)

    # stripes texture family, large displacement
    h, w = 436, 1024
    img2 = stripes(rng, h, w)
    gt = const_flow(h, w, -95.0, 18.0)
    save_pair(ho, "stripes_large_disp", warp(img2, gt), img2, gt)

    # smooth sinusoidal field on stripes
    img2 = stripes(rng, h, w)
    gt = sine_flow(h, w, 6.0, 4.5)
    save_pair(ho, "sine_warp", warp(img2, gt), img2, gt)

    # disk-shaped occluders over moving cartoon background
    h, w = 480, 640
    img1, img2, gt = disk_layered_scene(
        rng, h, w, (11.0, -4.0), (-38.0, 14.0), cartoon
    )
    save_pair(ho, "disk_layered", img1, img2, gt)

    # disk occluders + stripes background (both unseen families at once)
    img1, img2, gt = disk_layered_scene(
        rng, h, w, (7.0, 2.0), (26.0, -19.0), stripes
    )
    save_pair(ho, "disk_layered_stripes", img1, img2, gt)

    print("done ->", ho)


if __name__ == "__main__":
    main()
