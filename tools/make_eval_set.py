#!/usr/bin/env python
"""Generate the deterministic evaluation datasets for EVAL.md.

The reference repo bundles a single Middlebury pair with no ground truth
and no benchmark table (SURVEY.md §4, §6), so dataset-level accuracy is
gated on synthetic sequences with exact ground truth, in the three
BASELINE dataset shapes:

  middlebury_synth/  8 sequences, 480x640  (Middlebury class: small-to-
                     large translations, affine, rotation, zoom, shear,
                     piecewise-discontinuous motion)
  sintel_stress/     4 sequences, 436x1024 (Sintel dims; large
                     displacement 60-120 px, layered discontinuities)
  kitti_fixtures/    4 sequences, 375x1242 (KITTI-2015 dims; wide frame,
                     horizontal-dominant motion; ground truth stored in
                     the KITTI 16-bit PNG flow format through
                     eppm_tpu/io/kitti.py)

Each sequence directory holds frame10.ppm, frame11.ppm and ground truth
(flow10.flo, or flow10.png for KITTI).  frame10 = warp(frame11, gt), the
standard inverse-warp construction: the flow maps frame10 pixel p to
frame11 position p + gt(p).  Evaluation metric spec:
/root/reference/basic/bao_flow_tools.cpp:64-141 (eppm_tpu/metrics.py).

Deterministic: fixed seed, pure NumPy.  Usage:
  python tools/make_eval_set.py [--root evalset]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eppm_tpu.io import write_ppm
from eppm_tpu.io.flo import write_flo
from eppm_tpu.io.kitti import write_kitti_flow


def textured(rng, h, w):
    """Multi-octave RGB texture: coarse structure + mid + fine detail."""
    img = np.zeros((h, w, 3), np.float64)
    for scale, amp in ((16, 0.6), (4, 0.3), (1, 0.1)):
        small = rng.random((h // scale + 2, w // scale + 2, 3))
        ys = np.linspace(0, small.shape[0] - 1.001, h)
        xs = np.linspace(0, small.shape[1] - 1.001, w)
        y0 = np.floor(ys).astype(int)[:, None]
        x0 = np.floor(xs).astype(int)[None, :]
        ay = (ys[:, None] - y0)[..., None]
        ax = (xs[None, :] - x0)[..., None]
        img += amp * (
            small[y0, x0] * (1 - ay) * (1 - ax)
            + small[y0, x0 + 1] * (1 - ay) * ax
            + small[y0 + 1, x0] * ay * (1 - ax)
            + small[y0 + 1, x0 + 1] * ay * ax
        )
    return np.clip(img, 0, 1).astype(np.float32)


def warp(img, flow):
    """Bilinear inverse warp: out(p) = img(p + flow(p)), edge-clamped."""
    h, w = img.shape[:2]
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    fx = np.clip(xs + flow[..., 0], 0, w - 1)
    fy = np.clip(ys + flow[..., 1], 0, h - 1)
    x0 = np.floor(fx).astype(int)
    y0 = np.floor(fy).astype(int)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    ax = (fx - x0)[..., None]
    ay = (fy - y0)[..., None]
    return (
        img[y0, x0] * (1 - ax) * (1 - ay)
        + img[y0, x1] * ax * (1 - ay)
        + img[y1, x0] * (1 - ax) * ay
        + img[y1, x1] * ax * ay
    ).astype(np.float32)


def const_flow(h, w, u, v):
    gt = np.empty((h, w, 2), np.float32)
    gt[..., 0], gt[..., 1] = u, v
    return gt


def affine_flow(h, w, u0, v0, ux, uy, vx, vy):
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    return np.stack(
        [u0 + ux * xs / w + uy * ys / h, v0 + vx * xs / w + vy * ys / h], -1
    ).astype(np.float32)


def rotation_flow(h, w, deg, zoom=1.0):
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    cy, cx = h / 2.0, w / 2.0
    th = np.deg2rad(deg)
    c, s = zoom * np.cos(th), zoom * np.sin(th)
    return np.stack(
        [(xs - cx) * (c - 1) - (ys - cy) * s, (xs - cx) * s + (ys - cy) * (c - 1)],
        -1,
    ).astype(np.float32)


def piecewise_flow(h, w, flows, rng):
    """Voronoi-style piecewise-constant field: motion discontinuities."""
    k = len(flows)
    cy = rng.uniform(0, h, k)
    cx = rng.uniform(0, w, k)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    d = (ys[None] - cy[:, None, None]) ** 2 + (xs[None] - cx[:, None, None]) ** 2
    lbl = np.argmin(d, 0)
    gt = np.zeros((h, w, 2), np.float32)
    for i, (u, v) in enumerate(flows):
        gt[lbl == i] = (u, v)
    return gt


def layered_flow(h, w, bg, fg, rng, n_boxes=3):
    """Background motion with foreground boxes moving differently."""
    gt = const_flow(h, w, *bg)
    for _ in range(n_boxes):
        bh = int(rng.uniform(0.15, 0.35) * h)
        bw = int(rng.uniform(0.1, 0.25) * w)
        y0 = rng.integers(0, h - bh)
        x0 = rng.integers(0, w - bw)
        gt[y0 : y0 + bh, x0 : x0 + bw] = fg
    return gt


def save_seq(root, name, gt, rng, kitti=False):
    d = os.path.join(root, name)
    os.makedirs(d, exist_ok=True)
    h, w = gt.shape[:2]
    img2 = textured(rng, h, w)
    img1 = warp(img2, gt)
    write_ppm(os.path.join(d, "frame10.ppm"),
              (img1 * 255 + 0.5).astype(np.uint8))
    write_ppm(os.path.join(d, "frame11.ppm"),
              (img2 * 255 + 0.5).astype(np.uint8))
    if kitti:
        write_kitti_flow(os.path.join(d, "flow10.png"), gt)
    else:
        write_flo(os.path.join(d, "flow10.flo"), gt)
    print(f"  {name}: {h}x{w}  |gt| max {np.abs(gt).max():.1f}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="evalset")
    args = p.parse_args()
    rng = np.random.default_rng(20260817)

    mb = os.path.join(args.root, "middlebury_synth")
    h, w = 480, 640
    print("middlebury_synth (480x640):")
    save_seq(mb, "trans_small", const_flow(h, w, 3.2, 1.7), rng)
    save_seq(mb, "trans_mid", const_flow(h, w, 12.4, -7.8), rng)
    save_seq(mb, "trans_large", const_flow(h, w, 42.0, 13.0), rng)
    save_seq(mb, "affine", affine_flow(h, w, 4, -2, 6, -3, 0, 4), rng)
    save_seq(mb, "rotation", rotation_flow(h, w, 1.2), rng)
    save_seq(mb, "zoom", rotation_flow(h, w, 0.0, zoom=1.04), rng)
    save_seq(mb, "shear", affine_flow(h, w, 1, 1, 0, 9, 7, 0), rng)
    save_seq(
        mb, "piecewise",
        piecewise_flow(h, w, [(6, 2), (-9, 4), (2, -11), (15, 8)], rng), rng,
    )

    st = os.path.join(args.root, "sintel_stress")
    h, w = 436, 1024
    print("sintel_stress (436x1024):")
    save_seq(st, "large_disp_80", const_flow(h, w, 80.0, 24.0), rng)
    save_seq(st, "large_disp_120", const_flow(h, w, -120.0, 15.0), rng)
    save_seq(
        st, "layered",
        layered_flow(h, w, (9.0, 3.0), (-70.0, 20.0), rng), rng,
    )
    save_seq(
        st, "zoom_rot",
        rotation_flow(h, w, 2.5, zoom=1.06), rng,
    )

    kt = os.path.join(args.root, "kitti_fixtures")
    h, w = 375, 1242
    print("kitti_fixtures (375x1242, PNG16 ground truth):")
    save_seq(kt, "forward_35", affine_flow(h, w, 35, 2, -10, 3, 0, 1),
             rng, kitti=True)
    save_seq(kt, "forward_60", affine_flow(h, w, 60, 1, -22, 4, 0, 2),
             rng, kitti=True)
    save_seq(kt, "yaw", affine_flow(h, w, -28, 3, 14, -2, 1, 1),
             rng, kitti=True)
    save_seq(
        kt, "layered_traffic",
        layered_flow(h, w, (18.0, 1.0), (-45.0, 3.0), rng), rng, kitti=True,
    )
    print("done ->", args.root)


if __name__ == "__main__":
    main()
