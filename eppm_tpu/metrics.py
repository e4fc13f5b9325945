"""Flow-quality metrics: endpoint error, angular error, bad-pixel rate.

Spec source: ``bao_calc_flow_error`` and ``bao_calc_flow_error_percentage``
(basic/bao_flow_tools.cpp:64-141).  Semantics reproduced exactly:

  - A ground-truth pixel participates when
    ``(|gtu|>0 and |gtu|<=1e9) or (|gtv|>0 and |gtv|<=1e9)``
    (flow_tools.cpp:77) — i.e. exactly-zero GT flow in both components is
    skipped, as are unknown-flow sentinels.
  - EPE: mean L2 endpoint error over valid pixels.
  - AAE: mean angular error of the homogeneous 3-vectors (u, v, 1), in
    degrees (flow_tools.cpp:82-84 with pi = 3.14159).
  - Bad-pixel rate uses a different validity rule (flow_tools.cpp:126:
    ``|gtu|<=1e9 or |gtv|<=1e9``) and counts EPE > thresh.

Also provides a photometric warp error, used as a GT-free quality proxy.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from .config import UNKNOWN_FLOW_THRESH

_PI = 3.14159  # the reference's value of pi (flow_tools.cpp:88,103)

__all__ = ["flow_error", "bad_pixel_rate", "warp_error"]


def flow_error(
    flow: np.ndarray, gt: np.ndarray, border: int = 0
) -> Tuple[float, float]:
    """Return (EPE, AAE degrees) of ``flow`` vs ``gt`` (both (H, W, 2))."""
    flow = np.asarray(flow, dtype=np.float64)
    gt = np.asarray(gt, dtype=np.float64)
    if border > 0:
        flow = flow[border:-border, border:-border]
        gt = gt[border:-border, border:-border]
    u, v = flow[..., 0], flow[..., 1]
    gu, gv = gt[..., 0], gt[..., 1]
    valid = ((np.abs(gu) > 0) & (np.abs(gu) <= UNKNOWN_FLOW_THRESH)) | (
        (np.abs(gv) > 0) & (np.abs(gv) <= UNKNOWN_FLOW_THRESH)
    )
    n = int(valid.sum())
    if n == 0:
        return 0.0, 0.0
    du, dv = u - gu, v - gv
    epe = float(np.sqrt(du * du + dv * dv)[valid].mean())
    cos_val = (u * gu + v * gv + 1.0) / (
        np.sqrt(u * u + v * v + 1.0) * np.sqrt(gu * gu + gv * gv + 1.0)
    )
    ang = np.arccos(np.clip(cos_val, -1.0, 1.0))
    aae = float(ang[valid].mean() * 180.0 / _PI)
    return epe, aae


def bad_pixel_rate(
    flow: np.ndarray, gt: np.ndarray, thresh: float = 3.0,
    return_error_map: bool = False,
):
    """Fraction of valid pixels with EPE > thresh (flow_tools.cpp:114-141).

    With ``return_error_map=True`` also returns the per-pixel EPE map with
    invalid-GT pixels zeroed (the reference's optional ``err_map`` output,
    flow_tools.cpp:121-139).
    """
    flow = np.asarray(flow, dtype=np.float64)
    gt = np.asarray(gt, dtype=np.float64)
    gu, gv = gt[..., 0], gt[..., 1]
    valid = (np.abs(gu) <= UNKNOWN_FLOW_THRESH) | (
        np.abs(gv) <= UNKNOWN_FLOW_THRESH
    )
    epe = np.sqrt(((flow - gt) ** 2).sum(-1))
    n = int(valid.sum())
    rate = 0.0 if n == 0 else float((epe[valid] > thresh).mean())
    if return_error_map:
        return rate, np.where(valid, epe, 0.0)
    return rate


def warp_error(
    img1: np.ndarray, img2: np.ndarray, flow: np.ndarray
) -> float:
    """Mean |img1(x) - img2(x + flow)| with bilinear sampling (GT-free proxy).

    Not part of the reference; used by our tests/benchmarks to sanity-check
    flow quality on pairs without ground truth (e.g. the bundled Grove pair,
    for which the reference repo ships no GT .flo).
    """
    img1 = np.asarray(img1, dtype=np.float64)
    img2 = np.asarray(img2, dtype=np.float64)
    h, w = img1.shape[:2]
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    fx = np.clip(xs + flow[..., 0], 0, w - 1)
    fy = np.clip(ys + flow[..., 1], 0, h - 1)
    x0 = np.clip(np.floor(fx).astype(int), 0, w - 1)
    y0 = np.clip(np.floor(fy).astype(int), 0, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    ax = (fx - x0)[..., None]
    ay = (fy - y0)[..., None]
    warped = (
        img2[y0, x0] * (1 - ax) * (1 - ay)
        + img2[y0, x1] * ax * (1 - ay)
        + img2[y1, x0] * (1 - ax) * ay
        + img2[y1, x1] * ax * ay
    )
    return float(np.abs(img1 - warped).mean())
