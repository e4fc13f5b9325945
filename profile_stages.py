#!/usr/bin/env python
"""Per-stage wall timing of the EPPM pipeline on the real device.

Methodology: every probe sum-reduces its output inside jit so host
readback is 4 bytes — the axon tunnel reads arrays back at ~45 MB/s,
which otherwise dominates (a fixed ~22 ms round-trip remains in every
number; subtract the printed 'noop scalar' line).
"""
import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, ".")
from eppm_tpu.config import DEFAULT_CONFIG as cfg
from eppm_tpu.io import read_ppm
from eppm_tpu.pipeline import prepare_pyramids, compute_flow
from eppm_tpu.ops.match import match_coarse
from eppm_tpu.ops.dense import dense_refine_flow, median3_flow
from eppm_tpu.ops.refine import (
    fill_holes, lr_check, nnf_to_flow, outlier_removal,
)
# the pipeline's dispatchers (Pallas kernel when applicable, XLA otherwise)
from eppm_tpu.ops.pallas_smooth import flow_smoothing_auto as flow_smoothing
from eppm_tpu.ops.pallas_wmf import (
    weighted_median_filter_auto as weighted_median_filter,
)
from eppm_tpu.ops.resize import bilinear_resize


def _sum(x):
    return jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(b.astype(jnp.float32)),
        x, jnp.float32(0),
    )


def timeit(name, fn, *args, n=5):
    f = jax.jit(lambda *a: _sum(fn(*a)))
    out = f(*args)
    np.asarray(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = f(*args)
        np.asarray(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:44s} {min(ts)*1000:9.1f} ms", flush=True)


if len(sys.argv) > 1:  # profile_stages.py HxW -> synthetic pair
    h, w = (int(v) for v in sys.argv[1].split("x"))
    rng = np.random.default_rng(0)
    small = rng.random((h // 8 + 2, w // 8 + 2, 3)).astype(np.float32)
    base = np.asarray(jax.image.resize(
        jnp.asarray(small), (h, w, 3), "linear"))
    img2 = jnp.asarray(np.clip(base + 0.1 * rng.random((h, w, 3)), 0, 1))
    img1 = jnp.asarray(np.roll(np.asarray(img2), (-5, -3), axis=(1, 0)))
    print(f"synthetic {h}x{w}")
else:
    img1 = jnp.asarray(read_ppm("/root/reference/frame10.ppm"))
    img2 = jnp.asarray(read_ppm("/root/reference/frame11.ppm"))

timeit("noop scalar (tunnel floor)", lambda a: a[0, 0, 0], img1)
timeit("prepare_pyramids", lambda a: prepare_pyramids(a, cfg)[1], img1)

prep = jax.jit(lambda a: prepare_pyramids(a, cfg))
levels1, packs1 = prep(img1)
levels2, packs2 = prep(img2)
top = len(packs1) - 1

timeit(
    "match_coarse (one direction)",
    lambda i1, i2, p1, p2: match_coarse(
        i1, i2, cfg.cost, cfg.match, cfg.cost_tap_chunk, p1, p2
    ),
    levels1[top], levels2[top], packs1[top], packs2[top],
)
mc = jax.jit(lambda i1, i2, p1, p2: match_coarse(
    i1, i2, cfg.cost, cfg.match, cfg.cost_tap_chunk, p1, p2))
tx1, ty1, c1 = mc(levels1[top], levels2[top], packs1[top], packs2[top])
tx2, ty2, c2 = mc(levels2[top], levels1[top], packs2[top], packs1[top])

timeit("lr_check", lambda *a: lr_check(*a, cfg.lr_thresh),
       tx1, ty1, c1, tx2, ty2, c2)
tx1, ty1, c1, *_ = jax.jit(
    lambda *a: lr_check(*a, cfg.lr_thresh)
)(tx1, ty1, c1, tx2, ty2, c2)
timeit("outlier_removal", lambda *a: outlier_removal(*a, cfg.refine),
       tx1, ty1, c1)
tx1, ty1, c1 = jax.jit(lambda *a: outlier_removal(*a, cfg.refine))(
    tx1, ty1, c1)
timeit(
    "WMF x20 occl-only",
    lambda a, b, i: weighted_median_filter(
        a, b, i, cfg.refine, num_iter=cfg.refine.wmf_coarse_iters,
        only_occlusion=True),
    tx1, ty1, levels1[top],
)
wmf = jax.jit(lambda a, b, i: weighted_median_filter(
    a, b, i, cfg.refine, num_iter=cfg.refine.wmf_coarse_iters,
    only_occlusion=True))
tx1, ty1 = wmf(tx1, ty1, levels1[top])
timeit("fill_holes", fill_holes, tx1, ty1, levels1[top])
tx1, ty1 = jax.jit(fill_holes)(tx1, ty1, levels1[top])
flow = nnf_to_flow(tx1, ty1)

for lvl in range(top - 1, -1, -1):
    oh, ow = packs1[lvl].shape[0], packs1[lvl].shape[1]
    up = jax.jit(lambda f, o=oh, w=ow: bilinear_resize(f, o, w, 2.0) * 2.0)
    timeit(f"upsample -> L{lvl}", lambda f, o=oh, w=ow: bilinear_resize(f, o, w, 2.0) * 2.0, flow)
    flow = up(flow)
    # pass 1 and pass 2 exactly as the pipeline runs them (pass1/pass2
    # plane flags from the config; pass 2 includes the 3x3 flow median)
    timeit(
        f"dense_refine L{lvl} ({oh}x{ow}) pass1",
        lambda f, p1, p2: dense_refine_flow(
            f, p1, p2, cfg.cost, cfg.dense_search_radius,
            cfg.dense_pass1_planes, cfg.cost_tap_chunk),
        flow, packs1[lvl], packs2[lvl],
    )
    ref1 = jax.jit(lambda f, p1, p2: dense_refine_flow(
        f, p1, p2, cfg.cost, cfg.dense_search_radius,
        cfg.dense_pass1_planes, cfg.cost_tap_chunk))
    flow = ref1(flow, packs1[lvl], packs2[lvl])
    timeit(
        f"dense_refine L{lvl} ({oh}x{ow}) pass2 (+median)",
        lambda f, p1, p2: dense_refine_flow(
            median3_flow(f), p1, p2, cfg.pass2_cost,
            cfg.dense_search_radius,
            cfg.dense_pass2_planes, cfg.cost_tap_chunk,
            cand_shape=cfg.pass2_cand_shape),
        flow, packs1[lvl], packs2[lvl],
    )
    ref2 = jax.jit(lambda f, p1, p2: dense_refine_flow(
        median3_flow(f), p1, p2, cfg.pass2_cost, cfg.dense_search_radius,
        cfg.dense_pass2_planes, cfg.cost_tap_chunk,
        cand_shape=cfg.pass2_cand_shape))
    flow = ref2(flow, packs1[lvl], packs2[lvl])
    timeit(f"flow_smoothing L{lvl}",
           lambda f, i: flow_smoothing(f, i, cfg.refine), flow, levels1[lvl])
    flow = jax.jit(lambda f, i: flow_smoothing(f, i, cfg.refine))(
        flow, levels1[lvl])

timeit("flow_smoothing final L0",
       lambda f, i: flow_smoothing(f, i, cfg.refine), flow, levels1[0])

if img1.shape[0] * img1.shape[1] <= 1_000_000:
    timeit("FULL compute_flow", lambda a, b: compute_flow(a, b, cfg=cfg),
           img1, img2)
else:
    # >1M px: one monolithic module faults the worker (PERF.md); time the
    # staged entry point with a tiny readback to force completion
    from eppm_tpu.pipeline import compute_flow_jit

    f = compute_flow_jit(img1, img2)
    np.asarray(f[:1, :1])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        f = compute_flow_jit(img1, img2)
        np.asarray(f[:1, :1])
        ts.append(time.perf_counter() - t0)
    print(f"{'FULL compute_flow_jit (staged)':44s} {min(ts)*1000:9.1f} ms")
print("done")
