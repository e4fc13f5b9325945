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
    fill_holes, flow_smoothing, lr_check, nnf_to_flow, outlier_removal,
    weighted_median_filter,
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
    timeit(
        f"dense_refine L{lvl} ({oh}x{ow}) 1 pass",
        lambda f, p1, p2: dense_refine_flow(
            f, p1, p2, cfg.cost, cfg.dense_search_radius, True,
            cfg.cost_tap_chunk),
        flow, packs1[lvl], packs2[lvl],
    )
    ref = jax.jit(lambda f, p1, p2: dense_refine_flow(
        f, p1, p2, cfg.cost, cfg.dense_search_radius, True,
        cfg.cost_tap_chunk))
    flow = ref(flow, packs1[lvl], packs2[lvl])
    flow = ref(median3_flow(flow), packs1[lvl], packs2[lvl])
    timeit(f"flow_smoothing L{lvl}",
           lambda f, i: flow_smoothing(f, i, cfg.refine), flow, levels1[lvl])
    flow = jax.jit(lambda f, i: flow_smoothing(f, i, cfg.refine))(
        flow, levels1[lvl])

timeit("flow_smoothing final L0",
       lambda f, i: flow_smoothing(f, i, cfg.refine), flow, levels1[0])

timeit("FULL compute_flow", lambda a, b: compute_flow(a, b, cfg=cfg),
       img1, img2)
print("done")
