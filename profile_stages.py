#!/usr/bin/env python
"""Per-stage wall timing of the EPPM pipeline on the real device."""
import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from eppm_tpu.config import DEFAULT_CONFIG as cfg
from eppm_tpu.io import read_ppm
from eppm_tpu.pipeline import prepare_pyramids
from eppm_tpu.ops.patchmatch import patchmatch, random_init
from eppm_tpu.ops.cost import patch_cost, patch_cost_candidates
from eppm_tpu.ops.refine import (
    blf_refine_flow, flow_smoothing, weighted_median_filter, lr_check,
    outlier_removal, fill_holes, nnf_to_flow,
)
from eppm_tpu.ops.resize import bilinear_resize


def _sync(out):
    # np.asarray on one leaf forces real device sync through the tunnel
    leaves = jax.tree_util.tree_leaves(out)
    np.asarray(jax.device_get(leaves[0]))


def timeit(name, fn, *args, n=3, **kw):
    out = fn(*args, **kw)
    _sync(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        _sync(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:42s} {min(ts)*1000:9.1f} ms", flush=True)
    return out


img1 = jnp.asarray(read_ppm("/root/reference/frame10.ppm"))
img2 = jnp.asarray(read_ppm("/root/reference/frame11.ppm"))

prep = jax.jit(lambda a: prepare_pyramids(a, cfg))
(levels1, packs1) = timeit("prepare_pyramids", prep, img1)
(levels2, packs2) = timeit("prepare_pyramids2", prep, img2)
top = len(packs1) - 1
key = jax.random.PRNGKey(0)

tx, ty, c = timeit(
    "patchmatch coarse (fwd)", patchmatch,
    packs1[top], packs2[top], key, cfg.patchmatch, cfg.cost,
    cfg.cost_tap_chunk,
)

# single cost field eval at coarse
pc = jax.jit(lambda a, b, x, y: patch_cost(a, b, x, y, cfg.cost, cfg.cost_tap_chunk))
timeit("patch_cost 1x coarse", pc, packs1[top], packs2[top], tx, ty)

# 6-candidate eval at coarse
txs = jnp.stack([tx] * 6)
tys = jnp.stack([ty] * 6)
pcc = jax.jit(lambda a, b, x, y: patch_cost_candidates(a, b, x, y, cfg.cost, cfg.cost_tap_chunk))
timeit("patch_cost 6cand coarse", pcc, packs1[top], packs2[top], txs, tys)

lrc = jax.jit(lambda *a: lr_check(*a, cfg.refine.lr_diff_thresh))
tx1, ty1, c1, *_ = timeit("lr_check coarse", lrc, tx, ty, c, tx, ty, c)
orm = jax.jit(lambda *a: outlier_removal(*a, cfg.refine))
tx1, ty1, c1 = timeit("outlier_removal coarse", orm, tx1, ty1, c1)
wmf = jax.jit(lambda a, b, i: weighted_median_filter(
    a, b, i, cfg.refine, num_iter=cfg.refine.wmf_coarse_iters,
    only_occlusion=True))
tx1, ty1 = timeit("WMF x20 coarse", wmf, tx1, ty1, levels1[top])
fh = jax.jit(fill_holes)
tx1, ty1 = timeit("fill_holes coarse", fh, tx1, ty1, levels1[top])
flow = nnf_to_flow(tx1, ty1)

for lvl in range(top - 1, -1, -1):
    oh, ow = packs1[lvl].shape[0], packs1[lvl].shape[1]
    rs = jax.jit(lambda f, o=oh, w=ow: bilinear_resize(f, o, w, 2.0) * 2.0)
    flow = timeit(f"upsample -> L{lvl}", rs, flow)
    blf = jax.jit(lambda f, p1, p2: blf_refine_flow(
        f, p1, p2, cfg.cost, cfg.cost_tap_chunk))
    flow = timeit(f"blf_refine L{lvl} ({oh}x{ow})", blf, flow, packs1[lvl], packs2[lvl])
    sm = jax.jit(lambda f, i: flow_smoothing(f, i, cfg.refine))
    flow = timeit(f"flow_smoothing L{lvl}", sm, flow, levels1[lvl])

sm0 = jax.jit(lambda f, i: flow_smoothing(f, i, cfg.refine))
flow = timeit("flow_smoothing final L0", sm0, flow, levels1[0])
print("done", flow.shape)
