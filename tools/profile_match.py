#!/usr/bin/env python
"""Substage wall timing of match_coarse on the real device.

The coarse matcher is the largest single stage left in the 1080p budget
(~36 ms per direction at the 135x240 coarse level); this script times its
internal stages the same way profile_stages.py times pipeline stages
(scalar-reduced readback; subtract the 'noop scalar' floor line).

Usage: python tools/profile_match.py [HxW]   (default 1080x1920 -> coarse)
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, ".")
import dataclasses

from eppm_tpu.config import DEFAULT_CONFIG as cfg
from eppm_tpu.pipeline import prepare_pyramids
from eppm_tpu.ops.match import (
    _mini_pyramid, descend_level, global_match, match_coarse,
    patch_descriptors, propagate_dense, rescore,
)
from eppm_tpu.ops.cost import make_patch_stack, patch_cost_stack
from eppm_tpu.ops._util import grid as _grid
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


shape = sys.argv[1] if len(sys.argv) > 1 else "1080x1920"
h, w = (int(v) for v in shape.split("x"))
rng = np.random.default_rng(0)
small = rng.random((h // 8 + 2, w // 8 + 2, 3)).astype(np.float32)
base = np.asarray(jax.image.resize(jnp.asarray(small), (h, w, 3), "linear"))
img2 = jnp.asarray(np.clip(base + 0.1 * rng.random((h, w, 3)), 0, 1))
img1 = jnp.asarray(np.roll(np.asarray(img2), (-5, -3), axis=(1, 0)))

prep = jax.jit(lambda a: prepare_pyramids(a, cfg))
levels1, packs1 = prep(img1)
levels2, packs2 = prep(img2)
top = len(packs1) - 1
l1, l2 = levels1[top], levels2[top]
p1, p2 = packs1[top], packs2[top]
ch, cw = l1.shape[0], l1.shape[1]
print(f"input {h}x{w}, coarse level {ch}x{cw}")

timeit("noop scalar (tunnel floor)", lambda a: a[0, 0, 0], l1)
timeit(
    "match_coarse (whole, one direction)",
    lambda i1, i2, q1, q2: match_coarse(
        i1, i2, cfg.cost, cfg.match, cfg.cost_tap_chunk, q1, q2),
    l1, l2, p1, p2,
)

mcfg = cfg.match
levels_n = 0
while (levels_n < mcfg.descent_levels
       and min(ch, cw) // 2 ** (levels_n + 1) >= mcfg.min_level_dim):
    levels_n += 1

timeit(
    "mini_pyramid x2",
    lambda i1, i2, q1, q2: (
        _mini_pyramid(i1, levels_n, pack0=q1),
        _mini_pyramid(i2, levels_n, pack0=q2),
    ),
    l1, l2, p1, p2,
)
mp = jax.jit(lambda i, q: tuple(_mini_pyramid(i, levels_n, pack0=q)))
packs1m = mp(l1, p1)
packs2m = mp(l2, p2)

mini_cost = dataclasses.replace(
    cfg.cost, patch_radius=mcfg.mini_patch_radius, patch_stride=1,
    sigma_spatial=0.5 * mcfg.mini_patch_radius,
)

tiny1, tiny2 = packs1m[-1], packs2m[-1]
timeit("tiny descriptors x2",
       lambda a, b: (patch_descriptors(a, mcfg), patch_descriptors(b, mcfg)),
       tiny1, tiny2)
d1 = jax.jit(lambda a: patch_descriptors(a, mcfg))(tiny1)
d2 = jax.jit(lambda a: patch_descriptors(a, mcfg))(tiny2)
timeit("tiny global_match", lambda a, b: global_match(a, b, mcfg.global_block),
       d1, d2)
t_y, t_x = jax.jit(lambda a, b: global_match(a, b, mcfg.global_block))(d1, d2)
ys, xs = _grid(tiny1.shape[0], tiny1.shape[1])
flow = jnp.stack([(t_x - xs).astype(jnp.float32),
                  (t_y - ys).astype(jnp.float32)], -1)

timeit(
    f"tiny descend_level r={mcfg.descent_radius}",
    lambda a, b, f: descend_level(a, b, f, mcfg.descent_radius, mini_cost,
                                  cfg.cost_tap_chunk),
    tiny1, tiny2, flow,
)
flow = jax.jit(
    lambda a, b, f: descend_level(a, b, f, mcfg.descent_radius, mini_cost,
                                  cfg.cost_tap_chunk)[0]
)(tiny1, tiny2, flow)

for lvl in range(levels_n - 1, -1, -1):
    oh, ow = packs1m[lvl].shape[0], packs1m[lvl].shape[1]
    cc = cfg.cost if lvl == 0 else mini_cost
    flow = jax.jit(
        lambda f, o=oh, q=ow: bilinear_resize(f, o, q, 2.0) * 2.0)(flow)
    timeit(
        f"descend L{lvl} ({oh}x{ow})",
        lambda a, b, f, c=cc: descend_level(a, b, f, mcfg.descent_radius, c,
                                            cfg.cost_tap_chunk),
        packs1m[lvl], packs2m[lvl], flow,
    )
    flow, cost = jax.jit(
        lambda a, b, f, c=cc: descend_level(a, b, f, mcfg.descent_radius, c,
                                            cfg.cost_tap_chunk)
    )(packs1m[lvl], packs2m[lvl], flow)

# global at coarse
s = 2 if (ch * cw > mcfg.global_stride_threshold) else 1
timeit(f"coarse descriptors x2 (stride {s})",
       lambda a, b: (patch_descriptors(a, mcfg, stride=s),
                     patch_descriptors(b, mcfg, stride=s)),
       p1, p2)
dc1 = jax.jit(lambda a: patch_descriptors(a, mcfg, stride=s))(p1)
dc2 = jax.jit(lambda a: patch_descriptors(a, mcfg, stride=s))(p2)
timeit("coarse global_match",
       lambda a, b: global_match(a, b, mcfg.global_block), dc1, dc2)
timeit("coarse rescore (one field)",
       lambda a, b, g, t: rescore(a, b, g, t, cfg.cost, cfg.cost_tap_chunk),
       p1, p2, jnp.zeros((ch, cw), jnp.int32), jnp.zeros((ch, cw), jnp.int32))

cost0 = jax.jit(
    lambda a, b, g, t: rescore(a, b, g, t, cfg.cost, cfg.cost_tap_chunk)
)(p1, p2, jnp.trunc(flow[..., 1]).astype(jnp.int32),
  jnp.trunc(flow[..., 0]).astype(jnp.int32))

timeit(
    f"propagate_dense {mcfg.prop_steps}",
    lambda a, b, f, c: propagate_dense(a, b, f, c, mcfg.prop_steps, cfg.cost,
                                       cfg.cost_tap_chunk),
    p1, p2, flow, cost0,
)
timeit(
    f"final descend r={mcfg.final_radius}",
    lambda a, b, f: descend_level(a, b, f, mcfg.final_radius, cfg.cost,
                                  cfg.cost_tap_chunk),
    p1, p2, flow,
)

# exact stage pieces
exact_cfg = dataclasses.replace(cfg.cost, patch_stride=mcfg.exact_tap_stride)
offs2 = exact_cfg.tap_offsets
timeit("exact: make_patch_stack",
       lambda b: make_patch_stack(b, offs2, dtype=jnp.bfloat16), p2)
stack2 = jax.jit(
    lambda b: make_patch_stack(b, offs2, dtype=jnp.bfloat16))(p2)
ysc, xsc = _grid(ch, cw)
gx = jnp.trunc(flow[..., 0]).astype(jnp.int32)
gy = jnp.trunc(flow[..., 1]).astype(jnp.int32)
timeit(
    "exact: patch_cost_stack K=1",
    lambda q1, st, a, b: patch_cost_stack(q1, st, a, b, exact_cfg, offs2),
    p1, stack2, (xsc + gx)[None], (ysc + gy)[None],
)
K = len([o for o in __import__("eppm_tpu.ops.dense", fromlist=["x"])
         .center_out_offsets(mcfg.exact_polish_radius) if o != (0, 0)])
timeit(
    f"exact: patch_cost_stack K={K} (ring)",
    lambda q1, st, a, b: patch_cost_stack(q1, st, a, b, exact_cfg, offs2),
    p1, stack2,
    jnp.broadcast_to((xsc + gx)[None], (K, ch, cw)),
    jnp.broadcast_to((ysc + gy)[None], (K, ch, cw)),
)
print("done")
