#!/usr/bin/env python
"""Headline benchmark: full EPPM pipeline throughput on the bundled
Middlebury Grove pair (640x480), the reference binary's own smoke workload
(main.cpp:36-79).

Prints ONE JSON line:
  {"metric": "grove_640x480_fps", "value": N, "unit": "frames/sec",
   "vs_baseline": N}

Baseline: the reference repo records no end-to-end number (BASELINE.md);
the CVPR-2014 EPPM paper presents the method as real-time-class at this
resolution on a contemporary GPU.  We anchor vs_baseline to 4.0 fps
(0.25 s/frame), the paper-era GPU figure, so vs_baseline > 1.0 means
faster than the reference-class implementation.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

BASELINE_FPS = 4.0


def _backend_alive(timeout_s: float = 150.0) -> bool:
    """Probe device-backend init in a subprocess.

    When the axon tunnel is hard-down, backend *init* (not just compute)
    blocks indefinitely in every process whose sitecustomize registers
    the plugin — an in-process probe would wedge this script.  A
    subprocess with a timeout is the only safe probe.
    """
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            capture_output=True, timeout=timeout_s,
        )
        return r.returncode == 0
    except (OSError, subprocess.SubprocessError):
        return False


def _maybe_cpu_fallback() -> bool:
    """If the device backend is unreachable, re-exec on CPU (labeled).

    Returns True when already running in fallback mode.  Bounded retry
    (3 probes over ~7 min) so a transient tunnel blip doesn't demote the
    round's benchmark to CPU.
    """
    if os.environ.get("EPPM_BENCH_CPU_FALLBACK"):
        return True
    if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        return False  # explicit CPU run, not a fallback
    for attempt in range(3):
        if _backend_alive():
            return False
        if attempt < 2:
            time.sleep(60)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["JAX_PLATFORMS"] = "cpu"
    env["EPPM_BENCH_CPU_FALLBACK"] = "1"
    os.execve(sys.executable, [sys.executable] + sys.argv, env)
    return True  # unreachable


def main() -> None:
    cpu_fallback = _maybe_cpu_fallback()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from eppm_tpu.io import read_ppm
    from eppm_tpu.metrics import warp_error
    from eppm_tpu.pipeline import compute_flow_jit

    img1 = jnp.asarray(read_ppm("/root/reference/frame10.ppm"))
    img2 = jnp.asarray(read_ppm("/root/reference/frame11.ppm"))

    # Warm up / compile.  Separate keys defeat identical-call caching in
    # the device tunnel; the host readback (np.asarray) forces real
    # synchronization — block_until_ready alone returns early through the
    # tunnel.
    flow = compute_flow_jit(img1, img2, jax.random.PRNGKey(0))
    np.asarray(flow)

    # Streaming throughput (the production serving shape): submit N pairs
    # back-to-back — JAX async dispatch pipelines device compute with the
    # host readbacks — and count wall time for all results on host.
    N = 2 if cpu_fallback else 8
    keys = [jax.random.PRNGKey(1234 + i) for i in range(N)]
    # stable_throughput: a TPU worker recovering from a prior process
    # crash serves the first seconds of traffic 10-20x degraded (measured
    # 2026-08-17: 0.36 fps then 8.7 fps from the identical program) —
    # measure batches until the best batch stops improving (utils.guard).
    from eppm_tpu.utils import stable_throughput

    outs = []

    def run_batch():
        flows = [compute_flow_jit(img1, img2, k) for k in keys]
        outs[:] = [np.asarray(f) for f in flows]
        return outs

    best = stable_throughput(run_batch, max_batches=2 if cpu_fallback else 6) / N
    flow = outs[0]
    fps = 1.0 / best

    # sanity gate 1: flow must actually explain the motion (photometric)
    f = flow
    a1 = np.asarray(img1, np.float64) / 255.0
    a2 = np.asarray(img2, np.float64) / 255.0
    we = warp_error(a1, a2, f)
    we0 = warp_error(a1, a2, np.zeros_like(f))
    # sanity gate 2: EPE on a known-ground-truth synthetic warp of the
    # Grove frame (a photometric gate alone passes any flow that merely
    # beats zero-flow; this one requires sub-pixel-class accuracy)
    from eppm_tpu.metrics import flow_error

    gt = np.zeros(f.shape, np.float32)
    gt[..., 0], gt[..., 1] = 7.0, -4.0
    h, w = gt.shape[:2]
    ys, xs = np.mgrid[0:h, 0:w]
    sy = np.clip(ys + int(gt[0, 0, 1]), 0, h - 1)
    sx = np.clip(xs + int(gt[0, 0, 0]), 0, w - 1)
    warped1 = np.asarray(img2)[sy, sx]
    fsyn = np.asarray(
        compute_flow_jit(jnp.asarray(warped1), img2, jax.random.PRNGKey(2))
    )
    b = 16
    epe_syn, _ = flow_error(fsyn[b:-b, b:-b], gt[b:-b, b:-b])
    if not (np.isfinite(f).all() and we < 0.5 * we0 and epe_syn < 1.0):
        print(
            json.dumps(
                {
                    "metric": "grove_640x480_fps",
                    "value": 0.0,
                    "unit": "frames/sec",
                    "vs_baseline": 0.0,
                    "error": (
                        f"quality gate failed: warp {we:.4f} vs zero-flow "
                        f"{we0:.4f}, synthetic EPE {epe_syn:.3f}"
                    ),
                }
            )
        )
        return

    line = {
        "metric": "grove_640x480_fps",
        "value": round(fps, 4),
        "unit": "frames/sec",
        "vs_baseline": round(fps / BASELINE_FPS, 4),
    }

    # BASELINE.json's north-star metric is "flow frames/sec/chip at 1080p";
    # capture it in the same driver-parsed line (extra keys, still ONE JSON
    # line).  Skipped in CPU fallback mode — a CPU 1080p run takes minutes
    # and measures nothing about the chip.
    if not cpu_fallback:
        rg = np.random.default_rng(0)
        himg = np.zeros((1080, 1920, 3), np.float32)
        for scale, amp in ((16, 0.6), (4, 0.3)):
            small = rg.random(
                (1080 // scale + 2, 1920 // scale + 2, 3)
            ).astype(np.float32)
            himg += amp * np.asarray(
                jax.image.resize(jnp.asarray(small), (1080, 1920, 3), "linear")
            )
        h2 = jnp.asarray(np.clip(himg, 0, 1))
        h1 = jnp.asarray(np.roll(np.asarray(h2), (-5, -3), axis=(1, 0)))
        hf = compute_flow_jit(h1, h2, jax.random.PRNGKey(0))
        np.asarray(hf[:1, :1])  # compile + warm
        dev = []
        for i in range(3):
            t0 = time.perf_counter()
            hf = compute_flow_jit(h1, h2, jax.random.PRNGKey(200 + i))
            np.asarray(hf[:1, :1])  # 4-byte completion fetch
            dev.append(time.perf_counter() - t0)
        line["hd1080p_device_ms"] = round(min(dev) * 1e3, 1)
        line["hd1080p_fps"] = round(1.0 / min(dev), 3)
    if cpu_fallback:
        line["error"] = (
            "TPU backend unreachable (axon tunnel down); value is a "
            "CPU-fallback measurement, not a TPU number"
        )
    print(json.dumps(line))


if __name__ == "__main__":
    main()
