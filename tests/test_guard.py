"""Failure-detection / recovery subsystem (eppm_tpu.utils.guard).

The reference aborts the process on any device error (helper_cuda.h);
this layer instead validates outputs, classifies faults, and retries
recoverable ones — requirements of the serving deployment this
framework targets.
"""

import numpy as np
import pytest

from eppm_tpu.config import UNKNOWN_FLOW
from eppm_tpu.utils import (
    FlowGuardError,
    check_flow,
    flow_sanity,
    is_device_fault,
    stable_throughput,
    with_recovery,
)


def test_flow_sanity_clean_field():
    flow = np.full((16, 16, 2), 2.5, np.float32)
    rep = flow_sanity(flow)
    assert rep.finite_frac == 1.0
    assert rep.unknown_frac == 0.0
    assert abs(rep.max_mag - np.hypot(2.5, 2.5)) < 1e-6
    assert rep.warp_ratio is None


def test_flow_sanity_counts_sentinels_and_nonfinite():
    flow = np.zeros((10, 10, 2), np.float32)
    flow[0, :, 0] = UNKNOWN_FLOW          # 10 sentinel pixels
    flow[1, 0, 1] = np.nan                # 1 non-finite pixel
    rep = flow_sanity(flow)
    assert rep.finite_frac < 1.0
    assert 0.10 <= rep.unknown_frac <= 0.12  # 11/100 unknown-or-bad

    with pytest.raises(FlowGuardError):
        check_flow(flow)


def test_check_flow_warp_ratio_gate():
    rng = np.random.default_rng(0)
    img = rng.random((20, 20, 3)).astype(np.float32)
    # shifted[y, x] = img[y, x-3]; warp_error(img1=shifted, img2=img, f)
    # compares shifted(x) to img(x+u)  ->  the explaining flow is u = -3
    shifted = np.roll(img, 3, axis=1)
    good = np.zeros((20, 20, 2), np.float32)
    good[..., 0] = -3.0
    rep = check_flow(good, shifted, img, max_warp_ratio=0.6)
    assert rep.warp_ratio < 0.6

    bad = -good                            # opposite of the motion
    with pytest.raises(FlowGuardError):
        check_flow(bad, shifted, img, max_warp_ratio=0.6)


def test_check_flow_magnitude_gate():
    flow = np.full((8, 8, 2), 100.0, np.float32)
    with pytest.raises(FlowGuardError):
        check_flow(flow, max_mag=50.0)
    check_flow(flow, max_mag=200.0)


def test_is_device_fault_classification():
    assert is_device_fault(RuntimeError("TPU worker process crashed"))
    assert is_device_fault(RuntimeError("UNAVAILABLE: connection reset"))
    assert not is_device_fault(RuntimeError("shapes (3,) and (4,) differ"))
    assert not is_device_fault(ValueError("UNAVAILABLE"))  # user error type


def test_with_recovery_retries_device_faults_only():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("INTERNAL: TPU worker process crashed")
        return "ok"

    faults = []
    out = with_recovery(
        flaky, retries=2, backoff_s=0.0,
        on_fault=lambda e, k: faults.append(k),
    )()
    assert out == "ok" and calls["n"] == 2 and faults == [0]

    def user_error():
        raise ValueError("bad shape")

    with pytest.raises(ValueError):
        with_recovery(user_error, retries=3, backoff_s=0.0)()

    def always_down():
        raise RuntimeError("UNAVAILABLE")

    with pytest.raises(RuntimeError):
        with_recovery(always_down, retries=1, backoff_s=0.0)()


def test_stable_throughput_skips_degraded_transient():
    import time as _t

    times = iter([0.08, 0.02, 0.02, 0.02, 0.02, 0.02])

    def run_batch():
        _t.sleep(next(times))
        return [0]

    best = stable_throughput(run_batch, max_batches=6)
    # the slow first (recovery-transient) batch must not be the result
    assert best < 0.06
