from .guard import (
    FlowGuardError,
    FlowSanity,
    check_flow,
    flow_sanity,
    is_device_fault,
    stable_throughput,
    with_recovery,
)
from .timing import DeviceTimer, Timer, profile_trace, time_stage
