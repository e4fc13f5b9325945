from .timing import DeviceTimer, Timer, profile_trace, time_stage
