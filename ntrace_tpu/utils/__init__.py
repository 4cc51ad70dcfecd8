from ntrace_tpu.utils.timing import StageTimer, device_time  # noqa: F401
