from ntrace_tpu.trace.common import SENTINEL, TraceState  # noqa: F401
from ntrace_tpu.trace.cpu import trace_cpu_golden  # noqa: F401
