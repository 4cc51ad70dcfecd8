from ntrace_tpu.bvh.host_bvh import HostBVH  # noqa: F401
from ntrace_tpu.bvh.flatten import FlatBVH, flatten_bvh  # noqa: F401
from ntrace_tpu.bvh.median import build_median_bvh  # noqa: F401
