from ntrace_tpu.ray.raybatch import RayBatch, morton_sort_rays  # noqa: F401
from ntrace_tpu.ray.pixeltable import pixel_table  # noqa: F401
from ntrace_tpu.ray import raygen  # noqa: F401
