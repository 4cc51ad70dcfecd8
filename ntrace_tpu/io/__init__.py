from ntrace_tpu.io.obj import load_obj, load_scene_cached  # noqa: F401
from ntrace_tpu.io.image import write_png, tonemap  # noqa: F401
