from ntrace_tpu.render.renderer import Renderer, RenderResult, build_accel, render_frame  # noqa: F401
