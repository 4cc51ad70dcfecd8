from ntrace_tpu.parallel.mesh import make_mesh, trace_sharded, render_step_sharded  # noqa: F401
