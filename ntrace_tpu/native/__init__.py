from ntrace_tpu.native.build import native_obj_parse, native_available  # noqa: F401
