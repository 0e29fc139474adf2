from cfd_julia_tpu.utils import checkpoint, io, profiling  # noqa: F401
