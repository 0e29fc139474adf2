from cfd_julia_tpu.ops import norms, stencil, tridiag  # noqa: F401
