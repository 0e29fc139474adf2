from cfd_julia_tpu.parallel import halo, mesh, sharded  # noqa: F401
