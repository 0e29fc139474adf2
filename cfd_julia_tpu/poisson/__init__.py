from cfd_julia_tpu.poisson import direct, iterative, multigrid  # noqa: F401
