from cfd_julia_tpu.models import heat1d  # noqa: F401
