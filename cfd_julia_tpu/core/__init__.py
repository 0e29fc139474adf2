from cfd_julia_tpu.core.grid import Grid1D, Grid2D  # noqa: F401
from cfd_julia_tpu.core import precision  # noqa: F401
