from cfd_julia_tpu.ops import (  # noqa: F401
    arakawa,
    crweno,
    norms,
    riemann,
    spectral,
    stencil,
    tridiag,
    weno,
)
