from cfd_julia_tpu.stepping.loop import run_steps, run_steps_with_snapshots  # noqa: F401
from cfd_julia_tpu.stepping.ssprk3 import ssprk3_step  # noqa: F401
