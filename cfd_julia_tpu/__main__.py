import sys

from cfd_julia_tpu.cli import main

sys.exit(main())
