"""Low-level device ops: vector math, sampling helpers, Pallas kernels."""

from .math3d import *  # noqa: F401,F403
from .sampling import *  # noqa: F401,F403
