"""theia_tpu — a TPU-native differentiable transient Monte Carlo path tracer.

A from-scratch JAX/Pallas framework with the capabilities of the reference
Vulkan ray tracer (tkerscher/theia): time-resolved, optionally polarized
Monte Carlo light propagation through scattering media with physically
correct Fresnel interaction at media boundaries, producing light curves —
plus, beyond the reference, end-to-end differentiability w.r.t. medium
parameters and multi-chip scaling via jax.sharding.
"""

from . import units
from .random import PhiloxRNG, RNGState

__version__ = "0.1.0"
