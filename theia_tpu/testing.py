"""Testing helpers: standalone samplers and an analytic water model
(reference: src/theia/testing.py).

The samplers run a component's sampling function over a batch of streams
and return host arrays — the analogue of the reference's queue-filling
sampler stages used throughout its test suite."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import units as u
from .camera import Camera
from .light import LightSource, WavelengthSource
from .material import (
    DispersionFreeMedium,
    HenyeyGreensteinPhaseFunction,
    MediumModel,
    medium_constants,
)
from .random import PhiloxRNG
from .target import Target, TargetGuide

__all__ = [
    "WaterTestModel",
    "sampleLight",
    "sampleBackwardLight",
    "sampleCameraRay",
    "sampleCameraPoint",
    "sampleTarget",
    "sampleTargetGuide",
    "sampleWavelength",
]


class WaterTestModel(
    DispersionFreeMedium, HenyeyGreensteinPhaseFunction, MediumModel
):
    """Simple analytic water-like model for tests
    (reference: src/theia/testing.py:641-656)."""

    ModelName = "water_test"

    def __init__(self, *, mu_a=0.01, mu_s=0.05, g=0.9) -> None:
        DispersionFreeMedium.__init__(self, n=1.33, ng=1.36, mu_a=mu_a, mu_s=mu_s)
        HenyeyGreensteinPhaseFunction.__init__(self, g)


def _state(n, rng: PhiloxRNG | None):
    rng = rng if rng is not None else PhiloxRNG(key=0xC0FFEE)
    return rng.state(jnp.arange(n, dtype=jnp.uint32))


def _np(tree):
    import jax

    return jax.tree.map(np.asarray, tree)


def _constants(medium, wavelength, n):
    lam = jnp.broadcast_to(jnp.asarray(wavelength, jnp.float32), (n,))
    return lam, medium_constants(medium, lam)


def sampleWavelength(source: WavelengthSource, n: int, *, rng=None):
    """Sample n wavelengths: (wavelength, contrib) arrays
    (reference: theia.light.WavelengthSampler)."""
    (lam, contrib), _ = source.sample(source.params(), _state(n, rng))
    return np.asarray(lam), np.asarray(contrib)


def sampleLight(
    source: LightSource, n: int, *, wavelength=450.0, medium=None, rng=None
):
    """Sample n forward light rays (reference: theia.light.LightSampler)."""
    lam, const = _constants(medium, wavelength, n)
    ray, _ = source.sample_forward(source.params(), lam, const, _state(n, rng))
    return _np(ray)


def sampleBackwardLight(
    source: LightSource,
    observer,
    n: int,
    *,
    normal=None,
    wavelength=450.0,
    medium=None,
    rng=None,
):
    """Backward light samples toward an observer
    (reference: src/theia/testing.py BackwardLightSampler)."""
    lam, const = _constants(medium, wavelength, n)
    obs = jnp.broadcast_to(jnp.asarray(observer, jnp.float32), (n, 3))
    nrm = (
        jnp.zeros((n, 3), jnp.float32)
        if normal is None
        else jnp.broadcast_to(jnp.asarray(normal, jnp.float32), (n, 3))
    )
    ray, _ = source.sample_backward(
        source.params(), obs, nrm, lam, const, _state(n, rng)
    )
    return _np(ray)


def sampleCameraRay(camera: Camera, n: int, *, wavelength=450.0, rng=None):
    """Sample n camera rays (reference: theia.camera.CameraRaySampler)."""
    lam = jnp.full(n, wavelength, jnp.float32)
    ray, _ = camera.sample_ray(camera.params(), lam, _state(n, rng))
    return _np(ray)


def sampleCameraPoint(camera: Camera, n: int, *, wavelength=450.0, rng=None):
    """Sample n camera points for direct lighting
    (reference: src/theia/testing.py CameraDirectSampler)."""
    lam = jnp.full(n, wavelength, jnp.float32)
    pt, _ = camera.sample_point(camera.params(), lam, _state(n, rng))
    return _np(pt)


def sampleTarget(target: Target, observer, n: int, *, rng=None):
    """Sample target points from an observer
    (reference: src/theia/testing.py TargetSampler)."""
    obs = jnp.broadcast_to(jnp.asarray(observer, jnp.float32), (n, 3))
    smp, _ = target.sample(target.params(), obs, _state(n, rng))
    return _np(smp)


def sampleTargetGuide(guide: TargetGuide, observer, n: int, *, rng=None):
    """Sample guide directions (reference: src/theia/testing.py
    TargetGuideSampler)."""
    obs = jnp.broadcast_to(jnp.asarray(observer, jnp.float32), (n, 3))
    smp, _ = guide.sample(guide.params(), obs, _state(n, rng))
    return _np(smp)
