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
    "LightSampler",
    "BackwardLightSampler",
    "CameraRaySampler",
    "CameraDirectSampler",
    "TargetSampler",
    "TargetGuideSampler",
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


# ---------------------------------------------------------------------------
# reference-style sampler stages
# ---------------------------------------------------------------------------


def _as_result(obj) -> dict:
    """Dataclass-of-arrays -> result dict with reference camelCase keys
    (start_time -> startTime, pol_ref -> polRef, ...); None fields drop."""
    import dataclasses

    def camel(name: str) -> str:
        head, *rest = name.split("_")
        return head + "".join(w.capitalize() for w in rest)

    return {
        camel(f.name): np.asarray(getattr(obj, f.name))
        for f in dataclasses.fields(obj)
        if getattr(obj, f.name) is not None
    }


class _Sampler:
    """Base of the reference-style sampler stages (reference:
    src/theia/testing.py / LightSampler / CameraRaySampler): construct
    with a component and a capacity, call :meth:`run` per batch — the
    RNG advances between batches like a pipeline stage's would."""

    #: draw budget reserved per item between batches
    _DRAWS_PER_ITEM = 64

    def __init__(self, capacity: int, rng=None) -> None:
        self.capacity = capacity
        self.rng = rng if rng is not None else PhiloxRNG(key=0xC0FFEE)

    def _advance(self):
        self.rng.advance(self._DRAWS_PER_ITEM)

    def run(self) -> dict:
        out = self._sample()
        self._advance()
        return out


class LightSampler(_Sampler):
    """Draws forward light samples (reference: theia.light.LightSampler);
    ``run()`` returns the SoA dict described by items.LightSampleItem
    (PolarizedLightSampleItem when the source emits polarized light)."""

    def __init__(
        self, source, capacity, *, wavelength=450.0, medium=None, rng=None
    ):
        super().__init__(capacity, rng)
        self.source = source
        self.wavelength = wavelength
        self.medium = medium

    def _sample(self):
        ray = sampleLight(
            self.source,
            self.capacity,
            wavelength=self.wavelength,
            medium=self.medium,
            rng=self.rng,
        )
        return _as_result(ray)


class BackwardLightSampler(_Sampler):
    """Backward light samples toward an observer
    (reference: src/theia/testing.py BackwardLightSampler)."""

    def __init__(
        self,
        source,
        observer,
        capacity,
        *,
        normal=None,
        wavelength=450.0,
        medium=None,
        rng=None,
    ):
        super().__init__(capacity, rng)
        self.source = source
        self.observer = observer
        self.normal = normal
        self.wavelength = wavelength
        self.medium = medium

    def _sample(self):
        ray = sampleBackwardLight(
            self.source,
            self.observer,
            self.capacity,
            normal=self.normal,
            wavelength=self.wavelength,
            medium=self.medium,
            rng=self.rng,
        )
        return _as_result(ray)


class CameraRaySampler(_Sampler):
    """Camera ray samples (reference: theia.camera.CameraRaySampler);
    the dict matches items.CameraRayItem's fields."""

    def __init__(self, camera, capacity, *, wavelength=450.0, rng=None):
        super().__init__(capacity, rng)
        self.camera = camera
        self.wavelength = wavelength

    def _sample(self):
        ray = sampleCameraRay(
            self.camera, self.capacity, wavelength=self.wavelength, rng=self.rng
        )
        return _as_result(ray)


class CameraDirectSampler(_Sampler):
    """Camera points for direct lighting
    (reference: src/theia/testing.py CameraDirectSampler)."""

    def __init__(self, camera, capacity, *, wavelength=450.0, rng=None):
        super().__init__(capacity, rng)
        self.camera = camera
        self.wavelength = wavelength

    def _sample(self):
        pt = sampleCameraPoint(
            self.camera, self.capacity, wavelength=self.wavelength, rng=self.rng
        )
        return _as_result(pt)


class TargetSampler(_Sampler):
    """Target samples from an observer
    (reference: src/theia/testing.py TargetSampler)."""

    def __init__(self, target, observer, capacity, *, rng=None):
        super().__init__(capacity, rng)
        self.target = target
        self.observer = observer

    def _sample(self):
        smp = sampleTarget(self.target, self.observer, self.capacity, rng=self.rng)
        return _as_result(smp)


class TargetGuideSampler(_Sampler):
    """Guide-direction samples from an observer
    (reference: src/theia/testing.py TargetGuideSampler)."""

    def __init__(self, guide, observer, capacity, *, rng=None):
        super().__init__(capacity, rng)
        self.guide = guide
        self.observer = observer

    def _sample(self):
        smp = sampleTargetGuide(
            self.guide, self.observer, self.capacity, rng=self.rng
        )
        return _as_result(smp)
