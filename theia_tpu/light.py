"""Wavelength and light sources.

Each source contributes a pure sampling function consuming the per-lane
:class:`~theia_tpu.random.RNGState`; draw counts (``nRNG*``) are normative
and match the reference so identical Philox streams produce identical
simulations (reference: src/theia/light.py, shader/lightsource.*.glsl,
shader/wavelengthsource.*.glsl).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from . import units as u
from .component import Component
from .material import MediumConstants
from .ops.math3d import dot, local_frame, normalize, vec3
from .ops.sampling import TWO_PI, sample_unit_sphere, spherical_to_cartesian
from .random import RNGState

__all__ = [
    "WavelengthSource",
    "ConstWavelengthSource",
    "UniformWavelengthSource",
    "HostWavelengthSource",
    "LightSource",
    "SphericalLightSource",
    "PencilLightSource",
    "ConeLightSource",
    "HostLightSource",
    "SourceRay",
    "dw_dA",
]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SourceRay:
    """Light-source sample (reference: shader/lightsource.common.glsl:11-46).
    ``stokes``/``pol_ref`` are None for unpolarized sources."""

    position: jax.Array  # f32[N,3]
    direction: jax.Array  # f32[N,3]
    start_time: jax.Array  # f32[N]
    contrib: jax.Array  # f32[N]
    stokes: jax.Array | None = None  # f32[N,4]
    pol_ref: jax.Array | None = None  # f32[N,3]


def dw_dA(observer: jax.Array, target: jax.Array, normal: jax.Array | None):
    """Jacobian converting an area integral to a solid-angle integral:
    dw = |cos|/r^2 dA (reference: lightsource.common.glsl:40-56).
    ``normal=None`` (or the zero vector) marks a volume point (cos = 1)."""
    direction = target - observer
    r2 = dot(direction, direction)
    if normal is None:
        cos_nrm = 1.0
    else:
        d = normalize(direction)
        is_zero = dot(normal, normal) == 0.0
        cos_nrm = jnp.where(is_zero, 1.0, jnp.abs(dot(d, normal)))
    return cos_nrm / r2


# ---------------------------------------------------------------------------
# wavelength sources
# ---------------------------------------------------------------------------


class WavelengthSource(Component):
    """Base class for wavelength samplers (reference: src/theia/light.py:58-78)."""

    name = "Wavelength Source"
    nRNGSamples: int = 0

    def sample(self, params, rng: RNGState) -> tuple[tuple, RNGState]:
        """Returns ((wavelength, contrib), advanced rng)."""
        raise NotImplementedError


class ConstWavelengthSource(WavelengthSource):
    """Monochromatic source (reference: src/theia/light.py:258-283)."""

    name = "Const Wavelength Source"
    nRNGSamples = 0
    _param_names = ("wavelength",)

    def __init__(self, wavelength: float = 600.0 * u.nm) -> None:
        self.wavelength = wavelength

    def sample(self, params, rng: RNGState):
        lam = jnp.broadcast_to(params["wavelength"], rng.stream.shape)
        return (lam, jnp.ones_like(lam)), rng


class UniformWavelengthSource(WavelengthSource):
    """Uniform wavelength in [lam_min, lam_max]; contribution 1 when
    normalized else the range width (reference: src/theia/light.py:286-348,
    shader/wavelengthsource.uniform.glsl)."""

    name = "Uniform Wavelength Source"
    nRNGSamples = 1
    _param_names = ("lambdaRange", "_contrib")
    _extra_names = ("normalize",)

    def __init__(
        self,
        *,
        lambdaRange: tuple[float, float] = (300.0, 700.0),
        normalize: bool = True,
    ) -> None:
        self.lambdaRange = lambdaRange
        self.normalize = normalize
        self._contrib = 1.0

    def update(self) -> None:
        lr = self.lambdaRange[1] - self.lambdaRange[0]
        self._contrib = abs(lr) if (lr != 0.0 and not self.normalize) else 1.0

    def params(self):
        self.update()
        return super().params()

    def sample(self, params, rng: RNGState):
        uu, rng = rng.uniform()
        lo, hi = params["lambdaRange"][0], params["lambdaRange"][1]
        lam = lo * (1.0 - uu) + hi * uu
        contrib = jnp.broadcast_to(params["_contrib"], lam.shape)
        return (lam, contrib), rng


class HostWavelengthSource(WavelengthSource):
    """Samples provided by the host as arrays indexed by the lane's stream id
    (reference: src/theia/light.py:87-257)."""

    name = "Host Wavelength Source"
    nRNGSamples = 0
    _param_names = ("wavelength", "contrib")

    def __init__(self, wavelength, contrib=None) -> None:
        self.wavelength = np.asarray(wavelength, np.float32)
        self.contrib = (
            np.ones_like(self.wavelength)
            if contrib is None
            else np.asarray(contrib, np.float32)
        )

    def sample(self, params, rng: RNGState):
        idx = rng.stream.astype(jnp.int32) % params["wavelength"].shape[0]
        return (
            (jnp.take(params["wavelength"], idx), jnp.take(params["contrib"], idx)),
            rng,
        )


# ---------------------------------------------------------------------------
# light sources
# ---------------------------------------------------------------------------


class LightSource(Component):
    """Base class for light sources (reference: src/theia/light.py:417-460)."""

    name = "Light Source"
    supportForward: bool = False
    supportBackward: bool = False
    nRNGForward: int = 0
    nRNGBackward: int = 0

    def sample_forward(
        self, params, wavelength, constants: MediumConstants, rng: RNGState
    ) -> tuple[SourceRay, RNGState]:
        raise NotImplementedError

    def sample_backward(
        self,
        params,
        observer,
        normal,
        wavelength,
        constants: MediumConstants,
        rng: RNGState,
    ) -> tuple[SourceRay, RNGState]:
        raise NotImplementedError


class SphericalLightSource(LightSource):
    """Isotropic unpolarized point source distributing ``budget`` photons/
    energy (reference: src/theia/light.py:1105-1180,
    shader/lightsource.spherical.glsl)."""

    name = "Spherical Light Source"
    supportForward = True
    supportBackward = True
    nRNGForward = 3
    nRNGBackward = 1
    _param_names = ("position", "timeRange", "_contribFwd", "_contribBwd")
    _extra_names = ("budget",)

    def __init__(
        self,
        *,
        position=(0.0, 0.0, 0.0),
        timeRange=(0.0, 100.0),
        budget: float = 1.0,
    ) -> None:
        self.position = position
        self.timeRange = timeRange
        self.budget = budget
        self._contribFwd = budget
        self._contribBwd = budget / (4.0 * np.pi)

    def update(self) -> None:
        self._contribFwd = self.budget
        # forward: the 4pi parameter volume cancels with the sampling prob
        self._contribBwd = self.budget / (4.0 * np.pi)

    def params(self):
        self.update()
        return super().params()

    def sample_forward(self, params, wavelength, constants, rng: RNGState):
        (u1, u2), rng = rng.uniform2d()
        direction = sample_unit_sphere(u1, u2)
        v, rng = rng.uniform()
        t0, t1 = params["timeRange"][0], params["timeRange"][1]
        start = t0 * (1.0 - v) + t1 * v
        pos = jnp.broadcast_to(params["position"], direction.shape)
        contrib = jnp.broadcast_to(params["_contribFwd"], start.shape)
        return SourceRay(pos, direction, start, contrib), rng

    def sample_backward(self, params, observer, normal, wavelength, constants, rng):
        pos = jnp.broadcast_to(params["position"], observer.shape)
        direction = normalize(observer - pos)
        uu, rng = rng.uniform()
        t0, t1 = params["timeRange"][0], params["timeRange"][1]
        start = t0 * (1.0 - uu) + t1 * uu
        contrib = params["_contribBwd"] * dw_dA(pos, observer, normal)
        return SourceRay(pos, direction, start, contrib), rng


class PencilLightSource(LightSource):
    """Delta beam (forward only)
    (reference: src/theia/light.py:1024-1102, shader/lightsource.pencil.glsl)."""

    name = "Pencil Light Source"
    supportForward = True
    supportBackward = False
    nRNGForward = 1
    _param_names = ("position", "direction", "budget", "timeRange")

    def __init__(
        self,
        *,
        position=(0.0, 0.0, 0.0),
        direction=(0.0, 0.0, 1.0),
        timeRange=(0.0, 100.0),
        budget: float = 1.0,
    ) -> None:
        self.position = position
        self.direction = direction
        self.timeRange = timeRange
        self.budget = budget

    def sample_forward(self, params, wavelength, constants, rng: RNGState):
        uu, rng = rng.uniform()
        t0, t1 = params["timeRange"][0], params["timeRange"][1]
        start = t0 * (1.0 - uu) + t1 * uu
        pos = jnp.broadcast_to(params["position"], (*start.shape, 3))
        direction = jnp.broadcast_to(params["direction"], pos.shape)
        contrib = jnp.broadcast_to(params["budget"], start.shape)
        return SourceRay(pos, direction, start, contrib), rng


class ConeLightSource(LightSource):
    """Point source emitting uniformly into a cone
    (reference: src/theia/light.py:883-1021, shader/lightsource.cone.glsl)."""

    name = "Cone Light Source"
    supportForward = True
    supportBackward = True
    nRNGForward = 3
    nRNGBackward = 1
    _param_names = (
        "position",
        "direction",
        "cosOpeningAngle",
        "timeRange",
        "_contribFwd",
        "_contribBwd",
    )
    _extra_names = ("budget",)

    def __init__(
        self,
        *,
        position=(0.0, 0.0, 0.0),
        direction=(0.0, 0.0, 1.0),
        cosOpeningAngle: float = 0.5,
        timeRange=(0.0, 100.0),
        budget: float = 1.0,
    ) -> None:
        self.position = position
        self.direction = direction
        self.cosOpeningAngle = cosOpeningAngle
        self.timeRange = timeRange
        self.budget = budget
        self.update()

    def update(self) -> None:
        self._contribFwd = self.budget
        self._contribBwd = self.budget / (
            2.0 * np.pi * (1.0 - self.cosOpeningAngle)
        )

    def params(self):
        self.update()
        return super().params()

    def sample_forward(self, params, wavelength, constants, rng: RNGState):
        (u1, u2), rng = rng.uniform2d()
        phi = jnp.float32(TWO_PI) * u1
        cos_theta = (1.0 - u2) + params["cosOpeningAngle"] * u2
        sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
        local = vec3(sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta)
        axis = normalize(
            jnp.broadcast_to(params["direction"], (*phi.shape, 3))
        )
        vx, vy = local_frame(axis)
        direction = (
            local[..., 0:1] * vx + local[..., 1:2] * vy + local[..., 2:3] * axis
        )
        v, rng = rng.uniform()
        t0, t1 = params["timeRange"][0], params["timeRange"][1]
        start = t0 * (1.0 - v) + t1 * v
        pos = jnp.broadcast_to(params["position"], direction.shape)
        contrib = jnp.broadcast_to(params["_contribFwd"], start.shape)
        return SourceRay(pos, direction, start, contrib), rng

    def sample_backward(self, params, observer, normal, wavelength, constants, rng):
        pos = jnp.broadcast_to(params["position"], observer.shape)
        direction = normalize(observer - pos)
        cos_angle = dot(direction, jnp.broadcast_to(params["direction"], pos.shape))
        inside = cos_angle > params["cosOpeningAngle"]
        contrib = (
            params["_contribBwd"]
            * inside.astype(jnp.float32)
            * dw_dA(pos, observer, normal)
        )
        uu, rng = rng.uniform()
        t0, t1 = params["timeRange"][0], params["timeRange"][1]
        start = t0 * (1.0 - uu) + t1 * uu
        return SourceRay(pos, direction, start, contrib), rng


class HostLightSource(LightSource):
    """Source rays provided by the host as arrays indexed by stream id
    (reference: src/theia/light.py:692-881)."""

    name = "Host Light Source"
    supportForward = True
    supportBackward = False
    nRNGForward = 0
    _param_names = ("position", "direction", "startTime", "contrib")

    def __init__(self, position, direction, startTime, contrib) -> None:
        self.position = np.asarray(position, np.float32)
        self.direction = np.asarray(direction, np.float32)
        self.startTime = np.asarray(startTime, np.float32)
        self.contrib = np.asarray(contrib, np.float32)

    def sample_forward(self, params, wavelength, constants, rng: RNGState):
        idx = rng.stream.astype(jnp.int32) % params["startTime"].shape[0]
        return (
            SourceRay(
                position=jnp.take(params["position"], idx, axis=0),
                direction=jnp.take(params["direction"], idx, axis=0),
                start_time=jnp.take(params["startTime"], idx),
                contrib=jnp.take(params["contrib"], idx),
            ),
            rng,
        )
