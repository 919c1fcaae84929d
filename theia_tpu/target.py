"""Targets: analytic detector proxies for volume tracing.

A target provides three pure functions — ``sample`` (next-event
estimation), ``intersect`` and ``occluded`` — returning a
:class:`TargetSample` wavefront pytree (reference: src/theia/target.py:37-75,
shader/target.common.glsl). Lanes carry a ``valid`` mask instead of
divergent early returns.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from . import units as u
from .component import Component
from .ops.math3d import (
    distance,
    dot,
    intersect_sphere,
    local_frame,
    normalize,
    vec3,
)
from .ops.sampling import sample_direction_cone, sample_unit_sphere
from .random import RNGState

__all__ = ["TargetSample", "Target", "SphereTarget", "InnerSphereTarget"]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class TargetSample:
    """Sampled/intersected point on a target
    (reference: shader/target.common.glsl:4-16).

    ``offset``/``world_to_obj`` give the world->object transform as
    obj = world_to_obj @ world + offset (orthogonal part only)."""

    position: jax.Array  # f32[N,3] world space
    normal: jax.Array  # f32[N,3] world space
    dist: jax.Array  # f32[N] observer->sample distance
    obj_position: jax.Array  # f32[N,3]
    obj_normal: jax.Array  # f32[N,3]
    prob: jax.Array  # f32[N] sample probability over area
    valid: jax.Array  # bool[N]
    offset: jax.Array  # f32[N,3]
    world_to_obj: jax.Array  # f32[N,3,3]


class Target(Component):
    """Base class for targets (reference: src/theia/target.py:37-75)."""

    name = "Target"
    nRNGSamples: int = 0

    def sample(
        self, params, observer: jax.Array, rng: RNGState
    ) -> tuple[TargetSample, RNGState]:
        raise NotImplementedError

    def intersect(
        self, params, observer: jax.Array, direction: jax.Array
    ) -> TargetSample:
        raise NotImplementedError

    def occluded(self, params, position: jax.Array) -> jax.Array:
        raise NotImplementedError


def _eye3(shape) -> jax.Array:
    return jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (*shape, 3, 3))


class SphereTarget(Target):
    """Sphere sampled via its visible cap; object space is the unit sphere
    at the origin (reference: src/theia/target.py:78-141,
    shader/target.sphere.glsl)."""

    name = "Sphere Target"
    nRNGSamples = 2
    _param_names = ("position", "radius")

    def __init__(self, *, position=(0.0, 0.0, 0.0), radius: float = 1.0 * u.m):
        self.position = position
        self.radius = radius

    def _common(self, params, shape):
        center = jnp.broadcast_to(params["position"], (*shape, 3))
        r = params["radius"]
        inv_pos = -center / r
        world_to_obj = _eye3(shape) / r
        hemi_prob = 1.0 / (2.0 * np.pi * r * r)
        return center, r, inv_pos, world_to_obj, hemi_prob

    def sample(self, params, observer, rng: RNGState):
        shape = observer.shape[:-1]
        center, r, inv_pos, w2o, hemi_prob = self._common(params, shape)
        axis = normalize(observer - center)  # center -> observer
        d = distance(observer, center)
        cos_opening = r / d
        (u1, u2), rng = rng.uniform2d()
        local = sample_direction_cone(cos_opening, u1, u2)
        vx, vy = local_frame(axis)
        normal = (
            local[..., 0:1] * vx + local[..., 1:2] * vy + local[..., 2:3] * axis
        )
        pos = normal * r + center
        prob = hemi_prob / (1.0 - cos_opening)
        valid = ~jnp.isinf(prob)
        prob = jnp.where(valid, prob, 0.0)
        return (
            TargetSample(
                position=pos,
                normal=normal,
                dist=distance(pos, observer),
                obj_position=normal,
                obj_normal=normal,
                prob=prob,
                valid=valid,
                offset=inv_pos,
                world_to_obj=w2o,
            ),
            rng,
        )

    def intersect(self, params, observer, direction):
        shape = observer.shape[:-1]
        center, r, inv_pos, w2o, hemi_prob = self._common(params, shape)
        t, _ = intersect_sphere(center, r, observer, direction)
        hit = (t > 0.0) & ~jnp.isinf(t)
        t_safe = jnp.where(hit, t, 1.0)
        pos = observer + direction * t_safe[..., None]
        nrm = normalize(pos - center)
        d = distance(observer, center)
        cos_opening = r / d
        prob = hemi_prob / (1.0 - cos_opening)
        valid = hit & ~jnp.isinf(prob)
        prob = jnp.where(valid, prob, 0.0)
        return TargetSample(
            position=pos,
            normal=nrm,
            dist=jnp.where(hit, t, jnp.inf),
            obj_position=nrm,
            obj_normal=nrm,
            prob=prob,
            valid=valid,
            offset=inv_pos,
            world_to_obj=w2o,
        )

    def occluded(self, params, position):
        center = jnp.broadcast_to(params["position"], position.shape)
        return distance(position, center) <= params["radius"]


class InnerSphereTarget(Target):
    """Sphere detected from the inside (reference: src/theia/target.py:142-201,
    shader/target.sphere.inner.glsl)."""

    name = "Inner Sphere Target"
    nRNGSamples = 2
    _param_names = ("position", "radius")

    def __init__(self, *, position=(0.0, 0.0, 0.0), radius: float = 1.0 * u.m):
        self.position = position
        self.radius = radius

    def _common(self, params, shape):
        center = jnp.broadcast_to(params["position"], (*shape, 3))
        r = params["radius"]
        inv_pos = -center / r
        world_to_obj = _eye3(shape) / r
        prob = 1.0 / (4.0 * np.pi * r * r)
        return center, r, inv_pos, world_to_obj, prob

    def sample(self, params, observer, rng: RNGState):
        shape = observer.shape[:-1]
        center, r, inv_pos, w2o, prob = self._common(params, shape)
        (u1, u2), rng = rng.uniform2d()
        normal = sample_unit_sphere(u1, u2)
        pos = r * normal + center
        return (
            TargetSample(
                position=pos,
                normal=-normal,
                dist=distance(observer, pos),
                obj_position=normal,
                obj_normal=-normal,
                prob=jnp.full(shape, prob, jnp.float32),
                valid=jnp.ones(shape, bool),
                offset=inv_pos,
                world_to_obj=w2o,
            ),
            rng,
        )

    def intersect(self, params, observer, direction):
        shape = observer.shape[:-1]
        center, r, inv_pos, w2o, prob = self._common(params, shape)
        _, t = intersect_sphere(center, r, observer, direction)  # far hit
        hit = (t > 0.0) & ~jnp.isinf(t)
        t_safe = jnp.where(hit, t, 1.0)
        pos = observer + direction * t_safe[..., None]
        nrm = normalize(center - pos)
        return TargetSample(
            position=pos,
            normal=nrm,
            dist=jnp.where(hit, t, jnp.inf),
            obj_position=-nrm,
            obj_normal=nrm,
            prob=jnp.full(shape, prob, jnp.float32),
            valid=hit,
            offset=inv_pos,
            world_to_obj=w2o,
        )

    def occluded(self, params, position):
        center = jnp.broadcast_to(params["position"], position.shape)
        return distance(position, center) >= params["radius"]


# ---------------------------------------------------------------------------
# target guides (MIS proxies for scene tracing)
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class TargetGuideSample:
    """Guide sample: direction + max trace distance + solid-angle pdf
    (reference: shader/target_guide.common.glsl:4-9)."""

    direction: jax.Array  # f32[N,3]
    dist: jax.Array  # f32[N]
    prob: jax.Array  # f32[N]


class TargetGuide(Component):
    """Base class for target guides (reference: src/theia/target.py:427-469)."""

    name = "Target Guide"
    nRNGSamples: int = 0

    def sample(self, params, observer, rng: RNGState):
        raise NotImplementedError

    def eval(self, params, observer, direction) -> TargetGuideSample:
        raise NotImplementedError


class SphereTargetGuide(TargetGuide):
    """Samples the cone subtending a sphere, weighted toward passing fully
    through it (reference: src/theia/target.py:470-527,
    shader/target_guide.sphere.glsl)."""

    name = "Sphere Target Guide"
    nRNGSamples = 2
    _param_names = ("position", "radius")

    def __init__(self, *, position=(0.0, 0.0, 0.0), radius: float = 1.0 * u.m):
        self.position = position
        self.radius = radius

    def _cone(self, params, observer):
        center = jnp.broadcast_to(params["position"], observer.shape)
        d = distance(center, observer)
        view_dir = normalize(center - observer)
        sin_max = params["radius"] / d
        sin2 = sin_max * sin_max
        cos_min = 1.0 - jnp.sqrt(jnp.maximum(1.0 - sin2, 0.0))
        # Taylor fallback for narrow cones (f32 catastrophic cancellation)
        cos_min = jnp.where(sin2 < 0.00068523, 0.5 * sin2, cos_min)
        prob = 1.0 / (2.0 * np.pi * cos_min)
        prob = prob * (d > params["radius"]).astype(jnp.float32)
        dist = d + params["radius"]
        return view_dir, cos_min, prob, dist

    def sample(self, params, observer, rng: RNGState):
        view_dir, cos_min, prob, dist = self._cone(params, observer)
        u1, rng = rng.uniform()
        u2, rng = rng.uniform()
        cos_theta = 1.0 - cos_min * u1
        sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
        phi = jnp.float32(2.0 * np.pi) * u2
        vx, vy = local_frame(view_dir)
        direction = (
            (sin_theta * jnp.sin(phi))[..., None] * vx
            + (sin_theta * jnp.cos(phi))[..., None] * vy
            + cos_theta[..., None] * view_dir
        )
        return TargetGuideSample(direction, dist, prob), rng

    def eval(self, params, observer, direction) -> TargetGuideSample:
        view_dir, cos_min, prob, dist = self._cone(params, observer)
        cos_dir = dot(view_dir, direction)
        prob = prob * (cos_min >= 1.0 - cos_dir).astype(jnp.float32)
        return TargetGuideSample(direction, dist, prob)
