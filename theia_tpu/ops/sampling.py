"""Direction sampling helpers.

Reproduces the reference's sampling routines exactly, including the RNG->
value mapping, so identical Philox streams yield identical samples
(reference: src/theia/shader/util.sample.glsl:6-95).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from .math3d import local_frame, vec3

__all__ = [
    "spherical_to_cartesian",
    "sample_direction_cone",
    "sample_unit_sphere",
    "sample_unit_disk",
    "sample_hemisphere",
    "sample_hemisphere_cosine",
    "sample_hemisphere_cosine_pdf",
    "scatter_dir",
    "TWO_PI",
    "INV_4PI",
]

TWO_PI = 6.283185307179586477
FOUR_PI = 12.56637061435917295
INV_PI = 0.318309886183790671
INV_4PI = 0.0795774715459476679
PI_OVER_TWO = 1.570796326794896619
PI_OVER_FOUR = 0.7853981633974483096


def spherical_to_cartesian(phi, cos_theta) -> jax.Array:
    """Note the reference's (sin, cos) convention: x = sinθ·sinφ, y = sinθ·cosφ."""
    cos_theta = jnp.asarray(cos_theta, jnp.float32)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    return vec3(sin_theta * jnp.sin(phi), sin_theta * jnp.cos(phi), cos_theta)


def sample_direction_cone(cos_opening, u1, u2) -> jax.Array:
    """Uniform direction in the cone around +z with opening cosine."""
    phi = jnp.float32(TWO_PI) * u1
    cos_theta = (1.0 - u2) + cos_opening * u2
    return spherical_to_cartesian(phi, cos_theta)


def sample_unit_sphere(u1, u2) -> jax.Array:
    phi = jnp.float32(TWO_PI) * u1
    cos_theta = 2.0 * u2 - 1.0
    return spherical_to_cartesian(phi, cos_theta)


def sample_unit_disk(u1, u2) -> jax.Array:
    """Concentric disk sampling (PBRT A.5); z = 0."""
    x = 2.0 * u1 - 1.0
    y = 2.0 * u2 - 1.0
    use_x = jnp.abs(x) > jnp.abs(y)
    r = jnp.where(use_x, x, y)
    safe_x = jnp.where(x == 0.0, 1.0, x)
    safe_y = jnp.where(y == 0.0, 1.0, y)
    phi = jnp.where(
        use_x,
        jnp.float32(PI_OVER_FOUR) * (y / safe_x),
        jnp.float32(PI_OVER_TWO) - jnp.float32(PI_OVER_FOUR) * (x / safe_y),
    )
    degenerate = (x == 0.0) & (y == 0.0)
    r = jnp.where(degenerate, 0.0, r)
    return vec3(r * jnp.cos(phi), r * jnp.sin(phi), jnp.zeros_like(r))


def sample_hemisphere(u1, u2) -> jax.Array:
    phi = jnp.float32(TWO_PI) * u1
    cos_theta = 1.0 - jnp.asarray(u2, jnp.float32)  # excludes 0.0
    return spherical_to_cartesian(phi, cos_theta)


def sample_hemisphere_cosine(u1, u2) -> jax.Array:
    """Malley's method: project concentric disk onto hemisphere."""
    d = sample_unit_disk(u1, u2)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - d[..., 0] ** 2 - d[..., 1] ** 2))
    return vec3(d[..., 0], d[..., 1], z)


def sample_hemisphere_cosine_pdf(direction: jax.Array) -> jax.Array:
    return jnp.float32(INV_PI) * direction[..., 2]


def scatter_dir(prev_dir: jax.Array, cos_theta, phi) -> jax.Array:
    """Rotate a local (cosθ, φ) scatter direction into the global frame of
    ``prev_dir`` (reference: src/theia/shader/scatter.volume.glsl:7-28).

    Note the local direction uses the (cos, sin) convention here, unlike
    :func:`spherical_to_cartesian` — matching the reference."""
    from .math3d import normalize

    prev_dir = normalize(prev_dir)
    cos_theta = jnp.asarray(cos_theta, jnp.float32)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    local = vec3(
        sin_theta * jnp.cos(phi),
        sin_theta * jnp.sin(phi),
        cos_theta,
    )
    local = normalize(local)
    vx, vy = local_frame(prev_dir)
    out = (
        local[..., 0:1] * vx + local[..., 1:2] * vy + local[..., 2:3] * prev_dir
    )
    return normalize(out)
