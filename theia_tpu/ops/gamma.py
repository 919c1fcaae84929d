"""Gamma-distribution sampling (Cheng's GA rejection algorithm).

Vectorized wavefront version of the reference's per-thread sampler
(reference: src/theia/shader/random.gamma.glsl). Rejection makes the draw
count data-dependent; the reference explicitly documents this as
non-stream-deterministic (src/theia/light.py:1633-1640), so lanes here
simply iterate until every lane accepted. The result is detached from AD
at the call sites (sampled geometry is frozen).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..random import RNGState

__all__ = ["sample_gamma"]


def sample_gamma(alpha, rng: RNGState) -> tuple[jax.Array, RNGState]:
    """Sample Gamma(alpha, 1) per lane; ``alpha`` broadcast to lane shape."""
    shape = rng.stream.shape
    alpha = jnp.broadcast_to(jnp.asarray(alpha, jnp.float32), shape)

    # alpha < 1: rescale via Gamma(alpha+1) * U^(1/alpha)
    u0, rng = rng.uniform()
    small = alpha < 1.0
    scale = jnp.where(small, jnp.power(u0, 1.0 / jnp.maximum(alpha, 1e-6)), 1.0)
    a_eff = jnp.where(small, alpha + 1.0, alpha)

    # Cheng (1977) GA; NOTE the reference's GLSL variant
    # (random.gamma.glsl:10-29) inverts `a` and uses c = alpha + 1/alpha,
    # which measurably biases the distribution (~3% low mean at alpha=4) —
    # we implement the correct algorithm instead
    lam = jnp.sqrt(2.0 * a_eff - 1.0)
    b = a_eff - jnp.log(4.0)
    c = a_eff + lam

    # iteration cap: Cheng's GA accepts with probability > 1/3 per try for
    # valid alpha, so 64 rounds leave ~0 unaccepted lanes; the cap exists
    # because an invalid lane (alpha <= 0 or NaN from upstream) would
    # otherwise never accept and deadlock the whole device program —
    # such lanes exit as NaN instead
    max_rounds = 64

    def cond(carry):
        accepted, _, _, i = carry
        return ~jnp.all(accepted) & (i < max_rounds)

    def body(carry):
        accepted, x, rng, i = carry
        (u1, u2), rng = rng.uniform2d()
        u1 = jnp.clip(u1, 1e-7, 1.0 - 1e-7)
        v = jnp.log(u1 / (1.0 - u1)) / lam
        cand = a_eff * jnp.exp(v)
        ok = (b + c * v - cand) >= jnp.log(u1 * u1 * u2)
        x = jnp.where(~accepted & ok, cand, x)
        return accepted | ok, x, rng, i + 1

    accepted = jnp.zeros(shape, bool)
    x = jnp.zeros(shape, jnp.float32)
    accepted, x, rng, _ = lax.while_loop(
        cond, body, (accepted, x, rng, jnp.int32(0))
    )
    x = jnp.where(accepted, x, jnp.float32(jnp.nan))
    return scale * x, rng
