"""Counter-based random number generation.

Implements the Philox 4x32-10 generator with the exact stream/dimension
addressing scheme of the reference implementation so that random sequences
(and therefore whole simulations) can be verified bit-for-bit against it
(reference: src/theia/shader/random.philox.glsl:15-94, src/theia/random.py:228-282).

Addressing scheme
-----------------
Every light path owns one *stream* (its global path index). Within a stream,
draws are indexed by a *dimension* counter that each sampling routine
advances. Draw ``i`` of stream ``s`` under base key ``K`` (64 bit) and base
offset ``C`` (128 bit) is computed as::

    block = philox4x32_10(key = K + s  (mod 2^64, carry rolls into low word),
                          ctr = C + 4*i (mod 2^128, carry rolls into low word))
    value = normalize(block[i mod 4])

where ``normalize(x) = min(1 - 2^-24f, float(x) * 2^-32)`` yields a float32
in ``[0, 1)``. The factor 4 in the counter and the ``i mod 4`` word-select
mirror the reference's (partially redundant) buffering scheme and are kept
for bit-exactness.

The host advances ``C`` between batches by ``4 * nRNGSamples`` *draws*
(i.e. ``offset`` counts draws; the counter stores ``4*offset``)... see
:class:`PhiloxRNG`.

All generator math is pure ``jnp`` on ``uint32`` and therefore runs
vectorized on the TPU VPU; 32x32->64 bit multiplies are emulated with 16-bit
limbs (TPUs have no native 64-bit integer path).
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from os import urandom
import warnings

import jax
import jax.numpy as jnp

__all__ = [
    "philox4x32",
    "philox_uniform",
    "uniform_from_bits",
    "PhiloxRNG",
    "RNGState",
    "RNG",
]

# Philox 4x32 round multipliers and Weyl key schedule constants
_M0 = jnp.uint32(0xD2511F53)
_M1 = jnp.uint32(0xCD9E8D57)
_W0 = jnp.uint32(0x9E3779B9)
_W1 = jnp.uint32(0xBB67AE85)

#: largest float32 < 1.0
ONE_MINUS_EPSILON = float(jnp.asarray(0x3F7FFFFF, jnp.uint32).view(jnp.float32))
#: 2^-32 as float32
_EPSILON = float(jnp.asarray(0x2F800000, jnp.uint32).view(jnp.float32))


def _u32(x) -> jax.Array:
    return jnp.asarray(x, jnp.uint32)


def _umul32wide(a: jax.Array, b: jax.Array) -> tuple[jax.Array, jax.Array]:
    """32x32 -> 64 bit unsigned multiply via 16-bit limbs; returns (hi, lo)."""
    mask = jnp.uint32(0xFFFF)
    a_lo, a_hi = a & mask, a >> 16
    b_lo, b_hi = b & mask, b >> 16
    ll = a_lo * b_lo
    hl = a_hi * b_lo
    lh = a_lo * b_hi
    hh = a_hi * b_hi
    # middle partial sum; each term < 2^16 so no overflow in uint32
    mid = (ll >> 16) + (hl & mask) + (lh & mask)
    lo = (ll & mask) | (mid << 16)
    hi = hh + (hl >> 16) + (lh >> 16) + (mid >> 16)
    return hi, lo


def _add_carry(a: jax.Array, b: jax.Array) -> tuple[jax.Array, jax.Array]:
    """uint32 add with carry-out (0/1)."""
    s = a + b
    return s, (s < b).astype(jnp.uint32)


def philox4x32(key0, key1, c0, c1, c2, c3, rounds: int = 10):
    """Philox 4x32 block cipher on uint32 words (vectorized over any shape).

    Word order follows the reference: counter words are little-endian
    (c0 = lowest). Returns the four output words.
    """
    k0, k1 = _u32(key0), _u32(key1)
    x, y, z, w = _u32(c0), _u32(c1), _u32(c2), _u32(c3)
    for _ in range(rounds):
        hi0, lo0 = _umul32wide(_M0, x)
        hi1, lo1 = _umul32wide(_M1, z)
        x, y, z, w = hi1 ^ y ^ k0, lo1, hi0 ^ w ^ k1, lo0
        k0 = k0 + _W0
        k1 = k1 + _W1
    return x, y, z, w


def uniform_from_bits(bits: jax.Array) -> jax.Array:
    """Map uint32 bits to float32 in [0, 1) exactly like the reference
    (reference: src/theia/shader/random.util.glsl:8-13)."""
    return jnp.minimum(
        jnp.float32(ONE_MINUS_EPSILON), bits.astype(jnp.float32) * jnp.float32(_EPSILON)
    )


@jax.jit
def philox_uniform(
    key: jax.Array, counter: jax.Array, stream: jax.Array, draw: jax.Array
) -> jax.Array:
    """Draw ``draw`` of stream ``stream`` as float32 in [0, 1).

    Parameters
    ----------
    key: uint32[2]
        base key words (lo, hi)
    counter: uint32[4]
        base counter words (little-endian)
    stream, draw:
        uint32 arrays (broadcastable); the per-path stream id and the
        per-path dimension/draw index
    """
    stream = _u32(stream)
    draw = _u32(draw)
    # 128-bit counter += 4*draw, final carry rolls over into lowest word
    inc = draw << 2
    c0, carry = _add_carry(_u32(counter[0]), inc)
    c1, carry = _add_carry(_u32(counter[1]), carry)
    c2, carry = _add_carry(_u32(counter[2]), carry)
    c3, carry = _add_carry(_u32(counter[3]), carry)
    c0 = c0 + carry
    # 64-bit key += stream, carry rolls over into low word
    k0, carry = _add_carry(_u32(key[0]), stream)
    k1, carry = _add_carry(_u32(key[1]), carry)
    k0 = k0 + carry

    x, y, z, w = philox4x32(k0, k1, c0, c1, c2, c3)
    idx = draw & jnp.uint32(3)
    word = jnp.where(idx == 0, x, jnp.where(idx == 1, y, jnp.where(idx == 2, z, w)))
    return uniform_from_bits(word)


def _tree_dataclass(cls):
    return jax.tree_util.register_dataclass(cls)


@_tree_dataclass
@dataclass(frozen=True)
class RNGState:
    """Traceable per-lane RNG cursor: base key/counter plus (stream, dim).

    Immutable; drawing returns the value(s) and an advanced state, emulating
    the GLSL ``random(idx, inout dim)`` idiom functionally::

        u, rng = rng.uniform()
        (u1, u2), rng = rng.uniform2d()
    """

    key: jax.Array  # uint32[2]
    counter: jax.Array  # uint32[4]
    stream: jax.Array  # uint32 scalar (per lane)
    dim: jax.Array  # uint32 scalar (per lane)

    def uniform(self) -> tuple[jax.Array, "RNGState"]:
        u = philox_uniform(self.key, self.counter, self.stream, self.dim)
        return u, replace(self, dim=self.dim + jnp.uint32(1))

    def uniform2d(self) -> tuple[tuple[jax.Array, jax.Array], "RNGState"]:
        u1 = philox_uniform(self.key, self.counter, self.stream, self.dim)
        u2 = philox_uniform(
            self.key, self.counter, self.stream, self.dim + jnp.uint32(1)
        )
        return (u1, u2), replace(self, dim=self.dim + jnp.uint32(2))

    def skip(self, n: int) -> "RNGState":
        """Advance the dimension counter without drawing."""
        return replace(self, dim=self.dim + jnp.uint32(n))


class RNG:
    """Base class for random number generators (component interface).

    Concrete generators provide :meth:`state` building the traceable state
    consumed by tracers, mirroring the reference's RNG pipeline-stage
    contract (reference: src/theia/random.py:28-41).
    """

    def state(self, stream, dim=0) -> RNGState:  # pragma: no cover - interface
        raise NotImplementedError


@dataclass
class PhiloxRNG(RNG):
    """Philox 4x32-10 generator with host-side offset bookkeeping.

    Parameters
    ----------
    key: int | None
        64-bit base key; consecutive streams use key+stream. Randomly
        generated (with a warning) if None.
    offset: int
        Number of draws to skip in every stream; used to advance the
        generator between batches.
    autoAdvance: int
        Amount ``offset`` is incremented by on every :meth:`advance` call
        (typically the tracer's ``nRNGSamples``).
    """

    key: int | None = None
    offset: int = 0
    autoAdvance: int = 0

    def __post_init__(self) -> None:
        if self.key is None:
            self.key = int.from_bytes(urandom(8), "big")
            warnings.warn(f"Random RNG key generated: 0x{self.key:016X}")

    @property
    def key_words(self) -> jax.Array:
        k = self.key & 0xFFFFFFFFFFFFFFFF
        return jnp.array([k & 0xFFFFFFFF, (k >> 32) & 0xFFFFFFFF], jnp.uint32)

    @property
    def counter_words(self) -> jax.Array:
        # the 128-bit counter advances 4 per draw (one philox block per draw)
        c = (4 * self.offset) & (2**128 - 1)
        return jnp.array(
            [(c >> (32 * i)) & 0xFFFFFFFF for i in range(4)], jnp.uint32
        )

    def state(self, stream, dim=0) -> RNGState:
        """Build the traceable state for the given stream id array."""
        stream = _u32(stream)
        return RNGState(
            key=self.key_words,
            counter=self.counter_words,
            stream=stream,
            dim=_u32(jnp.broadcast_to(_u32(dim), stream.shape)),
        )

    def advance(self, n: int | None = None) -> None:
        """Advance ``offset`` by n draws (default: ``autoAdvance``)."""
        self.offset += self.autoAdvance if n is None else n


def rng_buffer(rng: "PhiloxRNG", n_streams: int, n_draws: int) -> jax.Array:
    """Fill a (n_streams, n_draws) buffer with uniform samples for host-side
    statistical tests (reference: src/theia/random.py:44-199 RNGBufferSink).

    Host-side generators (e.g. :class:`SobolQRNG`) are dispatched to their
    own ``sample`` method."""
    if not hasattr(rng, "key_words"):
        import numpy as np

        return jnp.asarray(np.asarray(rng.sample(n_streams))[:, :n_draws])
    streams = jnp.arange(n_streams, dtype=jnp.uint32)[:, None]
    draws = jnp.arange(n_draws, dtype=jnp.uint32)[None, :]
    return philox_uniform(rng.key_words, rng.counter_words, streams, draws)


class SobolQRNG(RNG):
    """Owen-scrambled Sobol sampler (host-side).

    The reference's GPU Sobol implementation is documented broken
    (docs/pipeline/components.md:195-197); this provides the quasi-random
    sequence via scipy for host-side workflows (Host* sources, statistical
    tests). Tracer integration intentionally mirrors the reference's
    status and falls back to Philox.
    """

    def __init__(self, *, seed: int = 0, dims: int = 64) -> None:
        self.seed = seed
        self.dims = dims
        self.offset = 0
        self.autoAdvance = 0

    def sample(self, n: int) -> "np.ndarray":
        from scipy.stats import qmc
        import numpy as np

        eng = qmc.Sobol(self.dims, scramble=True, seed=self.seed)
        if self.offset:
            eng.fast_forward(self.offset)
        return eng.random(n)

    def advance(self, n: int | None = None) -> None:
        self.offset += self.autoAdvance if n is None else n
