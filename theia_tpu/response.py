"""Hit responses: turn detector hits into recorded results.

Functional design: a response owns a *state* pytree threaded through the
jitted trace step; ``record`` folds a masked wavefront of hits into it and
``result`` finalizes (applying the 1/batchSize normalization the reference
applies in its reducer kernel, estimator.reduce.glsl:17-35). Histogram
accumulation uses XLA scatter-add over bins instead of shared-memory float
atomics (reference: src/theia/response.py, shader/response.histogram.glsl).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .component import Component, TraceConfig
from .random import RNGState
from .trace.core import HitItem

__all__ = [
    "ValueResponse",
    "UniformValueResponse",
    "CustomValueResponse",
    "HitResponse",
    "HistogramHitResponse",
    "KernelHistogramHitResponse",
    "HitRecorder",
    "StoreTimeHitResponse",
]


class ValueResponse(Component):
    """Maps a HitItem to a scalar detector response value
    (reference: src/theia/response.py:444-483)."""

    name = "Value Response"
    nRNGSamples: int = 0

    def value(
        self, params, item: HitItem, rng: RNGState
    ) -> tuple[jax.Array, RNGState]:
        raise NotImplementedError

    def prepare(self, config: TraceConfig) -> None:
        pass


class UniformValueResponse(ValueResponse):
    """Perfect isotropic, uniform response: value = contribution
    (reference: shader/response.uniform.glsl)."""

    name = "Uniform Value Response"

    def value(self, params, item: HitItem, rng: RNGState):
        return item.contrib, rng


class CustomValueResponse(ValueResponse):
    """User-provided value function ``fn(params, item, rng) -> (value, rng)``
    (reference: src/theia/response.py:498-530)."""

    name = "Custom Value Response"

    def __init__(self, fn, *, nRNGSamples: int = 0, params=None) -> None:
        self._fn = fn
        self.nRNGSamples = nRNGSamples
        self._custom_params = params or {}

    def params(self):
        return dict(self._custom_params)

    def value(self, params, item: HitItem, rng: RNGState):
        return self._fn(params, item, rng)


class HitResponse(Component):
    """Base class for hit responses (reference: src/theia/response.py:125-188)."""

    name = "Hit Response"
    nRNGSamples: int = 0

    def prepare(self, config: TraceConfig) -> None:
        """Called by the tracer during construction."""
        self._config = config

    def init(self):
        """Fresh accumulator state for one batch."""
        raise NotImplementedError

    def record(
        self, params, state, item: HitItem, mask: jax.Array, rng: RNGState
    ) -> tuple[object, RNGState]:
        """Fold a masked wavefront of hits into the state."""
        raise NotImplementedError

    def result(self, params, state):
        """Finalize the batch (applies normalization)."""
        return state


class HistogramHitResponse(HitResponse):
    """Time-binned histogram of response values — the light curve
    (reference: src/theia/response.py:1200-1421,
    shader/response.histogram.glsl:16-68)."""

    name = "Histogram Hit Response"
    _param_names = ("t0", "binSize")

    def __init__(
        self,
        value_response: ValueResponse | None = None,
        *,
        nBins: int = 100,
        t0: float = 0.0,
        binSize: float = 1.0,
        normalization: float | None = None,
    ) -> None:
        self.value_response = (
            UniformValueResponse() if value_response is None else value_response
        )
        self.nBins = nBins
        self.t0 = t0
        self.binSize = binSize
        self._normalization = normalization
        self.nRNGSamples = self.value_response.nRNGSamples

    def params(self):
        p = super().params()
        p["value"] = self.value_response.params()
        return p

    def prepare(self, config: TraceConfig) -> None:
        super().prepare(config)
        self.value_response.prepare(config)
        if self._normalization is None:
            self._normalization = config.normalization

    def init(self):
        return jnp.zeros(self.nBins, jnp.float32)

    def record(self, params, state, item: HitItem, mask, rng: RNGState):
        value, rng = self.value_response.value(params.get("value", {}), item, rng)
        # time gradient is meaningless through floor(); bin on the detached time
        t = jax.lax.stop_gradient(item.time)
        bin_f = jnp.floor((t - params["t0"]) / params["binSize"])
        bins = bin_f.astype(jnp.int32)
        oob = (bin_f < 0) | (bin_f >= self.nBins) | ~mask
        bins = jnp.where(oob, self.nBins, bins)  # dropped by mode="drop"
        value = jnp.where(oob, 0.0, value)
        state = state.at[bins].add(value, mode="drop")
        return state, rng

    def result(self, params, state):
        return state * jnp.float32(self._normalization)


class KernelHistogramHitResponse(HistogramHitResponse):
    """Histogram with Gaussian kernel smearing (binned KDE) — also gives a
    smooth, differentiable dependence on arrival time
    (reference: src/theia/response.py:1424-1673,
    shader/response.histogram.kernel.glsl)."""

    name = "Kernel Histogram Hit Response"
    _param_names = ("t0", "binSize", "bandwidth")

    def __init__(
        self,
        value_response: ValueResponse | None = None,
        *,
        nBins: int = 100,
        t0: float = 0.0,
        binSize: float = 1.0,
        bandwidth: float = 1.0,
        support: int = 4,
        normalization: float | None = None,
    ) -> None:
        super().__init__(
            value_response,
            nBins=nBins,
            t0=t0,
            binSize=binSize,
            normalization=normalization,
        )
        self.bandwidth = bandwidth
        self.support = support  # kernel support in +-bins (static)

    def record(self, params, state, item: HitItem, mask, rng: RNGState):
        value, rng = self.value_response.value(params.get("value", {}), item, rng)
        t = item.time  # differentiable: kernel weights are smooth in time
        h = params["bandwidth"]
        center_f = (t - params["t0"]) / params["binSize"]
        base = jnp.floor(jax.lax.stop_gradient(center_f)).astype(jnp.int32)
        norm = params["binSize"] / (h * jnp.sqrt(2.0 * jnp.pi))
        for off in range(-self.support, self.support + 1):
            bins = base + off
            # kernel evaluated at bin centers, scaled to integrate to ~1
            bc = (bins.astype(jnp.float32) + 0.5) * params["binSize"] + params["t0"]
            w = jnp.exp(-0.5 * jnp.square((bc - t) / h)) * norm
            oob = (bins < 0) | (bins >= self.nBins) | ~mask
            b = jnp.where(oob, self.nBins, bins)
            v = jnp.where(oob, 0.0, value * w)
            state = state.at[b].add(v, mode="drop")
        return state, rng


class HitRecorder(HitResponse):
    """Stores raw hits for host retrieval; slots are deterministic
    (record-call-major) rather than an atomic-counter queue
    (reference: src/theia/response.py:191-275).

    The result is a dict of arrays of shape (maxHits, ...) plus a ``valid``
    mask."""

    name = "Hit Recorder"

    def __init__(self, *, polarized: bool = False) -> None:
        self.polarized = polarized

    def prepare(self, config: TraceConfig) -> None:
        super().prepare(config)
        self._capacity = config.capacity * config.max_hits_per_thread

    def init(self):
        n = self._capacity
        state = dict(
            cursor=jnp.int32(0),  # traced: record() runs inside lax loops
            position=jnp.zeros((n, 3), jnp.float32),
            direction=jnp.zeros((n, 3), jnp.float32),
            normal=jnp.zeros((n, 3), jnp.float32),
            wavelength=jnp.zeros(n, jnp.float32),
            time=jnp.zeros(n, jnp.float32),
            contrib=jnp.zeros(n, jnp.float32),
            objectId=jnp.zeros(n, jnp.int32),
            valid=jnp.zeros(n, bool),
        )
        if self._config.polarized:
            state["stokes"] = jnp.zeros((n, 4), jnp.float32)
            state["polRef"] = jnp.zeros((n, 3), jnp.float32)
        return state

    def record(self, params, state, item: HitItem, mask, rng: RNGState):
        # compact accepted lanes to the cursor (the atomic-counter queue
        # analogue, reference: hephaistos.queue); overflow drops hits
        c = state["cursor"]
        slot = c + jnp.cumsum(mask.astype(jnp.int32)) - 1
        slot = jnp.where(mask, slot, self._capacity)  # dropped by mode="drop"

        def upd(buf, val):
            return buf.at[slot].set(val, mode="drop")

        new_state = dict(
            cursor=jnp.minimum(
                c + jnp.sum(mask.astype(jnp.int32)), self._capacity
            ),
            position=upd(state["position"], item.position),
            direction=upd(state["direction"], item.direction),
            normal=upd(state["normal"], item.normal),
            wavelength=upd(state["wavelength"], item.wavelength),
            time=upd(state["time"], item.time),
            contrib=upd(state["contrib"], item.contrib),
            objectId=upd(state["objectId"], item.object_id),
            valid=upd(state["valid"], mask),
        )
        if "stokes" in state:
            new_state["stokes"] = upd(state["stokes"], item.stokes)
            new_state["polRef"] = upd(state["polRef"], item.pol_ref)
        return new_state, rng


class StoreTimeHitResponse(HitResponse):
    """Photon-mode sampler: accept each hit with probability equal to its
    response value and store the arrival time — converting radiance
    contributions into discrete photon detections
    (reference: src/theia/response.py:656-797, shader/response.time.store.glsl)."""

    name = "Store Time Hit Response"

    def __init__(self, value_response: ValueResponse | None = None) -> None:
        self.value_response = (
            UniformValueResponse() if value_response is None else value_response
        )
        self.nRNGSamples = self.value_response.nRNGSamples + 1

    def params(self):
        return {"value": self.value_response.params()}

    def prepare(self, config: TraceConfig) -> None:
        super().prepare(config)
        self.value_response.prepare(config)
        self._capacity = config.capacity * config.max_hits_per_thread

    def init(self):
        n = self._capacity
        return dict(
            cursor=jnp.int32(0),
            time=jnp.zeros(n, jnp.float32),
            objectId=jnp.zeros(n, jnp.int32),
            valid=jnp.zeros(n, bool),
        )

    def record(self, params, state, item: HitItem, mask, rng: RNGState):
        value, rng = self.value_response.value(params.get("value", {}), item, rng)
        uu, rng = rng.uniform()
        accept = mask & (uu < value)
        c = state["cursor"]
        slot = c + jnp.cumsum(accept.astype(jnp.int32)) - 1
        slot = jnp.where(accept, slot, self._capacity)

        def upd(buf, val):
            return buf.at[slot].set(val, mode="drop")

        state = dict(
            cursor=jnp.minimum(
                c + jnp.sum(accept.astype(jnp.int32)), self._capacity
            ),
            time=upd(state["time"], item.time),
            objectId=upd(state["objectId"], item.object_id),
            valid=upd(state["valid"], accept),
        )
        return state, rng
