"""Trace event callbacks.

Called after every trace step with the wavefront's result codes; used for
live statistics and path recording (reference: src/theia/trace.py:49-305,
shader/callback.stat.glsl, shader/callback.track.glsl). Atomic counters
become masked reductions over the wavefront.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .component import Component
from .trace.core import EventResultCode, RayState

__all__ = [
    "TraceEventCallback",
    "EmptyEventCallback",
    "EventStatisticCallback",
    "TrackRecordCallback",
]


class TraceEventCallback(Component):
    """Base class; ``on_event`` folds one step's events into the state."""

    name = "Trace Event Callback"

    def init(self, batch_size: int, max_steps: int):
        return None

    def on_event(
        self, params, state, ray: RayState, code: jax.Array, mask: jax.Array, i,
        pol=None,
    ):
        """``pol``: optional ``(stokes, pol_ref)`` of forward rays for
        polarized track recording (reference: TRACK_POLARIZED)."""
        return state

    def result(self, params, state):
        return state


class EmptyEventCallback(TraceEventCallback):
    name = "Empty Event Callback"


#: statistic field order (reference: shader/callback.stat.glsl:7-19)
STAT_FIELDS = (
    "created",
    "scattered",
    "hit",
    "detected",
    "volume",
    "lost",
    "decayed",
    "absorbed",
    "missed",
    "maxIter",
    "error",
    "mismatch",
)

_CODE_TO_FIELD = {
    int(EventResultCode.RAY_CREATED): 0,
    int(EventResultCode.RAY_SCATTERED): 1,
    int(EventResultCode.RAY_HIT): 2,
    int(EventResultCode.RAY_DETECTED): 3,
    int(EventResultCode.VOLUME_HIT): 4,
    int(EventResultCode.RAY_LOST): 5,
    int(EventResultCode.RAY_DECAYED): 6,
    int(EventResultCode.RAY_ABSORBED): 7,
    int(EventResultCode.RAY_MISSED): 8,
    int(EventResultCode.MAX_ITER): 9,
    int(EventResultCode.ERROR_MEDIA_MISMATCH): 11,
}


class EventStatisticCallback(TraceEventCallback):
    """Counts events per result code
    (reference: src/theia/trace.py:77-186, shader/callback.stat.glsl).

    ``live=True`` restores the reference's *live* counters (its stat
    buffer is host-mapped memory readable while the GPU runs): every
    trace segment posts the running totals to the host through an
    unordered ``jax.debug.callback``, so :attr:`statistics` can be polled
    from another thread while a long batch executes on-device. Off by
    default — the host callback costs a device->host transfer per
    segment. Live counters are a single-device observability aid; under
    ``shard_map`` each shard overwrites the same snapshot."""

    name = "Event Statistic Callback"

    def __init__(self, *, live: bool = False) -> None:
        self.live = live
        self._live_counts = np.zeros(len(STAT_FIELDS), np.int64)

    def init(self, batch_size: int, max_steps: int):
        self._live_counts = np.zeros(len(STAT_FIELDS), np.int64)
        return jnp.zeros(len(STAT_FIELDS), jnp.int32)

    def on_event(self, params, state, ray, code, mask, i, pol=None):
        for c, field in _CODE_TO_FIELD.items():
            state = state.at[field].add(
                jnp.sum((mask & (code == c)).astype(jnp.int32))
            )
        # all errors also counted together
        err = mask & (code <= int(EventResultCode.ERROR_CODE_MAX_VALUE))
        state = state.at[10].add(jnp.sum(err.astype(jnp.int32)))
        if self.live:
            jax.debug.callback(self._post_live, state, ordered=False)
        return state

    def _post_live(self, counts) -> None:
        self._live_counts = np.asarray(counts).astype(np.int64)

    @property
    def statistics(self) -> dict[str, int]:
        """Latest counters posted by the running batch (``live=True``);
        after the batch completes they equal :meth:`result`."""
        return {f: int(v) for f, v in zip(STAT_FIELDS, self._live_counts)}

    def result(self, params, state) -> dict[str, int]:
        vals = np.asarray(state)
        return {f: int(v) for f, v in zip(STAT_FIELDS, vals)}


class TrackRecordCallback(TraceEventCallback):
    """Records full paths (position + time per step) for visualization
    (reference: src/theia/trace.py:189-305, shader/callback.track.glsl).

    With ``polarized=True`` each step additionally stores the Stokes
    vector and reference frame (11 columns: xyz t IQUV ref_xyz); steps
    without polarization data store the unpolarized state and a zero
    frame (reference: TRACK_POLARIZED, trace.py:200-202)."""

    name = "Track Record Callback"

    def __init__(self, *, polarized: bool = False) -> None:
        self.polarized = polarized

    def init(self, batch_size: int, max_steps: int):
        self._max_steps = max_steps
        cols = 11 if self.polarized else 4
        return dict(
            length=jnp.zeros(batch_size, jnp.int32),
            code=jnp.zeros(batch_size, jnp.int32),
            track=jnp.zeros((max_steps, batch_size, cols), jnp.float32),
        )

    def on_event(self, params, state, ray, code, mask, i, pol=None):
        record = mask & (code != int(EventResultCode.MAX_ITER))
        length = jnp.where(record, i, state["length"])
        new_code = jnp.where(record, code, state["code"])
        point = jnp.concatenate([ray.position, ray.time[..., None]], axis=-1)
        if self.polarized:
            n = point.shape[0]
            if pol is not None:
                stokes, pol_ref = pol
            else:
                stokes = jnp.concatenate(
                    [jnp.ones((n, 1), jnp.float32), jnp.zeros((n, 3), jnp.float32)],
                    axis=-1,
                )
                pol_ref = jnp.zeros((n, 3), jnp.float32)
            point = jnp.concatenate([point, stokes, pol_ref], axis=-1)
        i_arr = jnp.asarray(i, jnp.int32)

        def write(track):
            old = jax.lax.dynamic_index_in_dim(track, i_arr, axis=0, keepdims=False)
            new = jnp.where(record[..., None], point, old)
            return jax.lax.dynamic_update_index_in_dim(track, new, i_arr, axis=0)

        track = jax.lax.cond(
            i_arr < self._max_steps, write, lambda t: t, state["track"]
        )
        return dict(length=length, code=new_code, track=track)

    def result(self, params, state):
        return {
            "length": np.asarray(state["length"]),
            "code": np.asarray(state["code"]),
            "track": np.transpose(np.asarray(state["track"]), (1, 0, 2)),
        }
