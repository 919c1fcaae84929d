"""Shared tile-scan helpers for the Pallas intersection kernels.

Both :mod:`intersect_woop` (MXU transform kernel) and
:mod:`intersect_mt_pallas` (VPU Moeller-Trumbore kernel) use the same
skeleton: Morton-ordered triangles in BT-wide tiles with per-tile AABBs,
a per-(ray-block, tile) slab test that skips tiles no ray can hit, and a
min/iota winner reduction into VMEM scratch. The per-pair test is the
only part that differs; everything else lives here so a fix applies to
both kernels at once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

__all__ = [
    "rcp",
    "safe",
    "tile_aabbs",
    "block_slab_hit",
    "select_winner",
    "pack_rays",
    "check_vmem_budget",
]

#: Pallas maps the whole triangle table into VMEM (it stays resident
#: across the ray-block grid); beyond this budget the kernel would die
#: deep inside Mosaic with an opaque allocation error, so pack time
#: checks first. ~12 MiB leaves room for ray blocks + scratch in a
#: 16 MiB/core VMEM.
VMEM_TABLE_BUDGET = 12 * 2**20


def rcp(v):
    """Approx reciprocal + one Newton step: ~1e-7 relative error."""
    r = pl.reciprocal(v, approx=True)
    return r * (2.0 - v * r)


def safe(v):
    """Slab-test reciprocals must stay finite: 0*inf = nan would leak
    into the min/max chain and could falsely cull a tile. The clamp
    preserves the component's sign — flipping it would invert the slab
    interval and falsely cull."""
    return jnp.where(
        jnp.abs(v) < 1e-20, jnp.where(v < 0.0, -1e-20, 1e-20), v
    )


def tile_aabbs(v0, e1, e2, n_tri: int, n_tiles: int, bt: int) -> np.ndarray:
    """(n_tiles, 8) per-tile AABBs (lo xyz, pad, hi xyz, pad) over the
    real triangles only; tiles that are entirely padding get an inverted
    box which :func:`block_slab_hit` rejects outright."""
    aabb = np.zeros((n_tiles, 8), np.float32)
    pts = np.concatenate(
        [v0[:n_tri], v0[:n_tri] + e1[:n_tri], v0[:n_tri] + e2[:n_tri]], axis=0
    )
    for k in range(n_tiles):
        s = slice(k * bt, min((k + 1) * bt, n_tri))
        if s.start >= n_tri:  # tile entirely padding
            aabb[k, 0:3] = 1.0
            aabb[k, 4:7] = -1.0  # inverted -> rejected by the lo<=hi guard
            continue
        p = np.concatenate(
            [pts[s], pts[n_tri:][s], pts[2 * n_tri:][s]], axis=0
        )
        # conservative rounding: float64 inputs round toward the outside
        # of the box so the f32 AABB always contains the true extent
        # (round-to-nearest could shrink it by half an ulp and cull a
        # grazing hit)
        lo = p.min(0)
        hi = p.max(0)
        lo32 = lo.astype(np.float32)
        hi32 = hi.astype(np.float32)
        lo32 = np.where(lo32 > lo, np.nextafter(lo32, -np.inf), lo32)
        hi32 = np.where(hi32 < hi, np.nextafter(hi32, np.inf), hi32)
        aabb[k, 0:3] = lo32
        aabb[k, 4:7] = hi32
    return aabb


def block_slab_hit(aabb_ref, k, o, inv, t_near_max):
    """Can any ray in the block hit tile ``k``'s AABB within ``t_near_max``?

    ``o = (ox, oy, oz)``, ``inv = (1/dx, 1/dy, 1/dz)`` are (BN, 1) columns;
    ``t_near_max`` the per-ray upper bound (current winner distance).
    An inverted box (lo > hi, the all-padding marker) is rejected by an
    explicit guard — the min/max slab arithmetic alone would treat it as
    its normalized hull, not as empty.
    """
    lox = aabb_ref[k, 0]
    loy = aabb_ref[k, 1]
    loz = aabb_ref[k, 2]
    hix = aabb_ref[k, 4]
    hiy = aabb_ref[k, 5]
    hiz = aabb_ref[k, 6]
    ox, oy, oz = o
    idx_, idy_, idz_ = inv
    t1x = (lox - ox) * idx_
    t2x = (hix - ox) * idx_
    t1y = (loy - oy) * idy_
    t2y = (hiy - oy) * idy_
    t1z = (loz - oz) * idz_
    t2z = (hiz - oz) * idz_
    tn = jnp.maximum(
        jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
        jnp.maximum(jnp.minimum(t1z, t2z), 0.0),
    )
    tf = jnp.minimum(
        jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
        jnp.minimum(jnp.maximum(t1z, t2z), t_near_max),
    )
    return jnp.any(tn <= tf) & (lox <= hix)


def select_winner(th, k, bt, t_sc, i_sc):
    """Fold tile ``k``'s per-pair hit distances ``th`` (BN, BT; inf = miss)
    into the running (t_sc, i_sc) scratch, preferring the lowest triangle
    index on ties (matches the sequential-scan semantics)."""
    tt = jnp.min(th, axis=1, keepdims=True)
    local = jax.lax.broadcasted_iota(jnp.int32, th.shape, 1)
    ic = jnp.min(
        jnp.where(th <= tt, local, jnp.int32(0x7FFFFFFF)),
        axis=1,
        keepdims=True,
    )
    better = tt < t_sc[:]
    i_sc[:] = jnp.where(better, ic + k * bt, i_sc[:])
    t_sc[:] = jnp.where(better, tt, t_sc[:])


def pack_rays(origin, direction, t_max, bn: int):
    """Pad rays to a multiple of ``bn`` and pack the kernel's (N, 8)
    ``[o, 1, d, 0]`` operand; returns (x, tmax, n)."""
    n = origin.shape[0]
    n_pad = max(bn, -(-n // bn) * bn)
    pad = n_pad - n
    one = jnp.ones((n, 1), jnp.float32)
    zero = jnp.zeros((n, 1), jnp.float32)
    x = jnp.concatenate([origin, one, direction, zero], axis=1)
    tmax = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,)).reshape(n, 1)
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
        tmax = jnp.pad(tmax, ((0, pad), (0, 0)))
    return x, tmax, n


def check_vmem_budget(kind: str, n_tri: int, table_bytes: int) -> None:
    """Fail at pack time, with an actionable message, instead of deep
    inside Mosaic when the resident triangle table cannot fit VMEM."""
    if table_bytes > VMEM_TABLE_BUDGET:
        raise ValueError(
            f"accel={kind!r} keeps the whole triangle table resident in "
            f"VMEM but {n_tri} triangles need {table_bytes / 2**20:.1f} MiB "
            f"(> {VMEM_TABLE_BUDGET / 2**20:.0f} MiB budget). Use "
            "accel='brute' or accel='bvh' for scenes this large."
        )


def scene_bounds(v0, e1, e2, n_tri: int):
    """Tight (lo, hi) bounds over the real triangles (numpy, pack time)."""
    pts = np.concatenate(
        [v0[:n_tri], v0[:n_tri] + e1[:n_tri], v0[:n_tri] + e2[:n_tri]]
    )
    return pts.min(0), pts.max(0)


#: position cells per axis for the binning sort key
BIN_CELLS = 4

#: triangle count above which binning pays for its argsort (measured:
#: binned loses at 1.3k tris, wins from ~10k up — PERF.md 'ray binning')
BIN_THRESHOLD = 8192


def octant_cell_key(lo, hi, origin, direction):
    """Sort key grouping coherent rays: direction octant (3 bits), then
    position cell on a per-axis grid over the scene bounds — rays in one
    kernel block then share tight frusta and the per-tile AABB culling
    fires (measured 2.3x vs the unsorted scan at 82k tris)."""
    oct_ = (
        (direction[:, 0] >= 0).astype(jnp.int32) * 4
        + (direction[:, 1] >= 0).astype(jnp.int32) * 2
        + (direction[:, 2] >= 0).astype(jnp.int32)
    )
    span = jnp.maximum(hi - lo, 1e-6)
    q = jnp.clip(
        ((origin - lo) / span * BIN_CELLS).astype(jnp.int32), 0, BIN_CELLS - 1
    )
    cell = (q[:, 0] * BIN_CELLS + q[:, 1]) * BIN_CELLS + q[:, 2]
    return oct_ * BIN_CELLS**3 + cell


def run_binned(query, lo, hi, origin, direction, t_max):
    """Sort the wavefront by :func:`octant_cell_key`, run ``query(o, d,
    t_max) -> (t, idx)`` on the coherent order, scatter results back.
    Bit-identical to the unsorted query (per-lane reductions are
    order-free); only the block coherence changes."""
    n = origin.shape[0]
    order = jnp.argsort(octant_cell_key(lo, hi, origin, direction))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    t, idx = query(origin[order], direction[order], t_max[order])
    # scatter straight back to lane order (cheaper than building an
    # explicit inverse permutation and gathering through it)
    return (
        jnp.zeros_like(t).at[order].set(t),
        jnp.zeros_like(idx).at[order].set(idx),
    )
