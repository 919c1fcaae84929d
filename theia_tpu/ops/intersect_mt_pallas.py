"""Pallas VPU kernel: Moeller-Trumbore scan with per-tile AABB culling.

Same contract and tiling skeleton as :mod:`intersect_woop` but the
per-pair test runs entirely on the VPU in f32 — the same Moeller-Trumbore
formulation as ``accel._nearest_triangle``, except 1/det and t use the
hardware reciprocal plus one Newton step (~1e-7 relative error), so
winners whose distances differ by less than that may pick a different
(equally valid) triangle than the XLA scan; the cross-backend tests
compare with matching tolerances. Triangle components are laid
out as (T_tiles, 9, BT) rows so each tile's operands broadcast from
(1, BT) against per-ray (BN, 1) columns.

Rationale: the XLA scan reaches ~25 Gtest/s (~29 % of VPU peak); Mosaic
can strip-mine the same arithmetic with tighter code, and the tile loop
adds block-level AABB skipping that activates once rays are sorted.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._intersect_tiles import (
    BIN_THRESHOLD,
    block_slab_hit,
    check_vmem_budget,
    pack_rays,
    rcp,
    run_binned,
    safe,
    scene_bounds,
    select_winner,
    tile_aabbs,
)

__all__ = ["MTPack", "pack_mt", "nearest_triangle_mt"]

BN = 256  # rays per grid step (round-3 sweep: 256-1024 within noise)
BT = 512  # triangles per tile for big scenes (AABB culling regime)
#: small scenes skip meaningful culling; wider tiles amortize the loop
#: (round-3 sweep on 3840 tris: bt=2048 48.8 vs bt=512 33.0 Gtest/s)
SMALL_SCENE_BT = 2048
SMALL_SCENE_MAX_TRI = 4 * SMALL_SCENE_BT


class MTPack:
    def __init__(self, tri, aabb, lo, hi, n_tri):
        self.tri = tri  # f32 (T_tiles, 9, BT): v0xyz, e1xyz, e2xyz rows
        self.aabb = aabb  # f32 (T_tiles, 8)
        self.lo = lo  # f32 (3,) tight scene bounds (position cell keys)
        self.hi = hi
        self.n_tri = n_tri


jax.tree_util.register_pytree_node(
    MTPack,
    lambda p: ((p.tri, p.aabb, p.lo, p.hi), p.n_tri),
    lambda n_tri, leaves: MTPack(*leaves, n_tri),
)


def pack_mt(
    v0: np.ndarray, e1: np.ndarray, e2: np.ndarray, bt: int | None = None
) -> MTPack:
    """Triangles must already be Morton-ordered; padding is unhittable."""
    if bt is None:
        bt = SMALL_SCENE_BT if v0.shape[0] <= SMALL_SCENE_MAX_TRI else BT
    BT = bt
    v0 = np.asarray(v0, np.float32)
    e1 = np.asarray(e1, np.float32)
    e2 = np.asarray(e2, np.float32)
    n_tri = v0.shape[0]
    n_tiles = max(1, -(-n_tri // BT))
    t_pad = n_tiles * BT
    if t_pad != n_tri:
        v0 = np.concatenate([v0, np.full((t_pad - n_tri, 3), 3e38, np.float32)])
        e1 = np.concatenate([e1, np.zeros((t_pad - n_tri, 3), np.float32)])
        e2 = np.concatenate([e2, np.zeros((t_pad - n_tri, 3), np.float32)])

    tri = np.zeros((n_tiles, 9, BT), np.float32)
    for c in range(3):
        tri[:, c, :] = v0[:, c].reshape(n_tiles, BT)
        tri[:, 3 + c, :] = e1[:, c].reshape(n_tiles, BT)
        tri[:, 6 + c, :] = e2[:, c].reshape(n_tiles, BT)

    check_vmem_budget("pallas", n_tri, tri.nbytes)
    aabb = tile_aabbs(v0, e1, e2, n_tri, n_tiles, BT)
    lo, hi = scene_bounds(v0, e1, e2, n_tri)
    return MTPack(
        jnp.asarray(tri), jnp.asarray(aabb), jnp.asarray(lo), jnp.asarray(hi), n_tri
    )


def _kernel(x_ref, tmax_ref, tri_ref, aabb_ref, t_out, idx_out, t_sc, i_sc):
    n_tiles = tri_ref.shape[0]

    ox = x_ref[:, 0:1]
    oy = x_ref[:, 1:2]
    oz = x_ref[:, 2:3]
    dx = x_ref[:, 4:5]
    dy = x_ref[:, 5:6]
    dz = x_ref[:, 6:7]
    inv = (rcp(safe(dx)), rcp(safe(dy)), rcp(safe(dz)))

    t_sc[:] = tmax_ref[:]
    i_sc[:] = jnp.full(i_sc.shape, -1, jnp.int32)

    def tile(k, _):
        @pl.when(block_slab_hit(aabb_ref, k, (ox, oy, oz), inv, t_sc[:]))
        def _():
            v0x = tri_ref[k, 0:1, :]
            v0y = tri_ref[k, 1:2, :]
            v0z = tri_ref[k, 2:3, :]
            e1x = tri_ref[k, 3:4, :]
            e1y = tri_ref[k, 4:5, :]
            e1z = tri_ref[k, 5:6, :]
            e2x = tri_ref[k, 6:7, :]
            e2y = tri_ref[k, 7:8, :]
            e2z = tri_ref[k, 8:9, :]
            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det = e1x * px + e1y * py + e1z * pz
            inv = jnp.where(jnp.abs(det) > 1e-12, rcp(safe(det)), 0.0)
            tx = ox - v0x
            ty = oy - v0y
            tz = oz - v0z
            b1 = (tx * px + ty * py + tz * pz) * inv
            qx = ty * e1z - tz * e1y
            qy = tz * e1x - tx * e1z
            qz = tx * e1y - ty * e1x
            b2 = (dx * qx + dy * qy + dz * qz) * inv
            t = (e2x * qx + e2y * qy + e2z * qz) * inv
            hit = (
                (inv != 0.0)
                & (b1 >= -1e-6)
                & (b2 >= -1e-6)
                & (b1 + b2 <= 1.0 + 1e-6)
                & (t > 0.0)
            )
            select_winner(
                jnp.where(hit, t, jnp.inf), k, tri_ref.shape[2], t_sc, i_sc
            )

        return 0

    jax.lax.fori_loop(0, n_tiles, tile, 0)
    t_out[:] = t_sc[:]
    idx_out[:] = i_sc[:]


@functools.partial(jax.jit, static_argnames=("n_tri", "bn", "interpret"))
def _call(x, tmax, tri, aabb, n_tri, bn=BN, interpret=False):
    n_pad = x.shape[0]
    t, idx = pl.pallas_call(
        _kernel,
        grid=(n_pad // bn,),
        in_specs=[
            pl.BlockSpec((bn, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                tri.shape,
                lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (aabb.shape[0], 8), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec((bn, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bn, 1), jnp.float32),
            pltpu.VMEM((bn, 1), jnp.int32),
        ],
        interpret=interpret,
    )(x, tmax, tri, aabb)
    t = t[:, 0]
    idx = idx[:, 0]
    idx = jnp.where(idx >= n_tri, -1, idx)
    return jnp.where(idx < 0, jnp.inf, t), idx


def nearest_triangle_mt(
    pack: MTPack,
    origin,
    direction,
    t_max,
    *,
    interpret: bool | None = None,
    binned: bool | None = None,
    bn: int = BN,
):
    """Nearest-hit query: returns (t, tri_idx); t=inf / idx=-1 on miss.

    ``binned`` sorts the wavefront by direction octant and position cell
    before the kernel and scatters results back — results are
    bit-identical either way (the winner reduction is order-free within
    a lane), only the block coherence changes. Default: bin when the
    scene is big enough that tile culling outweighs the sort
    (BIN_THRESHOLD, measured in PERF.md 'ray binning')."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if binned is None:
        binned = pack.n_tri >= BIN_THRESHOLD

    def query(o, d, tm):
        x, tmax, n = pack_rays(o, d, tm, bn)
        t, idx = _call(
            x, tmax, pack.tri, pack.aabb, pack.n_tri, bn, interpret
        )
        return t[:n], idx[:n]

    if binned:
        return run_binned(query, pack.lo, pack.hi, origin, direction, t_max)
    return query(origin, direction, t_max)
