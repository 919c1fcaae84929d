"""MXU-based ray/triangle intersection (Woop unit-triangle transform).

Replaces the VPU-bound Moeller-Trumbore scan for the nearest-hit query
(reference semantics: src/theia/shader/scene.intersect.glsl:23-99 via
hardware ray queries). Per triangle a world->unit-triangle affine ``M``
is precomputed on the host (f64, cast f32) such that for a point ``p``::

    (b1, b2, z) = M[:, :3] @ p + M[:, 3]

with ``z = 0`` on the triangle's plane. For a ray ``o + t d`` this turns
intersection into six dot products — evaluated as ONE matmul per
(ray-block, triangle-tile): ``[o,1,d,0] (BN,8) @ B (8, 6*BT)`` — putting
the bulk of the arithmetic on the MXU, followed by a short VPU epilogue::

    t  = -o'_z / d'_z
    b1 = o'_x + t d'_x,  b2 = o'_y + t d'_y
    hit iff t > 0, b1 >= -eps, b2 >= -eps, b1 + b2 <= 1 + eps

Triangles are Morton-ordered at pack time so each 512-triangle tile has a
tight AABB; a per-(ray-block, tile) slab test skips whole tiles when no
ray in the block can hit them (effective once rays are coherent/binned,
nearly free otherwise). The triangle table stays resident in VMEM across
the ray-block grid.

The winning triangle's barycentrics are NOT returned; callers recompute
them exactly for the single winner (inline in ``accel.intersect_scene``).
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

__all__ = ["WoopPack", "pack_woop", "morton_order", "nearest_triangle_woop"]

BN = 256  # rays per grid step
BT = 512  # triangles per tile
_EPS = 1e-6  # watertightness margin, matches the brute-force scan


class WoopPack:
    """Device tables for the Woop kernel (triangle count is static)."""

    def __init__(self, b, aabb, lo, hi, n_tri):
        self.b = b  # f32 (T_tiles, 8, 6*BT)
        self.aabb = aabb  # f32 (T_tiles, 8): lo xyz, pad, hi xyz, pad
        self.lo = lo  # f32 (3,) tight scene bounds (binning cell keys)
        self.hi = hi
        self.n_tri = n_tri


# pytree with n_tri static so jit can specialize on the triangle count
jax.tree_util.register_pytree_node(
    WoopPack,
    lambda p: ((p.b, p.aabb, p.lo, p.hi), p.n_tri),
    lambda n_tri, leaves: WoopPack(*leaves, n_tri),
)


def morton_order(v0: np.ndarray, e1: np.ndarray, e2: np.ndarray) -> np.ndarray:
    """Permutation sorting triangles along a 3D Morton curve of their
    centroids — gives spatially tight per-tile AABBs for culling."""
    c = v0 + (e1 + e2) / 3.0
    lo, hi = c.min(0), c.max(0)
    ext = np.maximum(hi - lo, 1e-12)
    q = np.clip(((c - lo) / ext * 1023.0).astype(np.uint64), 0, 1023)

    def spread(x):
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    code = (spread(q[:, 0]) << 2) | (spread(q[:, 1]) << 1) | spread(q[:, 2])
    return np.argsort(code, kind="stable")


def pack_woop(v0: np.ndarray, e1: np.ndarray, e2: np.ndarray) -> WoopPack:
    """Build the (8, 6*BT)-tiled transform table + per-tile AABBs.

    Triangles must already be in their final (e.g. Morton) order; padded
    slots are unhittable (o' huge, d' = 0)."""
    v0 = np.asarray(v0, np.float64)
    e1 = np.asarray(e1, np.float64)
    e2 = np.asarray(e2, np.float64)
    n_tri = v0.shape[0]
    n_tiles = max(1, -(-n_tri // BT))
    t_pad = n_tiles * BT

    n = np.cross(e1, e2)
    # M_lin = inv([e1 e2 n]) (columns); rows give (b1, b2, z) coordinates
    a = np.stack([e1, e2, n], axis=-1)  # (T, 3, 3)
    det = np.linalg.det(a)
    bad = np.abs(det) < 1e-30
    a[bad] = np.eye(3)
    m_lin = np.linalg.inv(a)  # (T, 3, 3)
    m_off = -np.einsum("tij,tj->ti", m_lin, v0)  # (T, 3)
    # unhittable padding / degenerate triangles
    m_lin[bad] = 0.0
    m_off[bad] = np.array([3e38, 3e38, 3e38])

    if t_pad != n_tri:
        pad_lin = np.zeros((t_pad - n_tri, 3, 3))
        pad_off = np.full((t_pad - n_tri, 3), 3e38)
        m_lin = np.concatenate([m_lin, pad_lin], axis=0)
        m_off = np.concatenate([m_off, pad_off], axis=0)

    # B columns per tile: [b1(o') | b2(o') | z(o') | b1(d') | b2(d') | z(d')]
    # X rows: [ox oy oz 1 dx dy dz 0]
    b = np.zeros((n_tiles, 8, 6 * BT), np.float32)
    lin = m_lin.astype(np.float32).reshape(n_tiles, BT, 3, 3)
    off = m_off.astype(np.float32).reshape(n_tiles, BT, 3)
    for c in range(3):  # output component (b1, b2, z)
        # o' part: rows 0..2 = M[c,:], row 3 = offset
        b[:, 0:3, c * BT : (c + 1) * BT] = np.swapaxes(lin[:, :, c, :], 1, 2)
        b[:, 3, c * BT : (c + 1) * BT] = off[:, :, c]
        # d' part: rows 4..6 = M[c,:]
        b[:, 4:7, (3 + c) * BT : (4 + c) * BT] = np.swapaxes(
            lin[:, :, c, :], 1, 2
        )

    check_vmem_budget("woop", n_tri, b.nbytes)
    aabb = tile_aabbs(v0, e1, e2, n_tri, n_tiles, BT)
    lo, hi = scene_bounds(v0, e1, e2, n_tri)
    return WoopPack(
        jnp.asarray(b), jnp.asarray(aabb), jnp.asarray(lo), jnp.asarray(hi), n_tri
    )


def _kernel(
    x_ref, tmax_ref, b_ref, aabb_ref, t_out, idx_out, t_sc, i_sc,
    *, precision
):
    n_tiles = b_ref.shape[0]

    o = (x_ref[:, 0:1], x_ref[:, 1:2], x_ref[:, 2:3])
    inv = tuple(rcp(safe(x_ref[:, 4 + c : 5 + c])) for c in range(3))

    t_sc[:] = tmax_ref[:]
    i_sc[:] = jnp.full(i_sc.shape, -1, jnp.int32)

    def tile(k, _):
        @pl.when(block_slab_hit(aabb_ref, k, o, inv, t_sc[:]))
        def _():
            y = jax.lax.dot_general(
                x_ref[:],
                b_ref[k],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )
            o1 = y[:, 0 * BT : 1 * BT]
            o2 = y[:, 1 * BT : 2 * BT]
            o3 = y[:, 2 * BT : 3 * BT]
            d1 = y[:, 3 * BT : 4 * BT]
            d2 = y[:, 4 * BT : 5 * BT]
            d3 = y[:, 5 * BT : 6 * BT]
            t = -o3 * rcp(d3)
            b1 = o1 + t * d1
            b2 = o2 + t * d2
            hit = (
                (t > 0.0)
                & (b1 >= -_EPS)
                & (b2 >= -_EPS)
                & (b1 + b2 <= 1.0 + _EPS)
            )
            select_winner(jnp.where(hit, t, jnp.inf), k, BT, t_sc, i_sc)

        return 0

    jax.lax.fori_loop(0, n_tiles, tile, 0)
    t_out[:] = t_sc[:]
    idx_out[:] = i_sc[:]


@functools.partial(
    jax.jit, static_argnames=("n_tri", "interpret", "precision")
)
def _call(x, tmax, b, aabb, n_tri, interpret=False, precision="highest"):
    n_pad = x.shape[0]
    kernel = functools.partial(
        _kernel, precision=jax.lax.Precision(precision)
    )
    t, idx = pl.pallas_call(
        kernel,
        grid=(n_pad // BN,),
        in_specs=[
            pl.BlockSpec((BN, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (b.shape[0], 8, 6 * BT),
                lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (aabb.shape[0], 8), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec((BN, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((BN, 1), jnp.float32),
            pltpu.VMEM((BN, 1), jnp.int32),
        ],
        interpret=interpret,
    )(x, tmax, b, aabb)
    t = t[:, 0]
    idx = idx[:, 0]
    idx = jnp.where(idx >= n_tri, -1, idx)
    return jnp.where(idx < 0, jnp.inf, t), idx


def nearest_triangle_woop(
    pack: WoopPack,
    origin,
    direction,
    t_max,
    *,
    interpret: bool | None = None,
    precision: str = "highest",
    binned: bool | None = None,
):
    """Nearest-hit query: returns (t, tri_idx); t=inf / idx=-1 on miss.

    ``precision``: matmul precision for the transform dot. "highest"
    (bf16x6, f32-exact) is the default; "high" (bf16x3, ~2^-16 relative)
    is ~2x faster on the MXU and still well inside the kernel's
    watertightness margins for scenes at unit scale.
    ``binned``: octant/cell wavefront sort activating the tile culling
    (see nearest_triangle_mt); defaults on above BIN_THRESHOLD."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if binned is None:
        binned = pack.n_tri >= BIN_THRESHOLD

    def query(o, d, tm):
        x, tmax, n = pack_rays(o, d, tm, BN)
        t, idx = _call(
            x, tmax, pack.b, pack.aabb, pack.n_tri, interpret, precision
        )
        return t[:n], idx[:n]

    if binned:
        return run_binned(query, pack.lo, pack.hi, origin, direction, t_max)
    return query(origin, direction, t_max)
