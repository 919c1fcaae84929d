"""Pallas TPU kernel for wavefront ray/triangle-soup intersection.

The XLA-generated brute-force loop is HBM-bound (measured ~0.15 TFLOP/s:
the (N, T) elementwise chain materializes intermediates). This kernel keeps
the triangle table resident in VMEM and streams ray tiles through it,
accumulating the running nearest hit on-chip — one HBM pass for the rays,
compute-bound on the VPU.

Geometry (dictated by TPU tiling rules):
* rays are component-major (8, N/8) arrays; each grid program takes an
  (8, LANE_TILE) block = 8 rows x LANE_TILE rays on the vector lanes
* triangles are a (T_pad, 9) table; a tile is (TRI_TILE, 1) on sublanes
* the working set per (row, tile) is (TRI_TILE, LANE_TILE) with the min
  reduction over sublanes

Contract: returns (t, tri_idx) with t=inf / idx=-1 on miss.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["nearest_triangle_pallas", "pack_triangles"]

LANE_TILE = 512
TRI_TILE = 256
ROWS = 8


def _kernel(
    ox_ref, oy_ref, oz_ref,
    dx_ref, dy_ref, dz_ref,
    tmax_ref,
    tri_ref,  # (T_pad, 9): columns [v0x v0y v0z e1x e1y e1z e2x e2y e2z]
    t_out, idx_out,
    *,
    n_tri_tiles: int,
):
    for r in range(ROWS):
        ox = ox_ref[r : r + 1, :]
        oy = oy_ref[r : r + 1, :]
        oz = oz_ref[r : r + 1, :]
        dx = dx_ref[r : r + 1, :]
        dy = dy_ref[r : r + 1, :]
        dz = dz_ref[r : r + 1, :]
        t_best0 = tmax_ref[r : r + 1, :]
        idx_best0 = jnp.full_like(t_best0, -1.0)

        def tile_body(k, carry):
            t_best, idx_best = carry
            sl = pl.ds(k * TRI_TILE, TRI_TILE)
            v0x = tri_ref[sl, 0:1]
            v0y = tri_ref[sl, 1:2]
            v0z = tri_ref[sl, 2:3]
            e1x = tri_ref[sl, 3:4]
            e1y = tri_ref[sl, 4:5]
            e1z = tri_ref[sl, 5:6]
            e2x = tri_ref[sl, 6:7]
            e2y = tri_ref[sl, 7:8]
            e2z = tri_ref[sl, 8:9]

            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det = e1x * px + e1y * py + e1z * pz
            inv = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
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
                & (b1 >= 0.0)
                & (b2 >= 0.0)
                & (b1 + b2 <= 1.0)
                & (t > 0.0)
            )
            t = jnp.where(hit, t, jnp.inf)
            tt = jnp.min(t, axis=0, keepdims=True)
            local = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0).astype(
                jnp.float32
            )
            idx_c = jnp.min(
                jnp.where(t == tt, local, jnp.float32(3e38)),
                axis=0,
                keepdims=True,
            )
            better = tt < t_best
            idx_best = jnp.where(
                better, idx_c + jnp.float32(k * TRI_TILE), idx_best
            )
            t_best = jnp.where(better, tt, t_best)
            return t_best, idx_best

        t_best, idx_best = jax.lax.fori_loop(
            0, n_tri_tiles, tile_body, (t_best0, idx_best0)
        )
        t_out[r : r + 1, :] = t_best
        idx_out[r : r + 1, :] = idx_best.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("n_tri",))
def _call(ox, oy, oz, dx, dy, dz, tmax, tri, n_tri):
    m = ox.shape[1]
    t_pad = tri.shape[0]
    kernel = functools.partial(_kernel, n_tri_tiles=t_pad // TRI_TILE)
    ray_spec = pl.BlockSpec(
        (ROWS, LANE_TILE), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    t, idx = pl.pallas_call(
        kernel,
        grid=(m // LANE_TILE,),
        in_specs=[ray_spec] * 7
        + [
            pl.BlockSpec(
                (t_pad, 9), lambda i: (0, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=[ray_spec, ray_spec],
        out_shape=[
            jax.ShapeDtypeStruct((ROWS, m), jnp.float32),
            jax.ShapeDtypeStruct((ROWS, m), jnp.int32),
        ],
    )(ox, oy, oz, dx, dy, dz, tmax, tri)
    idx = jnp.where(idx >= n_tri, -1, idx)
    return jnp.where(idx < 0, jnp.inf, t), idx


def pack_triangles(w_v0, w_e1, w_e2) -> jax.Array:
    """(T,3) x3 -> (T_pad, 9) table; padded triangles are degenerate
    (e1=e2=0) and can never be hit."""
    t = w_v0.shape[0]
    t_pad = -(-t // TRI_TILE) * TRI_TILE
    table = jnp.concatenate(
        [jnp.asarray(w_v0), jnp.asarray(w_e1), jnp.asarray(w_e2)], axis=1
    )
    pad_row = jnp.asarray([3e38, 3e38, 3e38, 0, 0, 0, 0, 0, 0], jnp.float32)
    pad = jnp.broadcast_to(pad_row, (t_pad - t, 9))
    return jnp.concatenate([table, pad], axis=0)


def nearest_triangle_pallas(tri_table, n_tri, origin, direction, t_max):
    """Nearest-hit query. ``tri_table``: (T_pad, 9) from :func:`pack_triangles`."""
    n = origin.shape[0]
    group = ROWS * LANE_TILE
    n_pad = -(-n // group) * group
    pad = n_pad - n

    def comp(a, i, fill=0.0):
        c = a[:, i]
        if pad:
            c = jnp.pad(c, (0, pad), constant_values=fill)
        return c.reshape(ROWS, -1)

    tmax = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    if pad:
        tmax = jnp.pad(tmax, (0, pad))
    tmax = tmax.reshape(ROWS, -1)
    t, idx = _call(
        comp(origin, 0), comp(origin, 1), comp(origin, 2),
        comp(direction, 0), comp(direction, 1), comp(direction, 2, fill=1.0),
        tmax, tri_table, n_tri,
    )
    t = t.reshape(-1)[:n]
    idx = idx.reshape(-1)[:n]
    return t, idx
