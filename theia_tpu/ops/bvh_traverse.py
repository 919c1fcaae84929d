"""Stackless threaded-BVH traversal on the wavefront.

Per lane the traversal state is a single node index: on AABB hit continue
at node+1 (interior) or test the leaf's triangles and jump to the miss
link; on miss jump to the miss link; -1 terminates. All lanes advance in
lock-step inside a ``lax.while_loop`` — node data is fetched with gathers.

This replaces the reference's hardware ray-query traversal
(scene.intersect.glsl rayQueryEXT) with a software BVH suited to SIMD
wavefronts. On the current bench chip gathers are slow, so the default
accel path remains the brute-force scan (PERF.md); the BVH path is the
scaling story for large scenes and real TPU gather throughput.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["PackedBVH", "nearest_triangle_bvh", "pack_bvh"]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class PackedBVH:
    """Device-resident threaded BVH; ``leaf_size`` is static metadata so
    the traversal's leaf unroll stays a Python constant under jit."""

    bmin: jax.Array
    bmax: jax.Array
    miss: jax.Array
    start: jax.Array
    count: jax.Array
    tri_v0: jax.Array
    tri_e1: jax.Array
    tri_e2: jax.Array
    order: jax.Array
    leaf_size: int = field(metadata=dict(static=True))


def pack_bvh(bvh, w_v0, w_e1, w_e2, leaf_size: int) -> PackedBVH:
    """Device arrays for traversal: node table + triangles in leaf order."""
    import numpy as np

    order = bvh.order
    return PackedBVH(
        bmin=jnp.asarray(bvh.bmin),
        bmax=jnp.asarray(bvh.bmax),
        miss=jnp.asarray(bvh.miss),
        start=jnp.asarray(bvh.start),
        count=jnp.asarray(bvh.count),
        tri_v0=jnp.asarray(np.asarray(w_v0)[order]),
        tri_e1=jnp.asarray(np.asarray(w_e1)[order]),
        tri_e2=jnp.asarray(np.asarray(w_e2)[order]),
        order=jnp.asarray(order),
        leaf_size=leaf_size,
    )


def _ray_aabb(origin, inv_dir, bmin, bmax, t_max):
    """Slab test; returns hit mask (t in (0, t_max])."""
    t0 = (bmin - origin) * inv_dir
    t1 = (bmax - origin) * inv_dir
    tn = jnp.minimum(t0, t1).max(axis=-1)
    tf = jnp.maximum(t0, t1).min(axis=-1)
    return (tf >= jnp.maximum(tn, 0.0)) & (tn <= t_max)


def nearest_triangle_bvh(packed, origin, direction, t_max):
    """Nearest-hit query with the same contract as accel._nearest_triangle:
    returns (t, tri_idx, b1, b2), idx = -1 on miss (original triangle ids)."""
    n = origin.shape[0]
    leaf_size = packed.leaf_size
    inv_dir = 1.0 / jnp.where(jnp.abs(direction) > 1e-12, direction, 1e-12)

    t_best = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    idx_best = jnp.full((n,), -1, jnp.int32)
    node = jnp.zeros((n,), jnp.int32)

    tv0, te1, te2 = packed.tri_v0, packed.tri_e1, packed.tri_e2

    def tri_test(base, k, origin, direction, t_best, idx_best, active):
        tri = base + k
        v0 = jnp.take(tv0, tri, axis=0, mode="clip")
        e1 = jnp.take(te1, tri, axis=0, mode="clip")
        e2 = jnp.take(te2, tri, axis=0, mode="clip")
        px = direction[:, 1] * e2[:, 2] - direction[:, 2] * e2[:, 1]
        py = direction[:, 2] * e2[:, 0] - direction[:, 0] * e2[:, 2]
        pz = direction[:, 0] * e2[:, 1] - direction[:, 1] * e2[:, 0]
        det = e1[:, 0] * px + e1[:, 1] * py + e1[:, 2] * pz
        inv = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
        tx = origin[:, 0] - v0[:, 0]
        ty = origin[:, 1] - v0[:, 1]
        tz = origin[:, 2] - v0[:, 2]
        b1 = (tx * px + ty * py + tz * pz) * inv
        qx = ty * e1[:, 2] - tz * e1[:, 1]
        qy = tz * e1[:, 0] - tx * e1[:, 2]
        qz = tx * e1[:, 1] - ty * e1[:, 0]
        b2 = (direction[:, 0] * qx + direction[:, 1] * qy + direction[:, 2] * qz) * inv
        t = (e2[:, 0] * qx + e2[:, 1] * qy + e2[:, 2] * qz) * inv
        # shared-edge tolerance matching accel._nearest_triangle
        hit = (
            active
            & (inv != 0.0)
            & (b1 >= -1e-6)
            & (b2 >= -1e-6)
            & (b1 + b2 <= 1.0 + 1e-6)
            & (t > 0.0)
            & (t < t_best)
        )
        idx_best = jnp.where(hit, tri, idx_best)
        t_best = jnp.where(hit, t, t_best)
        return t_best, idx_best

    def cond(carry):
        node, _, _ = carry
        return jnp.any(node >= 0)

    def body(carry):
        node, t_best, idx_best = carry
        live = node >= 0
        safe = jnp.maximum(node, 0)
        bmin = jnp.take(packed.bmin, safe, axis=0)
        bmax = jnp.take(packed.bmax, safe, axis=0)
        miss = jnp.take(packed.miss, safe)
        start = jnp.take(packed.start, safe)
        count = jnp.take(packed.count, safe)
        hit = live & _ray_aabb(origin, inv_dir, bmin, bmax, t_best)
        is_leaf = start >= 0

        # leaf: test up to leaf_size triangles (static unroll)
        leaf_active = hit & is_leaf
        for k in range(leaf_size):
            t_best, idx_best = tri_test(
                start, k, origin, direction, t_best, idx_best,
                leaf_active & (k < count),
            )

        next_node = jnp.where(hit & ~is_leaf, node + 1, miss)
        next_node = jnp.where(live, next_node, node)
        return next_node, t_best, idx_best

    node, t_best, idx_best = lax.while_loop(
        cond, body, (node, t_best, idx_best)
    )

    # recompute barycentrics for the winner and map back to original ids
    found = idx_best >= 0
    safe = jnp.maximum(idx_best, 0)
    v0 = jnp.take(tv0, safe, axis=0)
    e1 = jnp.take(te1, safe, axis=0)
    e2 = jnp.take(te2, safe, axis=0)
    px = direction[:, 1] * e2[:, 2] - direction[:, 2] * e2[:, 1]
    py = direction[:, 2] * e2[:, 0] - direction[:, 0] * e2[:, 2]
    pz = direction[:, 0] * e2[:, 1] - direction[:, 1] * e2[:, 0]
    det = e1[:, 0] * px + e1[:, 1] * py + e1[:, 2] * pz
    inv = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tx = origin[:, 0] - v0[:, 0]
    ty = origin[:, 1] - v0[:, 1]
    tz = origin[:, 2] - v0[:, 2]
    b1 = (tx * px + ty * py + tz * pz) * inv
    qx = ty * e1[:, 2] - tz * e1[:, 1]
    qy = tz * e1[:, 0] - tx * e1[:, 2]
    qz = tx * e1[:, 1] - ty * e1[:, 0]
    b2 = (direction[:, 0] * qx + direction[:, 1] * qy + direction[:, 2] * qz) * inv
    t = (e2[:, 0] * qx + e2[:, 1] * qy + e2[:, 2] * qz) * inv
    orig = jnp.where(found, jnp.take(packed.order, safe), -1)
    return jnp.where(found, t, jnp.inf), orig, b1, b2
