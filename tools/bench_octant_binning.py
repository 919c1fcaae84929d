"""Ray binning by direction octant (SURVEY §7 hard part): measure it.

The Pallas MT kernel culls whole 512-triangle tiles per 512-ray block
via a block AABB slab test — which only fires when the rays in a block
are coherent. This tool sorts a random wavefront by direction octant
(and optionally by position cell within the octant), runs the kernel on
the sorted wavefront, scatters results back, and compares against the
unsorted kernel and the brute scan, sort cost included.

Usage: python tools/bench_octant_binning.py [--rays 196608] [--side 4]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench_bvh_crossover import build_array_scene  # noqa: E402

from theia_tpu.ops._intersect_tiles import octant_cell_key  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=3 * 65536)
    ap.add_argument("--side", type=int, default=4)
    args = ap.parse_args()

    from theia_tpu.accel import _nearest_triangle
    from theia_tpu.ops.intersect_mt_pallas import nearest_triangle_mt, pack_mt
    from theia_tpu.ops.intersect_woop import morton_order

    scene, extent = build_array_scene(args.side, "brute")
    pack = scene.pack
    v0 = np.asarray(pack.w_v0)
    e1 = np.asarray(pack.w_e1)
    e2 = np.asarray(pack.w_e2)
    perm = morton_order(v0, e1, e2)
    mtp = pack_mt(v0[perm], e1[perm], e2[perm])
    n_tri = len(v0)
    lo = jnp.asarray([-1.0, -1.0, -1.0])
    hi = jnp.asarray([extent, extent, extent])

    N = args.rays
    tmax = 1e4

    @jax.jit
    def brute(o, d):
        t, i = _nearest_triangle(pack, o, d, tmax, 256)
        return jnp.where(jnp.isfinite(t), t, 0.0).sum() + i.sum()

    @jax.jit
    def mt_unsorted(o, d):
        t, i = nearest_triangle_mt(mtp, o, d, tmax, binned=False)
        return jnp.where(jnp.isfinite(t), t, 0.0).sum() + i.sum()

    @jax.jit
    def mt_sorted(o, d):
        t, i = nearest_triangle_mt(mtp, o, d, tmax, binned=True)
        return jnp.where(jnp.isfinite(t), t, 0.0).sum() + i.sum()

    @jax.jit
    def sort_only(o, d):
        order = jnp.argsort(octant_cell_key(lo, hi, o, d))
        return order.sum()

    key = jax.random.PRNGKey(11)

    def args_for(r):
        k = jax.random.fold_in(key, r)
        o = jax.random.uniform(k, (N, 3), jnp.float32, -1.0, float(extent))
        d = jax.random.normal(jax.random.fold_in(k, 1), (N, 3))
        return o, d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    print(f"{n_tri} tris, {N} rays")
    vals = {}
    for name, fn in (
        ("brute", brute),
        ("mt-unsorted", mt_unsorted),
        ("mt-octant-sorted", mt_sorted),
        ("argsort-only", sort_only),
    ):
        v = float(np.asarray(fn(*args_for(0))))
        ts = []
        for r in range(1, 4):
            a = args_for(r)
            jax.block_until_ready(a)
            t0 = time.perf_counter()
            v = float(np.asarray(fn(*a)))
            ts.append(time.perf_counter() - t0)
        vals[name] = v
        print(f"{name:18s}: {min(ts)*1e3:8.1f} ms   checksum {v:.6e}", flush=True)
    # same checksum => binning preserved results exactly
    assert vals["mt-unsorted"] == vals["mt-octant-sorted"], vals


if __name__ == "__main__":
    main()
