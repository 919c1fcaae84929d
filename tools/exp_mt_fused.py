"""Experiment: fuse the winner-row extraction into the MT Pallas kernel.

Round 3 pinned the MT backend's end-to-end loss on the pallas_call
fusion boundary: XLA cannot overlap the epilogue's winner-row gathers
with the opaque kernel (kernel 23 ms + epilogue 4.9 ms standalone vs
41.1 ms combined). The reference's megakernel never pays this boundary
(everything fused, reference src/theia/trace.py:674-685). This
experiment moves the epilogue's (N, 32) ``tri_data`` row gather INSIDE
the kernel: after the tile loop each block serially copies its 256
winners' rows from a VMEM-resident (T_pad, 32) table into a (bn, 32)
output — the question is whether Mosaic's serial per-lane dynamic row
reads are cheaper than XLA's HBM gather + boundary.

Variants measured (256k rays, bench soup, median of 5):
  A  kernel (t, idx) only            — current production kernel
  B  kernel + in-kernel row output   — the fused candidate
  C  A + XLA row gather outside      — what the epilogue pays today
Decision rule: B < C by enough to also cover the remaining epilogue
means wiring it into intersect_scene; B >= C is the conclusive null.

Usage: python tools/exp_mt_fused.py [--rays 262144] [--reps 5]
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    ),
)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from theia_tpu.ops._intersect_tiles import pack_rays
from theia_tpu.ops.intersect_mt_pallas import _call, _kernel


def _kernel_rows(
    x_ref, tmax_ref, tri_ref, aabb_ref, table_ref,
    t_out, idx_out, rows_out, t_sc, i_sc,
):
    """The production MT kernel body + serial winner-row extraction."""
    _kernel(x_ref, tmax_ref, tri_ref, aabb_ref, t_out, idx_out, t_sc, i_sc)
    bn = t_sc.shape[0]

    def extract(j, _):
        idx = jnp.maximum(i_sc[j, 0], 0)
        rows_out[j, :] = table_ref[idx, :]
        return 0

    jax.lax.fori_loop(0, bn, extract, 0)


@functools.partial(jax.jit, static_argnames=("n_tri", "bn"))
def _call_rows(x, tmax, tri, aabb, table, n_tri, bn):
    n_pad = x.shape[0]
    t, idx, rows = pl.pallas_call(
        _kernel_rows,
        grid=(n_pad // bn,),
        in_specs=[
            pl.BlockSpec((bn, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(tri.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (aabb.shape[0], 8), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(table.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bn, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, 32), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_pad, 32), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bn, 1), jnp.float32),
            pltpu.VMEM((bn, 1), jnp.int32),
        ],
    )(x, tmax, tri, aabb, table)
    t = t[:, 0]
    idx = idx[:, 0]
    idx = jnp.where(idx >= n_tri, -1, idx)
    return jnp.where(idx < 0, jnp.inf, t), idx, rows


def timed(step, make_args, reps):
    jax.block_until_ready(step(*make_args(0)))
    ts = []
    for r in range(1, reps + 1):
        a = make_args(r)
        jax.block_until_ready(a)
        t0 = time.perf_counter()
        jax.block_until_ready(step(*a))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), [float(min(ts)), float(max(ts))]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=256 * 1024)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import __graft_entry__ as g

    scene = g._build_scene_tracer(1024, max_path=2, accel="mt").scene
    pack = scene.pack
    mt = pack.mt
    bn = 256
    n = args.rays
    rng = np.random.default_rng(11)
    o = jnp.asarray(rng.uniform(-2.0, 5.0, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
    tmax = jnp.float32(100.0)
    table = pack.tri_data  # (T_pad?, 32) — mt tables are Morton-consistent
    t_pad = mt.tri.shape[0] * mt.tri.shape[2]
    if table.shape[0] < t_pad:
        table = jnp.pad(table, ((0, t_pad - table.shape[0]), (0, 0)))

    out = {"rays": n, "n_tri": mt.n_tri}

    def report(name, dt, sp, extra=""):
        out[name] = {"ms": dt * 1e3, "spread_ms": [s * 1e3 for s in sp]}
        print(f"  {name}: {dt*1e3:.2f} ms {extra}", file=sys.stderr, flush=True)

    # A: production kernel
    def run_a(o, d):
        x, tm, nn = pack_rays(o, d, tmax, bn)
        t, i = _call(x, tm, mt.tri, mt.aabb, mt.n_tri, bn, False)
        return t[:nn].sum() + i[:nn].sum()

    dt, sp = timed(jax.jit(run_a), lambda r: (o + r * 1e-4, d), args.reps)
    report("A_kernel", dt, sp)

    # B: fused rows kernel
    def run_b(o, d):
        x, tm, nn = pack_rays(o, d, tmax, bn)
        t, i, rows = _call_rows(x, tm, mt.tri, mt.aabb, table, mt.n_tri, bn)
        return t[:nn].sum() + i[:nn].sum() + rows[:nn].sum()

    dt, sp = timed(jax.jit(run_b), lambda r: (o + r * 1e-4, d), args.reps)
    report("B_kernel_rows", dt, sp)

    # C: production kernel + XLA row gather
    def run_c(o, d):
        x, tm, nn = pack_rays(o, d, tmax, bn)
        t, i = _call(x, tm, mt.tri, mt.aabb, mt.n_tri, bn, False)
        t, i = t[:nn], i[:nn]
        rows = jnp.take(table, jnp.maximum(i, 0), axis=0)
        return t.sum() + i.sum() + rows.sum()

    dt, sp = timed(jax.jit(run_c), lambda r: (o + r * 1e-4, d), args.reps)
    report("C_kernel_xla_gather", dt, sp)

    # correctness: B rows == C rows on hit lanes
    xb, tm, nn = pack_rays(o, d, tmax, bn)
    tb, ib, rb = _call_rows(xb, tm, mt.tri, mt.aabb, table, mt.n_tri, bn)
    tc, ic = _call(xb, tm, mt.tri, mt.aabb, mt.n_tri, bn, False)
    rc = jnp.take(table, jnp.maximum(ic, 0), axis=0)
    hit = np.asarray(ic[:nn]) >= 0
    assert np.array_equal(np.asarray(ib[:nn]), np.asarray(ic[:nn]))
    assert np.array_equal(
        np.asarray(rb[:nn])[hit], np.asarray(rc[:nn])[hit]
    ), "row extraction mismatch"
    out["rows_match"] = True
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
