"""Piece timings for the MT Pallas kernel's fusion-boundary analysis.

Round 3 found the MT kernel loses end-to-end ONLY because of the
pallas_call fusion boundary (kernel 23 ms + epilogue 4.9 ms standalone vs
41.1 ms combined, PERF.md round 3). This probe re-measures the pieces in
one session at the bench shapes so the round-5 fused-epilogue experiment
has a current baseline:

  brute-scan       — accel._nearest_triangle standalone
  mt-kernel        — nearest_triangle_mt standalone
  reconstruct      — _reconstruct_hit standalone (t/idx precomputed)
  intersect-brute  — intersect_scene on the brute pack (fused by XLA)
  intersect-mt     — intersect_scene on the mt pack (kernel + epilogue)

Usage: python tools/probe_mt_pieces.py [--rays 262144] [--reps 5]
"""

import argparse
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
    from theia_tpu.accel import _nearest_triangle, _reconstruct_hit, intersect_scene

    scene_b = g._build_scene_tracer(1024, max_path=2, accel="brute").scene
    scene_m = g._build_scene_tracer(1024, max_path=2, accel="mt").scene
    pack_b, pack_m = scene_b.pack, scene_m.pack
    n = args.rays
    rng = np.random.default_rng(11)
    o = jnp.asarray(rng.uniform(-2.0, 5.0, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
    med = jnp.zeros((n,), jnp.int32)
    tmax = jnp.float32(100.0)

    out = {"rays": n, "n_tri": int(pack_b.w_v0.shape[0])}

    def report(name, dt, spread):
        rate = n * out["n_tri"] / dt / 1e9
        out[name] = {
            "ms": dt * 1e3,
            "spread_ms": [s * 1e3 for s in spread],
            "Gtest_s": rate,
        }
        print(f"  {name}: {dt * 1e3:.2f} ms ({rate:.1f} Gt/s)", file=sys.stderr, flush=True)

    step = jax.jit(
        lambda o, d: _nearest_triangle(pack_b, o, d, tmax, 256)
    )
    dt, sp = timed(step, lambda r: (o + r * 1e-4, d), args.reps)
    report("brute_scan", dt, sp)

    from theia_tpu.ops.intersect_mt_pallas import nearest_triangle_mt

    step = jax.jit(lambda o, d: nearest_triangle_mt(pack_m.mt, o, d, tmax))
    dt, sp = timed(step, lambda r: (o + r * 1e-4, d), args.reps)
    report("mt_kernel", dt, sp)

    # reconstruction standalone: consume precomputed (t, idx)
    t0_, i0_ = jax.jit(lambda o, d: nearest_triangle_mt(pack_m.mt, o, d, tmax))(o, d)
    step = jax.jit(
        lambda o, d, t, i: _reconstruct_hit(pack_m, med, o, d, t, i).world_pos.sum()
    )
    dt, sp = timed(step, lambda r: (o + r * 1e-4, d, t0_, i0_), args.reps)
    report("reconstruct", dt, sp)

    for name, pack in (("intersect_brute", pack_b), ("intersect_mt", pack_m)):
        step = jax.jit(
            lambda o, d, pack=pack: intersect_scene(
                pack, med, o, d, tmax
            ).world_pos.sum()
        )
        dt, sp = timed(step, lambda r: (o + r * 1e-4, d), args.reps)
        report(name, dt, sp)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
