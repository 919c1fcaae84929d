"""Same-session roofline: chip probes + standalone intersection kernel +
full tracer, measured back to back so relative numbers are trustworthy.

Motivation (VERDICT r1 weak #1): the sandbox chip's absolute throughput
drifts between sessions (shared tunnel), so a kernel rate measured one day
cannot be compared against a tracer rate measured another day. This script
measures everything in ONE process and prints a consistent table:

    tracer bounces/s x rays-per-segment x triangles  ==  kernel ray-tri/s ?

Methodology (see PERF.md "relay caching caveat"): every rep uses varied
input data and consumes a data-dependent checksum.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _consume(out):
    """Force a host readback of a data-dependent scalar — the relay acks
    block_until_ready before the work is really done, so only a host
    fetch closes the timing (PERF.md 'relay caching caveat')."""
    leaves = jax.tree_util.tree_leaves(out)
    acc = 0.0
    for l in leaves:
        if l.size <= 1024:  # fetch small outputs (checksums) to host
            acc += float(np.asarray(l).ravel()[0])
        else:  # large outputs: completion only, no 100MB tunnel copies
            jax.block_until_ready(l)
    return acc


def timed(fn, make_args, reps=4):
    """Median wall time of fn(*make_args(r)) -> host; distinct data/rep."""
    _consume(fn(*make_args(0)))
    ts = []
    for r in range(1, reps + 1):
        args = make_args(r)
        t0 = time.perf_counter()
        out = fn(*args)
        _consume(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), out


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({jax.default_backend()})")

    # ---- probe 0: relay fixed overhead (tiny kernel round-trip) ----
    @jax.jit
    def tiny(x):
        return jnp.sum(x * 1.000001)

    t0, _ = timed(tiny, lambda r: (jnp.full((8,), 1.0 + r, jnp.float32),))
    print(f"relay round-trip floor: {t0*1e3:.1f} ms (subtract from probes)")

    # ---- probe 1: VPU f32 elementwise (wide FMAs, varied input) ----
    # the working set (1 MB) stays VMEM-resident so the loop measures
    # compute, not HBM; breadth over M keeps the VPU throughput-bound
    M = 256 * 1024
    K = 2048  # fma passes over the array

    @jax.jit
    def vpu(x):
        def body(i, a):
            return a * 1.000001 + x
        return jnp.sum(jax.lax.fori_loop(0, K, body, x))

    t, _ = timed(vpu, lambda r: (jnp.full((M,), 1.0 + r * 1e-6, jnp.float32),))
    t = max(t - t0, 1e-9)
    vpu_rate = 2 * M * K / t
    print(f"VPU f32: {vpu_rate/1e12:.3f} TFLOP/s  ({t*1e3:.1f} ms net)")

    # ---- probe 2: HBM stream (read+write) ----
    S = 64 * 1024 * 1024  # floats

    @jax.jit
    def stream(x):
        y = x * 1.0000001
        return y, jnp.sum(y[::4096])

    t, _ = timed(stream, lambda r: (jnp.full((S,), r + 1.0, jnp.float32),))
    t = max(t - t0, 1e-9)
    print(f"HBM stream: {2*4*S/t/1e9:.1f} GB/s  ({t*1e3:.1f} ms net)")

    # ---- build the bench tracer / scene ----
    from __graft_entry__ import _build_scene_tracer
    from theia_tpu.accel import intersect_scene

    batch = int(os.environ.get("BENCH_BATCH", 256 * 1024))
    max_path = int(os.environ.get("BENCH_PATH_LENGTH", 10))
    tracer = _build_scene_tracer(batch, max_path=max_path)
    pack = tracer.scene.pack
    n_tri = int(pack.w_v0.shape[0])
    print(f"scene: {n_tri} triangles, batch {batch}, path {max_path}")

    # ---- probe 3: standalone intersection kernel on this very scene ----
    n_ray = batch  # same lane count the tracer uses per scan
    key = jax.random.PRNGKey(0)

    def ray_args(r):
        k = jax.random.fold_in(key, r)
        o = jax.random.uniform(k, (n_ray, 3), jnp.float32, -2.0, 2.0)
        d = jax.random.normal(jax.random.fold_in(k, 1), (n_ray, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        med = jnp.zeros(n_ray, jnp.int32)
        return o, d, med

    @jax.jit
    def kernel(o, d, med):
        hit = intersect_scene(pack, med, o, d, jnp.full(n_ray, 100.0))
        return jnp.sum(jnp.where(hit.valid, hit.t, 0.0)) + jnp.sum(
            jnp.where(hit.valid[:, None], hit.world_pos, 0.0)
        )

    t, _ = timed(kernel, ray_args)
    t = max(t - t0, 1e-9)
    kernel_rate = n_ray * n_tri / t
    print(
        f"standalone intersect_scene: {kernel_rate/1e9:.2f} G ray-tri/s"
        f"  ({t*1e3:.1f} ms for {n_ray}x{n_tri})"
    )

    # ---- probe 4: the full tracer ----
    fn, args = tracer.trace_fn()
    jfn = jax.jit(fn)

    def tracer_args(r):
        # advance the RNG counter so every rep traces distinct photons
        p, counter, streams = args
        return (p, counter + jnp.uint32(r * 1000), streams)

    t, out = timed(jfn, tracer_args)
    bounces = batch * max_path / t
    print(f"tracer: {bounces/1e6:.3f} M bounces/s  ({t:.3f} s/batch)")

    # ---- the consistency check ----
    rays_per_seg = 3  # main + fused 2N MIS shadow pair
    implied = bounces * rays_per_seg * n_tri
    print(
        f"\nroofline check: tracer implies {implied/1e9:.2f} G ray-tri/s "
        f"(x{rays_per_seg} rays/segment); standalone kernel measured "
        f"{kernel_rate/1e9:.2f} G ray-tri/s"
    )
    print(
        f"tracer intersection efficiency: {implied/kernel_rate*100:.0f}% "
        f"of standalone (>100% means non-intersection work is hidden "
        f"under async dispatch or the kernel probe is unrepresentative)"
    )


if __name__ == "__main__":
    main()
