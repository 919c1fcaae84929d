"""Probe 2: true compute/bandwidth peaks via long chained workloads.

Each measurement chains enough work inside ONE jit call that the ~31 ms
launch latency is <10% of wall time. Inputs varied per rep; a checksum is
consumed to defeat the relay's execution cache.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, args, work, unit, label, reps=2):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for r in range(reps):
        args2 = tuple(a * (1.0 + (r + 1) * 1e-4) for a in args)
        t0 = time.perf_counter()
        out = fn(*args2)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"{label:34s} {dt*1e3:9.1f} ms  -> {work/dt/1e12:8.2f} T{unit}/s")


def main():
    key = jax.random.PRNGKey(1)

    # MXU bf16: 256 chained 4096^2 matmuls = 35.2 TFLOP
    n, size = 256, 4096
    a = jax.random.normal(key, (size, size), jnp.bfloat16)

    @jax.jit
    def mm_bf16(a):
        y = a

        def body(i, y):
            return (y @ a) * jnp.bfloat16(1e-4)

        y = jax.lax.fori_loop(0, n, body, y)
        return y.astype(jnp.float32).sum()

    bench(mm_bf16, (a,), n * 2 * size**3, "FLOP", f"MXU bf16 {n}x{size}^2")

    # MXU f32
    af = jax.random.normal(key, (size, size), jnp.float32)

    @jax.jit
    def mm_f32(a):
        y = a

        def body(i, y):
            return (y @ a) * 1e-4

        return jax.lax.fori_loop(0, n // 4, body, y).sum()

    bench(mm_f32, (af,), n // 4 * 2 * size**3, "FLOP", f"MXU f32 {n//4}x{size}^2")

    # VPU f32: 16M elements x 2000 fused mul-adds
    m = 1 << 24
    x = jax.random.normal(key, (m,), jnp.float32)

    @jax.jit
    def vpu(x):
        def body(i, y):
            return y * 1.0000001 + x

        return jax.lax.fori_loop(0, 2000, body, x).sum()

    bench(vpu, (x,), m * 2000 * 2, "FLOP", "VPU f32 fma chain")

    # VPU divide throughput
    @jax.jit
    def vdiv(x):
        def body(i, y):
            return x / (y + 2.0)

        return jax.lax.fori_loop(0, 500, body, x).sum()

    bench(vdiv, (x,), m * 500, "DIV", "VPU f32 divide chain")

    # HBM: big array, 64 passes
    m2 = 1 << 27  # 512 MB
    xb = jax.random.normal(key, (m2,), jnp.float32)

    @jax.jit
    def hbm(x):
        def body(i, s):
            return s + (x * (i + 1.0)).sum()

        return jax.lax.fori_loop(0, 64, body, 0.0)

    bench(hbm, (xb,), 64 * m2 * 4 / 1e0, "B", "HBM read 64x512MB")

    # gather throughput: 16M random gathers from a 64MB table, 32 rounds
    tbl = jax.random.normal(key, (1 << 24,), jnp.float32)
    idx = jax.random.randint(key, (1 << 22,), 0, 1 << 24, jnp.int32)

    @jax.jit
    def gather(tbl, idx):
        def body(i, s):
            return s + jnp.take(tbl, (idx + i) & ((1 << 24) - 1)).sum()

        return jax.lax.fori_loop(0, 32, body, 0.0)

    out = gather(tbl, idx)
    jax.block_until_ready(out)
    ts = []
    for r in range(2):
        idx2 = (idx + r + 7) & ((1 << 24) - 1)
        t0 = time.perf_counter()
        out = gather(tbl, idx2)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(
        f"{'random gather 32x4M':34s} {dt*1e3:9.1f} ms"
        f"  -> {32*(1<<22)/dt/1e9:8.2f} Ggather/s"
    )


if __name__ == "__main__":
    main()
