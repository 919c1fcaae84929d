"""Probe: is the sandbox chip latency-dominated or throughput-dominated?

Times the SAME computation at several work sizes with varied input data
(the axon relay caches identical launches — every run must be distinct and
consume a data-dependent checksum). If wall time is ~flat across a 64x work
range, the relay's fixed per-call latency dominates and bigger batches are
free throughput.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for r in range(reps):
        args2 = tuple(
            a + (r + 1) * 1e-6 if a.dtype == jnp.float32 else a for a in args
        )
        t0 = time.perf_counter()
        out = fn(*args2)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts), float(np.asarray(out).ravel()[0])


@jax.jit
def tiny(x):
    return (x * 2.0 + 1.0).sum()


def chain(n_iter):
    @jax.jit
    def f(x):
        def body(i, c):
            return c * 1.0000001 + 0.5 / (i + 1.0)

        return jax.lax.fori_loop(0.0, n_iter * 1.0, body, x).sum()

    return f


def elementwise(size):
    @jax.jit
    def f(x):
        y = x
        for _ in range(50):
            y = y * 1.01 + x
        return y.sum()

    return f


def main():
    key = jax.random.PRNGKey(0)

    # 1. pure launch latency
    x = jax.random.normal(key, (8,))
    dt, _ = timed(tiny, x)
    print(f"tiny-op latency:        {dt*1e3:8.2f} ms")

    # 2. elementwise at growing sizes (50 fused mul-adds per element)
    for size in (1 << 16, 1 << 20, 1 << 24):
        x = jax.random.normal(key, (size,))
        f = elementwise(size)
        dt, _ = timed(f, x)
        gflop = size * 50 * 2 / 1e9
        print(
            f"elementwise {size:>9}: {dt*1e3:8.2f} ms"
            f"  -> {gflop/dt:8.1f} GFLOP/s"
        )

    # 3. matmul sizes (f32)
    for size in (512, 1024, 2048, 4096):
        a = jax.random.normal(key, (size, size))
        b = jax.random.normal(key, (size, size))

        @jax.jit
        def mm(a, b):
            return (a @ b).sum()

        dt, _ = timed(mm, a, b)
        gflop = 2 * size**3 / 1e9
        print(
            f"matmul {size:>5}^2 f32:   {dt*1e3:8.2f} ms"
            f"  -> {gflop/dt:8.1f} GFLOP/s"
        )

    # 4. matmul bf16
    for size in (2048, 4096):
        a = jax.random.normal(key, (size, size), jnp.bfloat16)
        b = jax.random.normal(key, (size, size), jnp.bfloat16)

        @jax.jit
        def mmb(a, b):
            return (a @ b).astype(jnp.float32).sum()

        out = mmb(a, b)
        jax.block_until_ready(out)
        ts = []
        for r in range(3):
            a2 = a * (1 + (r + 1) * 0.001)
            t0 = time.perf_counter()
            out = mmb(a2, b)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        gflop = 2 * size**3 / 1e9
        print(
            f"matmul {size:>5}^2 bf16:  {dt*1e3:8.2f} ms"
            f"  -> {gflop/dt:8.1f} GFLOP/s"
        )

    # 5. chained matmul (amortize launch: 32 matmuls in one call)
    size = 2048
    a = jax.random.normal(key, (size, size))

    @jax.jit
    def mchain(a):
        y = a
        for _ in range(32):
            y = y @ a * 1e-3
        return y.sum()

    dt, _ = timed(mchain, a)
    gflop = 32 * 2 * size**3 / 1e9
    print(f"32-chain mm {size}^2:   {dt*1e3:8.2f} ms  -> {gflop/dt:8.1f} GFLOP/s")

    # 6. HBM stream
    for size in (1 << 24, 1 << 26):
        x = jax.random.normal(key, (size,))

        @jax.jit
        def stream(x):
            return (x + 1.0).sum()

        dt, _ = timed(stream, x)
        gb = size * 4 * 2 / 1e9
        print(f"stream {size:>9}:     {dt*1e3:8.2f} ms  -> {gb/dt:8.1f} GB/s")


if __name__ == "__main__":
    main()
