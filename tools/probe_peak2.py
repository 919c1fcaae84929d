"""Probe 4: fit (fixed overhead + rate) from multiple work sizes.

Magnitude-stable chained matmuls (scale ~ 1/sqrt(K) keeps values O(1) so
checksums are nonzero and verifiably input-dependent). Timing = call to
host-value.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

key = jax.random.PRNGKey(3)


def run(size, n, dtype):
    a0 = (jax.random.normal(key, (size, size), jnp.float32) / np.sqrt(size)).astype(
        dtype
    )
    scale = dtype(1.0)

    @jax.jit
    def mm(a):
        def body(i, y):
            return y @ a

        y = jax.lax.fori_loop(0, n, body, a)
        return y.astype(jnp.float32).sum()

    vals = []
    ts = []
    for rep in range(3):
        a = a0 * dtype(1.0 + rep * 0.001)
        jax.block_until_ready(a)
        t0 = time.perf_counter()
        val = float(np.asarray(mm(a)))
        ts.append(time.perf_counter() - t0)
        vals.append(val)
    work = n * 2 * size**3
    dt = min(ts[1:])
    distinct = len(set(vals)) == len(vals)
    print(
        f"{str(dtype.__name__):9s} {size}^2 x{n:5d}: {dt*1e3:9.1f} ms"
        f" -> {work/dt/1e12:8.2f} TFLOP/s  vals-distinct={distinct}"
        f"  val0={vals[0]:.4e}"
    )
    return dt, work


print("== bf16 ==")
o1, w1 = run(4096, 32, jnp.bfloat16)
o2, w2 = run(4096, 256, jnp.bfloat16)
rate = (w2 - w1) / (o2 - o1)
print(f"   marginal bf16 rate: {rate/1e12:.1f} TFLOP/s, overhead ~{(o1 - w1/rate)*1e3:.1f} ms")
print("== f32 ==")
o1, w1 = run(4096, 16, jnp.float32)
o2, w2 = run(4096, 128, jnp.float32)
rate = (w2 - w1) / (o2 - o1)
print(f"   marginal f32 rate: {rate/1e12:.1f} TFLOP/s, overhead ~{(o1 - w1/rate)*1e3:.1f} ms")

# VPU with enough work to dominate overhead: 16M x 20000 fma
m = 1 << 24
x0 = jax.random.normal(key, (m,), jnp.float32)


@jax.jit
def vpu(x):
    def body(i, y):
        return y * 1.0000001 + x

    return jax.lax.fori_loop(0, 20000, body, x).sum()


ts, vals = [], []
for rep in range(3):
    x = x0 * (1.0 + rep * 0.001)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    vals.append(float(np.asarray(vpu(x))))
    ts.append(time.perf_counter() - t0)
work = m * 20000 * 2
print(
    f"VPU 16M x 20000 fma: {min(ts[1:])*1e3:9.1f} ms ->"
    f" {work/min(ts[1:])/1e12:8.2f} TFLOP/s  vals-distinct={len(set(vals))==3}"
)

# HBM: 1 GB array, 256 read passes
m2 = 1 << 28
xb = jax.random.normal(key, (m2,), jnp.float32)


@jax.jit
def hbm(x):
    def body(i, s):
        return s + jnp.dot(x, x) * 1e-9

    return jax.lax.fori_loop(0, 256, body, 0.0)


ts = []
for rep in range(2):
    xb2 = xb * (1.0 + rep * 1e-3)
    jax.block_until_ready(xb2)
    t0 = time.perf_counter()
    v = float(np.asarray(hbm(xb2)))
    ts.append(time.perf_counter() - t0)
print(f"HBM 256x1GB reads: {min(ts)*1e3:9.1f} ms -> {256*m2*4/min(ts)/1e9:8.1f} GB/s  v={v:.3e}")
