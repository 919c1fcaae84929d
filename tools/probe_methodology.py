"""Probe 3: trustworthy timing methodology on the axon relay.

For one fixed workload (chained matmul), measure separately:
  - enqueue time (jit call returns)
  - block_until_ready time
  - host fetch time (np.asarray)
and verify the fetched VALUE changes when the input changes (cache check).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

key = jax.random.PRNGKey(2)
size, n = 2048, 64
a0 = jax.random.normal(key, (size, size), jnp.float32)


@jax.jit
def mm(a):
    def body(i, y):
        y = (y @ a) * 1e-3
        return y

    return jax.lax.fori_loop(0, n, body, a).sum()


work = n * 2 * size**3

for rep in range(4):
    a = a0 * (1.0 + rep * 0.001)
    jax.block_until_ready(a)
    t0 = time.perf_counter()
    out = mm(a)
    t1 = time.perf_counter()
    jax.block_until_ready(out)
    t2 = time.perf_counter()
    val = float(np.asarray(out))
    t3 = time.perf_counter()
    print(
        f"rep{rep}: enqueue {1e3*(t1-t0):7.2f} ms | block {1e3*(t2-t1):8.2f} ms"
        f" | fetch {1e3*(t3-t2):8.2f} ms | total->value {1e3*(t3-t0):8.2f} ms"
        f" | {work/(t3-t0)/1e12:7.2f} TFLOP/s | val {val:.6e}"
    )

# same input twice in a row: cached?
print("-- repeat same input twice --")
for rep in range(2):
    t0 = time.perf_counter()
    val = float(np.asarray(mm(a0)))
    print(f"  same-input rep{rep}: {1e3*(time.perf_counter()-t0):8.2f} ms val {val:.6e}")
