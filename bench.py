"""Benchmark: scene-tracing throughput on the real TPU chip, self-calibrated.

Runs the examples/02-equivalent benchmark (three instanced sphere meshes,
3840 triangles, target-guide MIS, 100-bin light curve) and reports
photon-bounces/s — batchSize x maxPathLength path segments per wall-clock
second, steady-state (compile excluded).

Every run also measures, in the SAME session:
  * the standalone brute intersection kernel on the same triangle soup at
    the tracer's ray count (kernel_Gtest_s) — the roofline denominator;
  * tracer_over_kernel_ratio = the tracer's effective ray-triangle test
    rate (3 sweeps per segment: primary + 2 MIS shadow) over the
    standalone kernel rate. This ratio is the hardware-independent health
    metric: the absolute rates swing ~5x between sandbox sessions
    (relay/tunnel variance), the ratio does not.
  * matmul_tflops / hbm_gbps microprobes pinning the session's compute
    and bandwidth envelope.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: 1e8 photon-bounces/s/chip (BASELINE.md north star).
"""

import json
import os
import sys
import time

# persistent XLA compilation cache: repeated bench runs (and the driver's
# end-of-round run) skip the multi-minute batch compile
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)

import numpy as np

BASELINE = 1.0e8
RAYS_PER_BOUNCE = 3  # primary + 2 MIS shadow sweeps per segment


def _min_time(fn, make_args, runs):
    """min wall time over runs; inputs varied per rep (the remote execution
    path caches identical launches)."""
    import jax

    times = []
    for rep in range(runs):
        args = make_args(rep)
        jax.block_until_ready(args)
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return min(times)


def probe_kernel(pack, n_rays: int, runs: int) -> float:
    """Standalone brute intersection rate (ray-tri tests/s) on the bench
    scene's own triangle soup at the tracer's per-sweep ray count."""
    import jax
    import jax.numpy as jnp

    from theia_tpu.accel import _nearest_triangle

    rng = np.random.default_rng(7)
    o = rng.uniform(-2.0, 5.0, (n_rays, 3)).astype(np.float32)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    oj, dj = jnp.asarray(o), jnp.asarray(d)

    @jax.jit
    def run(o, d):
        t, i = _nearest_triangle(pack, o, d, jnp.float32(100.0), 256)
        return jnp.where(jnp.isfinite(t), t, 0.0).sum() + i.sum()

    jax.block_until_ready(run(oj, dj))  # compile
    dt = _min_time(run, lambda rep: (oj + rep * 1e-4, dj), runs)
    n_tri = int(pack.w_v0.shape[0])
    return n_rays * n_tri / dt


def probe_matmul(runs: int) -> float:
    """bf16 matmul TFLOP/s (MXU envelope)."""
    import jax
    import jax.numpy as jnp

    n = 2048
    a = jnp.ones((n, n), jnp.bfloat16)
    b = jnp.ones((n, n), jnp.bfloat16)

    @jax.jit
    def run(a, b):
        return (a @ b).sum()

    jax.block_until_ready(run(a, b))
    dt = _min_time(run, lambda rep: (a + jnp.bfloat16(rep), b), runs)
    return 2.0 * n**3 / dt / 1e12


def probe_hbm(runs: int) -> float:
    """Streaming-add GB/s (HBM envelope): read+write of a 256 MiB array."""
    import jax
    import jax.numpy as jnp

    n = 64 * 1024 * 1024  # 256 MiB f32
    x = jnp.ones((n,), jnp.float32)

    @jax.jit
    def run(x):
        return x + 1.0

    jax.block_until_ready(run(x))
    dt = _min_time(run, lambda rep: (x + np.float32(rep),), runs)
    return 2.0 * 4.0 * n / dt / 1e9


def main() -> None:
    batch = int(os.environ.get("BENCH_BATCH", 256 * 1024))
    max_path = int(os.environ.get("BENCH_PATH_LENGTH", 10))
    runs = int(os.environ.get("BENCH_RUNS", 3))
    accel = os.environ.get("BENCH_ACCEL", "brute")

    import jax

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __graft_entry__ as g

    tracer = g._build_scene_tracer(batch, max_path=max_path, accel=accel)
    fn, (p, counter, streams) = tracer.trace_fn()
    step = jax.jit(fn)

    # warmup / compile
    out = step(p, counter, streams)
    jax.block_until_ready(out)

    # advance the RNG offset per run so every execution is distinct (the
    # remote execution path caches identical launches)
    times = []
    for _ in range(runs):
        tracer.rng.advance()
        counter = tracer.rng.counter_words
        t0 = time.perf_counter()
        out = step(p, counter, streams)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    bounces = batch * max_path
    value = bounces / dt
    hist_sum = float(out[0].sum())

    # same-session calibration probes (see module docstring)
    pack = tracer.scene.pack
    n_tri = int(pack.w_v0.shape[0])
    kernel_rate = probe_kernel(pack, batch, runs)
    tracer_tests = value * RAYS_PER_BOUNCE * n_tri
    matmul_tflops = probe_matmul(runs)
    hbm_gbps = probe_hbm(runs)

    print(
        json.dumps(
            {
                "metric": "photon-bounces/s/chip (scene tracing)",
                "value": value,
                "unit": "bounces/s",
                "vs_baseline": value / BASELINE,
                "detail": {
                    "batch": batch,
                    "path_length": max_path,
                    "seconds_per_batch": dt,
                    "histogram_sum": hist_sum,
                    "backend": jax.default_backend(),
                    "device": str(jax.devices()[0]),
                    "n_tri": n_tri,
                    "kernel_Gtest_s": kernel_rate / 1e9,
                    "tracer_Gtest_s": tracer_tests / 1e9,
                    "tracer_over_kernel_ratio": tracer_tests / kernel_rate,
                    "matmul_tflops": matmul_tflops,
                    "hbm_gbps": hbm_gbps,
                    "note": (
                        "absolute rates swing ~5x between sandbox sessions; "
                        "tracer_over_kernel_ratio is the session-normalized "
                        "roofline metric (see PERF.md)"
                    ),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
