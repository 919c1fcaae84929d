"""Benchmark: scene-tracing throughput on the real TPU chip.

Runs the examples/02-equivalent benchmark (three instanced sphere meshes,
3840 triangles, target-guide MIS, 100-bin light curve) and reports
photon-bounces/s — batchSize x maxPathLength path segments per wall-clock
second, steady-state (compile excluded).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: 1e8 photon-bounces/s/chip (BASELINE.md north star).
"""

import json
import os
import sys
import time

BASELINE = 1.0e8


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
                    # the dev sandbox chip delivers ~0.1 TFLOP/s matmul /
                    # ~20 GB/s HBM (~1/2000 of a production v5e); see
                    # PERF.md for the calibration and kernel experiments
                    "note": "sandbox chip ~1/2000 of production v5e",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
