"""Round-5 A/B re-measurement of the round-4 noise-floor keepers.

VERDICT r4 weak #3: the response-chain fusion and the plain-det default
were committed "within the session's noise floor" (the round-4 kernel
probe swung 12.9-27.1 Gtest/s between runs). With bench.py's median-of-5
spread reporting the same decisions are re-measured here in ONE session,
each config a separate traced program on the same scene/batch:

  default       — committed round-4 state (fusions on, plain subsoup
                  det-nearest on few-detector scenes)
  nofuse        — round-4 response-chain fusions disabled
                  (trace.scene._FUSE_RESPONSES = False)
  det-culled    — the pre-0238b4d det path: nearest_culled over det
                  groups at cap 1/8 even on few-detector scenes (on the
                  bench's single-detector scene the guide half's needed
                  fraction ~0.5 > 1/8, so every segment takes the
                  masked-group fallback — the round-4 "4.34e6
                  session-best" program shape)
  nofuse+detc   — both toggles (the full pre-commit state)

All four are bit-identical in results (asserted on the histogram sum).
Usage: python tools/bench_ab_r5.py [--batch 262144] [--reps 5]
Prints one JSON line with median/min/max per config.
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
import numpy as np


def measure(batch, max_path, reps, *, fuse, det_min_groups):
    import theia_tpu.accel as accel
    import theia_tpu.trace.scene as ts
    import __graft_entry__ as g

    prev = (ts._FUSE_RESPONSES, accel.CULL_DET_MIN_GROUPS)
    ts._FUSE_RESPONSES = fuse
    accel.CULL_DET_MIN_GROUPS = det_min_groups
    try:
        tracer = g._build_scene_tracer(batch, max_path=max_path)
        fn, (p, counter, streams) = tracer.trace_fn()
        step = jax.jit(fn)
        out = step(p, counter, streams)
        jax.block_until_ready(out)
        times = []
        for _ in range(reps):
            tracer.rng.advance()
            counter = tracer.rng.counter_words
            t0 = time.perf_counter()
            out = step(p, counter, streams)
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        return {
            "bounces_per_s": batch * max_path / float(np.median(times)),
            "seconds_median": float(np.median(times)),
            "seconds_spread": [float(min(times)), float(max(times))],
            "hist_sum": float(np.asarray(out[0]).sum()),
        }
    finally:
        ts._FUSE_RESPONSES, accel.CULL_DET_MIN_GROUPS = prev


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256 * 1024)
    ap.add_argument("--path", type=int, default=10)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    configs = {
        "default": dict(fuse=True, det_min_groups=4),
        "nofuse": dict(fuse=False, det_min_groups=4),
        "det-culled": dict(fuse=True, det_min_groups=1),
        "nofuse+detc": dict(fuse=False, det_min_groups=1),
    }
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    results = {}
    for name, kw in configs.items():
        r = measure(args.batch, args.path, args.reps, **kw)
        results[name] = r
        print(
            f"  {name}: {r['bounces_per_s']:.4g} bounces/s "
            f"[{r['seconds_spread'][0]:.4f}, {r['seconds_spread'][1]:.4f}]s",
            file=sys.stderr,
            flush=True,
        )
    sums = {v["hist_sum"] for v in results.values()}
    winner = max(results, key=lambda k: results[k]["bounces_per_s"])
    print(
        json.dumps(
            {
                "batch": args.batch,
                "path_length": args.path,
                "reps": args.reps,
                "results": results,
                "bit_identical": len(sums) == 1,
                "winner": winner,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
