"""Benchmark: scene-tracing throughput on the real TPU chip, self-calibrated.

Runs the examples/02-equivalent benchmark (three instanced sphere meshes,
3840 triangles, target-guide MIS, 100-bin light curve) and reports
photon-bounces/s — batchSize x maxPathLength path segments per wall-clock
second, steady-state (compile excluded). Headline value = MEDIAN over
BENCH_RUNS (>= 5) reps; min/max/std in detail (sandbox relay sessions
drift — a single min is not distinguishable from session noise).

Every run also measures, in the SAME session:
  * the standalone brute intersection kernel on the same triangle soup at
    the tracer's ray count (kernel_Gtest_s) — the roofline denominator;
  * a f32 fma-chain VPU probe (vpu_tflops) and bf16 matmul / HBM stream
    probes pinning the session's compute and bandwidth envelope.

Work accounting (PAIRS — the metric VERDICT r4 weak #2 corrected):
  * pairs_nominal_per_s — bounces/s x 3 sweeps x n_tri: what a tracer
    testing every ray against every triangle would do. Kept for
    cross-round continuity with rounds 1-4.
  * pairs_tested_per_s — the pairs the program ACTUALLY tests, computed
    exactly from the static query inventory (every cull/compaction
    capacity is a static shape): per batch, primary nearest tests
    N x T on all S segments; the MIS shadow split (S-1 segments) tests
    2N x T_det on the detector subsoup plus cap_occ x T_occ on the
    compacted occluder any-hit (cap_occ = its static lane capacity —
    a compacted scan's cost IS its capacity; padding slots scan a
    duplicate ray. The any-hit while_loop may early-exit below that, so
    occ is a tight upper bound). Assumes the cull cond never falls back
    — dischargeable with BENCH_AUDIT=1, which re-runs one batch on CPU
    with the accel.CULL_AUDIT host callback and reports the actual
    fallback count (round-5 audit: 0 of 27 queries fell back).
  * tracer_over_kernel_tested = pairs_tested rate / kernel rate — the
    true "fraction of standalone-kernel speed" health metric.
  * tracer_over_kernel_nominal = pairs_nominal rate / kernel rate —
    kernel-speed x work-reduction factor (what rounds 3-4 called
    "tracer_over_kernel_ratio"; >1 means the tracer AVOIDS pairs).
  * mfu_vpu = pairs_tested FLOPs / vpu probe FLOPs (42 flop per
    scalarized Moeller-Trumbore pair, PERF.md round 2).

Env switches: BENCH_BATCH, BENCH_PATH_LENGTH, BENCH_RUNS, BENCH_ACCEL,
BENCH_RNG=philox|sobol (sobol = Owen-scrambled QRNG; same bounces/s
metric, lower light-curve variance — see PERF.md round 5 for the
measured effective-sample-rate ratio), BENCH_AUDIT=1.

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
FLOPS_PER_PAIR = 42  # scalarized Moeller-Trumbore flops per ray-tri test


def _times(fn, make_args, runs):
    """wall times over runs; inputs varied per rep (the remote execution
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
    return times


def _min_time(fn, make_args, runs):
    return min(_times(fn, make_args, runs))


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


def probe_vpu(runs: int) -> tuple[float, bool]:
    """f32 fma-chain TFLOP/s (VPU envelope) + a reliability flag.

    On the sandbox relay, standalone elementwise programs are elided
    (17 Gflop "completes" in 0.3 ms = 50+ TF — the round-4 methodology
    pathology, PERF.md), so the probe sanity-checks itself: a result
    beyond any plausible single-chip f32 rate is flagged unreliable and
    callers fall back to the kernel-derived envelope (the MT scan with
    its data-dependent checksum is the one workload the relay executes
    faithfully)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    n = 8 * 1024 * 1024
    k = 1024
    rng = np.random.default_rng(3)
    x0 = jnp.asarray(rng.uniform(0.5, 1.5, n).astype(np.float32))

    @jax.jit
    def run(x, a, b):
        def body(_, x):
            return x * a + b

        return lax.fori_loop(0, k, body, x).sum()

    a = jnp.float32(0.99995)
    b = jnp.float32(1e-5)
    jax.block_until_ready(run(x0, a, b))
    # rep + 1: rep 0 must not duplicate the warmup args (relay cache hit)
    dt = _min_time(run, lambda rep: (x0 + (rep + 1) * 1e-5, a, b), runs)
    tflops = 2.0 * n * k / dt / 1e12
    return tflops, tflops < 8.0  # > 8 TF f32 on one chip = elided


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


def _cull_cap(n_lanes: int, frac: float) -> int:
    return max(128, min(n_lanes, int(n_lanes * frac)))


def pairs_per_batch(tracer, n_lanes: int):
    """(pairs_tested, pairs_nominal, breakdown, exact) per batch.

    Mirrors the traced program's static query inventory (trace/scene.py
    _segment_body + accel.intersect_target): exact for the committed
    defaults (brute pack, CULL_MODE in {shadow, off}); other accel
    backends / cull modes report the un-culled inventory with
    exact=False."""
    import theia_tpu.accel as accel

    pack = tracer.scene.pack
    T = int(pack.w_v0.shape[0])
    S = tracer.maxPathLength
    N = n_lanes
    nominal = RAYS_PER_BOUNCE * S * N * T
    bd = {"primary": S * N * T, "det": 0, "occ": 0}
    if tracer.targetGuide is None:
        return bd["primary"], nominal, bd, True

    sl = 2 * N  # fused MIS shadow pair lanes
    segs = S - 1  # final segment is peeled: no shadow query
    accelerated = any(
        x is not None for x in (pack.mt, pack.woop, pack.instanced, pack.bvh)
    )
    if accelerated or pack.shadow_split is None:
        # fused full-soup nearest for the pair
        bd["det"] = segs * sl * T
        return sum(bd.values()), nominal, bd, not accelerated

    T_det = int(pack.shadow_split.det_v0.shape[0])
    T_occ = T - T_det
    cull = pack.cull if accel.CULL_MODE in ("all", "shadow") else None
    exact = accel.CULL_MODE in ("shadow", "off")
    if cull is None:
        bd["det"] = segs * sl * T_det
        bd["occ"] = segs * sl * T_occ
        return sum(bd.values()), nominal, bd, exact

    det_groups = [k for k, d in enumerate(cull.is_det) if d]
    occ_tris = sum(
        e - s for (s, e), d in zip(cull.spans, cull.is_det) if not d
    )
    if len(det_groups) >= 4 and accel.CULL_CAP_DET > 0:
        cap_det = _cull_cap(sl, accel.CULL_CAP_DET)
        bd["det"] = segs * sum(
            cap_det * (cull.spans[k][1] - cull.spans[k][0])
            for k in det_groups
        )
    else:
        bd["det"] = segs * sl * T_det
    cap_occ = _cull_cap(sl, accel.CULL_CAP_OCC)
    bd["occ"] = segs * cap_occ * occ_tris
    return sum(bd.values()), nominal, bd, exact


def run_audit(batch: int, max_path: int, accel_mode: str, rng_mode: str):
    """Discharge the no-fallback assumption: run one batch on CPU with the
    accel.CULL_AUDIT host callback recording every culled query's cond
    predicate. Prints {"queries": n, "fallbacks": k} and exits."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import theia_tpu.accel as accel

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __graft_entry__ as g

    accel.CULL_AUDIT = audit = []
    tracer = g._build_scene_tracer(
        batch, max_path=max_path, accel=accel_mode, rng=rng_mode
    )
    fn, (p, counter, streams) = tracer.trace_fn()
    out = jax.jit(fn)(p, counter, streams)
    jax.block_until_ready(out)
    print(
        json.dumps(
            {"queries": len(audit), "fallbacks": audit.count(False)}
        )
    )


def main() -> None:
    batch = int(os.environ.get("BENCH_BATCH", 256 * 1024))
    max_path = int(os.environ.get("BENCH_PATH_LENGTH", 10))
    runs = int(os.environ.get("BENCH_RUNS", 5))
    accel_mode = os.environ.get("BENCH_ACCEL", "brute")
    rng_mode = os.environ.get("BENCH_RNG", "philox")

    if "--audit" in sys.argv:
        run_audit(
            int(os.environ.get("BENCH_AUDIT_BATCH", 64 * 1024)),
            max_path,
            accel_mode,
            rng_mode,
        )
        return

    import jax

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __graft_entry__ as g

    tracer = g._build_scene_tracer(
        batch, max_path=max_path, accel=accel_mode, rng=rng_mode
    )
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
    dt = float(np.median(times))
    bounces = batch * max_path
    value = bounces / dt
    hist_sum = float(out[0].sum())

    # same-session calibration probes (see module docstring)
    pack = tracer.scene.pack
    n_tri = int(pack.w_v0.shape[0])
    n_lanes = int(streams.shape[0])
    kernel_rate = probe_kernel(pack, batch, runs)
    vpu_probe_tflops, vpu_probe_ok = probe_vpu(runs)
    matmul_tflops = probe_matmul(runs)
    hbm_gbps = probe_hbm(runs)

    # VPU envelope for MFU: the fma probe when it measured something
    # plausible, else the kernel-derived rate (see probe_vpu docstring)
    kernel_tflops = kernel_rate * FLOPS_PER_PAIR / 1e12
    vpu_tflops = (
        max(vpu_probe_tflops, kernel_tflops) if vpu_probe_ok else kernel_tflops
    )

    # work accounting (module docstring "PAIRS")
    tested_b, nominal_b, breakdown, exact = pairs_per_batch(tracer, n_lanes)
    pairs_tested_s = tested_b / dt
    pairs_nominal_s = nominal_b / dt
    mfu_vpu = pairs_tested_s * FLOPS_PER_PAIR / (vpu_tflops * 1e12)

    detail = {
        "batch": batch,
        "path_length": max_path,
        "rng": rng_mode,
        "seconds_per_batch": dt,
        "seconds_min": float(np.min(times)),
        "seconds_max": float(np.max(times)),
        "seconds_std": float(np.std(times)),
        "reps": runs,
        "histogram_sum": hist_sum,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "n_tri": n_tri,
        "kernel_Gtest_s": kernel_rate / 1e9,
        "pairs_nominal_per_s": pairs_nominal_s,
        "pairs_tested_per_s": pairs_tested_s,
        "pairs_tested_exact": exact,
        "pairs_breakdown_per_batch": breakdown,
        "tracer_over_kernel_tested": pairs_tested_s / kernel_rate,
        "tracer_over_kernel_nominal": pairs_nominal_s / kernel_rate,
        "vpu_tflops": vpu_tflops,
        "vpu_probe_tflops": vpu_probe_tflops,
        "vpu_probe_reliable": vpu_probe_ok,
        "mfu_vpu": mfu_vpu,
        "matmul_tflops": matmul_tflops,
        "hbm_gbps": hbm_gbps,
        "note": (
            "value = median over reps (spread in seconds_min/max/std). "
            "tracer_over_kernel_tested = fraction of the standalone "
            "kernel's rate on pairs ACTUALLY tested (exact static "
            "accounting; see module docstring); _nominal additionally "
            "credits avoided pairs (rounds 3-4 called it "
            "tracer_over_kernel_ratio). Absolute rates swing between "
            "sandbox sessions; the ratios do not (PERF.md)."
        ),
    }
    if os.environ.get("BENCH_EXTRAS", "1") != "0":
        # the domain's flagship scaling workload in the same artifact: a
        # 27-module SceneTemplate detector array under accel='auto'
        # (instanced), full MIS tracer (tools/bench_detector_array.py has
        # the sweep; PERF.md round 5 + cont.: ~7x over brute at 27
        # modules, ~41x at 125, ~92x at 1000, bit-identical histograms)
        try:
            sys.path.insert(
                0,
                os.path.join(
                    os.path.dirname(os.path.abspath(__file__)), "tools"
                ),
            )
            from bench_detector_array import run_config as _array_cfg

            r = _array_cfg(3, "auto", 128 * 1024, 6, 3)
            detail["array27_bounces_per_s"] = r["bounces_per_s"]
            detail["array27_backend"] = r["resolved_backend"]
            detail["array27_seconds_spread"] = r["seconds_spread"]
        except Exception as e:  # keep the headline metric robust
            detail["array27_error"] = repr(e)[:200]

    if os.environ.get("BENCH_AUDIT") == "1":
        import subprocess

        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env.pop("JAX_COMPILATION_CACHE_DIR", None)
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--audit"],
            capture_output=True,
            text=True,
            env=env,
        )
        detail["cull_audit"] = (
            json.loads(r.stdout.strip().splitlines()[-1])
            if r.returncode == 0
            else {"error": r.stderr[-400:]}
        )

    print(
        json.dumps(
            {
                "metric": "photon-bounces/s/chip (scene tracing)",
                "value": value,
                "unit": "bounces/s",
                "vs_baseline": value / BASELINE,
                "detail": detail,
            }
        )
    )


if __name__ == "__main__":
    main()
