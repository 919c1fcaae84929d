"""On-device Owen-scrambled Sobol tests.

The reference ships a GPU Sobol sampler documented broken
(reference: src/theia/random.py:285-352, docs/pipeline/components.md:195-197);
ours must actually work: exact elementary-interval stratification, KS
uniformity, reproducibility, and a measured variance reduction vs Philox
when plugged into a tracer (VERDICT r1 item #7).
"""

import numpy as np
import pytest
from scipy.stats import kstest

import jax.numpy as jnp

from theia_tpu.random import (
    PhiloxRNG,
    SobolQRNG,
    rng_buffer,
    sobol_direction_numbers,
    sobol_owen_uniform,
)


def test_stratification_2d():
    """First 256 points of dims (0,1) occupy a 16x16 dyadic grid exactly
    once each — the (0,2)-sequence property survives Owen scrambling and
    the index shuffle."""
    for seed in (0, 1, 0xDEADBEEF):
        pts = SobolQRNG(seed=seed, dims=4).sample(256)
        h, _, _ = np.histogram2d(
            pts[:, 0], pts[:, 1], bins=16, range=[[0, 1], [0, 1]]
        )
        assert (h == 1).all(), seed


def test_stratification_1d_every_dim():
    """Each dim is a scrambled (0,1)-sequence: first 512 points fill 512
    dyadic bins exactly once."""
    pts = SobolQRNG(seed=3, dims=16).sample(512)
    for d in range(16):
        h, _ = np.histogram(pts[:, d], bins=512, range=(0, 1))
        assert (h == 1).all(), d


def test_batch_blocks_stay_stratified():
    """advance() moves to the next aligned block: the union of two
    512-point batches is the first 1024 points — still one per bin."""
    rng = SobolQRNG(seed=9, dims=2)
    a = rng.sample(512)
    rng.advance(512)
    b = rng.sample(512)
    h, _ = np.histogram(np.concatenate([a[:, 0], b[:, 0]]), bins=1024, range=(0, 1))
    assert (h == 1).all()


def test_ks_uniform_including_tail_dims():
    """KS uniformity for both Sobol dims and the hash fallback beyond."""
    rng = SobolQRNG(seed=11, dims=8)
    dirs = sobol_direction_numbers(8)
    idx = jnp.arange(4096, dtype=jnp.uint32)
    for d in (0, 3, 7, 8, 20):  # 8+ = tail fallback
        u = np.asarray(
            sobol_owen_uniform(dirs, jnp.uint32(11), idx, jnp.uint32(d))
        )
        assert 0.0 <= u.min() and u.max() < 1.0
        p = kstest(u, "uniform").pvalue
        assert p > 1e-3, (d, p)


def test_seed_decorrelates_and_reproduces():
    a = SobolQRNG(seed=1, dims=4).sample(128)
    b = SobolQRNG(seed=1, dims=4).sample(128)
    c = SobolQRNG(seed=2, dims=4).sample(128)
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 0.1


def test_integration_error_beats_philox():
    """RMSE of a smooth 4D integral over seeds: QMC must win clearly."""
    errs_q, errs_p = [], []
    for s in range(8):
        q = SobolQRNG(seed=s, dims=4).sample(1024)
        errs_q.append(np.prod(q[:, :4], axis=1).mean() - 1.0 / 16.0)
        p = np.asarray(rng_buffer(PhiloxRNG(key=s * 2654435761 + 13), 1024, 4))
        errs_p.append(np.prod(p, axis=1).mean() - 1.0 / 16.0)
    rmse_q = float(np.sqrt(np.mean(np.square(errs_q))))
    rmse_p = float(np.sqrt(np.mean(np.square(errs_p))))
    assert rmse_q < rmse_p / 5.0, (rmse_q, rmse_p)


@pytest.mark.slow
def test_tracer_variance_reduction():
    """Plugged into VolumeForwardTracer, Sobol reproduces the Philox light
    curve and reduces across-replicate variance (VERDICT done-criterion)."""
    import warnings

    from theia_tpu.light import SphericalLightSource, UniformWavelengthSource
    from theia_tpu.material import (
        DispersionFreeMedium,
        HenyeyGreensteinPhaseFunction,
        MediumModel,
    )
    from theia_tpu.response import HistogramHitResponse
    from theia_tpu.target import InnerSphereTarget
    from theia_tpu.trace import VolumeForwardTracer

    class Model(DispersionFreeMedium, HenyeyGreensteinPhaseFunction, MediumModel):
        def __init__(self):
            DispersionFreeMedium.__init__(
                self, n=1.33, ng=1.33, mu_a=0.005, mu_s=0.01
            )
            HenyeyGreensteinPhaseFunction.__init__(self, 0.3)

    medium = Model().createMedium(num_lambda=64, num_theta=64)

    def curve(rng):
        tracer = VolumeForwardTracer(
            4096,
            SphericalLightSource(
                position=(0.0, 0.0, 0.0), timeRange=(0.0, 0.0), budget=1e6
            ),
            InnerSphereTarget(position=(0.0, 0.0, 0.0), radius=50.0),
            UniformWavelengthSource(lambdaRange=(400.0, 500.0)),
            HistogramHitResponse(nBins=40, t0=0.0, binSize=20.0),
            rng,
            medium=medium,
            nScattering=6,
            scatterCoefficient=0.02,
        )
        h, _ = tracer.run()
        return np.asarray(h)

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        cp = np.stack(
            [curve(PhiloxRNG(key=0xABC0 + s * 2654435761)) for s in range(8)]
        )
        cq = np.stack([curve(SobolQRNG(seed=s, dims=64)) for s in range(8)])
    # same expectation
    rel = np.abs(cp.mean(0) - cq.mean(0)).sum() / cp.mean(0).sum()
    assert rel < 0.05, rel
    # and a real variance win (measured ~5x on this configuration)
    vp = cp.var(0, ddof=1).sum()
    vq = cq.var(0, ddof=1).sum()
    assert vq < 0.5 * vp, (vp, vq)


def test_stream_is_lane_id_after_advance():
    """SobolState.stream must stay the pure lane id across batches
    (RNGState contract — Host* components index host buffers with it);
    the batch offset lives in .offset and only shifts the sample index."""
    rng = SobolQRNG(seed=5, dims=4)
    rng.advance(1024)  # capacity not a multiple of the host buffer below
    lanes = jnp.arange(64, dtype=jnp.uint32)
    st = rng.state_for(rng.counter_words, lanes)
    np.testing.assert_array_equal(np.asarray(st.stream), np.arange(64))
    np.testing.assert_array_equal(np.asarray(st.index), np.arange(64) + 1024)

    from theia_tpu.light import HostWavelengthSource

    src = HostWavelengthSource(np.linspace(400.0, 500.0, 1000, dtype=np.float32))
    (lam, _), _ = src.sample(
        {k: jnp.asarray(v) for k, v in src.params().items()}, st
    )
    np.testing.assert_array_equal(
        np.asarray(lam), src.wavelength[np.arange(64) % 1000]
    )


def test_buffer_sink_sobol_blocks_disjoint():
    """RNGBufferSink must advance a Sobol generator by *rows*: consecutive
    run() blocks share no values (regression: advancing by draws made
    block 2 overlap rows 4.. of block 1)."""
    from theia_tpu.random import RNGBufferSink

    sink = RNGBufferSink(SobolQRNG(seed=3, dims=8), streams=32, samples=4)
    a = sink.run()
    b = sink.run()
    assert not (a[:, None, :] == b[None, :, :]).all(-1).any(), (
        "overlapping Sobol rows between consecutive sink blocks"
    )
    # and over-asking the generator's dims fails loudly, not truncated
    deep = RNGBufferSink(SobolQRNG(seed=3, dims=8), streams=16, samples=16)
    with pytest.raises(ValueError, match="draws per stream"):
        deep.run()
