"""Tests for testing helpers, estimators, replay, renderer and templates."""

import numpy as np

import jax.numpy as jnp

import theia_tpu.units as u
from theia_tpu.camera import SphereCamera
from theia_tpu.light import SphericalLightSource, UniformWavelengthSource
from theia_tpu.material import Material, MaterialStore
from theia_tpu.random import PhiloxRNG
from theia_tpu.render import SceneRender, SceneTemplate
from theia_tpu.response import (
    HistogramEstimator,
    HistogramHitResponse,
    HitRecorder,
    HostEstimator,
    StoreValueHitResponse,
    replay_hits,
    sample_camera_hits,
)
from theia_tpu.scene import MeshStore, Scene, Transform
from theia_tpu.target import InnerSphereTarget, SphereTarget
from theia_tpu.testing import (
    WaterTestModel,
    sampleCameraRay,
    sampleLight,
    sampleTarget,
    sampleWavelength,
)
from theia_tpu.trace import VolumeForwardTracer

ASSETS = "/root/reference/assets"


def test_samplers_shapes():
    ray = sampleLight(SphericalLightSource(budget=3.0), 256)
    assert ray.position.shape == (256, 3) and np.allclose(ray.contrib, 3.0)
    lam, contrib = sampleWavelength(
        UniformWavelengthSource(lambdaRange=(400.0, 500.0)), 256
    )
    assert lam.min() >= 400.0 and lam.max() <= 500.0
    cam = sampleCameraRay(SphereCamera(radius=2.0), 128)
    assert cam.direction.shape == (128, 3)
    tgt = sampleTarget(SphereTarget(radius=1.0), (5.0, 0.0, 0.0), 128)
    assert tgt.valid.all()


def _run_recorder(batch=8 * 1024):
    medium = WaterTestModel(g=0.4).createMedium()
    rec = HitRecorder()
    tracer = VolumeForwardTracer(
        batch,
        SphericalLightSource(position=(0.0, 0.0, 0.0), timeRange=(0.0, 0.0), budget=1e6),
        InnerSphereTarget(position=(0.0, 0.0, 0.0), radius=40.0),
        UniformWavelengthSource(lambdaRange=(400.0, 500.0)),
        rec,
        PhiloxRNG(key=0xC0FFEE),
        medium=medium,
        nScattering=6,
        scatterCoefficient=0.03,
    )
    hits, _ = tracer.run()
    return hits, batch


def test_replay_hits_matches_histogram():
    hits, batch = _run_recorder()
    resp = HistogramHitResponse(nBins=40, t0=0.0, binSize=20.0, normalization=1.0)
    hist = np.asarray(replay_hits(hits, resp))
    valid = np.asarray(hits["valid"])
    expected, _ = np.histogram(
        np.asarray(hits["time"])[valid],
        bins=40,
        range=(0.0, 800.0),
        weights=np.asarray(hits["contrib"])[valid].astype(np.float64),
    )
    assert np.allclose(hist, expected, rtol=2e-3)


def test_store_value_and_estimators():
    medium = WaterTestModel(g=0.4).createMedium()
    store = StoreValueHitResponse()
    tracer = VolumeForwardTracer(
        4 * 1024,
        SphericalLightSource(position=(0.0, 0.0, 0.0), timeRange=(0.0, 0.0), budget=1e6),
        InnerSphereTarget(position=(0.0, 0.0, 0.0), radius=40.0),
        UniformWavelengthSource(lambdaRange=(400.0, 500.0)),
        store,
        PhiloxRNG(key=0xC0FFEE),
        medium=medium,
        nScattering=6,
        scatterCoefficient=0.03,
    )
    queue, _ = tracer.run()
    est = HistogramEstimator(nBins=40, t0=0.0, binSize=20.0)
    hist = est(queue)
    host = HostEstimator()(queue)
    assert hist.sum() > 0
    assert np.isclose(hist.sum(), host["value"][host["time"] < 800.0].sum())


def test_sample_camera_hits():
    resp = HistogramHitResponse(nBins=10, t0=0.0, binSize=1.0, normalization=1.0)
    hist = np.asarray(sample_camera_hits(SphereCamera(radius=1.0), resp, 512))
    # all camera hits arrive at timeDelta=0 -> first bin
    assert hist[0] > 0 and hist[1:].sum() == 0


def test_scene_render():
    mat = Material("white", None, None, flags="B")
    store = MaterialStore.pack([mat])
    meshes = MeshStore({"sphere": f"{ASSETS}/sphere.stl"})
    inst = meshes.createInstance(
        "sphere", "white", Transform.TRS(scale=1.0, translate=(0.0, 5.0, 0.0))
    )
    scene = Scene([inst], store, medium=None)
    img = SceneRender(
        width=64,
        height=64,
        dimension=(4.0, 4.0),
        position=(0.0, 0.0, 0.0),
        direction=(0.0, 1.0, 0.0),
        maxDistance=20.0,
    ).render(scene)
    assert img.shape == (64, 64, 4)
    # center pixel hits the sphere (normal -y -> color encodes it),
    # corners miss (white)
    assert tuple(img[0, 0, :3]) == (255, 255, 255)
    assert tuple(img[32, 32, :3]) != (255, 255, 255)


def test_scene_template_stamping():
    mat = Material("det", None, None, flags="DB")
    store = MaterialStore.pack([mat])
    meshes = MeshStore({"sphere": f"{ASSETS}/sphere.stl"})
    proto = meshes.createInstance("sphere", "det", scale=0.5)
    template = SceneTemplate([proto])
    transforms = [
        Transform.Translation(0.0, 0.0, 0.0),
        Transform.Translation(5.0, 0.0, 0.0),
        Transform.Translation(0.0, 5.0, 0.0),
    ]
    scene = template.createScene(transforms, store, medium=None)
    assert len(scene.instances) == 3
    ids = sorted(i.detectorId for i in scene.instances)
    assert ids == [0, 1, 2]
    # stamped instances land at the right positions
    centers = [i.bbox for i in scene.instances]
    assert np.allclose(
        0.5 * (np.asarray(centers[1].lowerCorner) + np.asarray(centers[1].upperCorner)),
        (5.0, 0.0, 0.0),
        atol=1e-5,
    )
