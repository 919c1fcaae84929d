"""Woop/MXU intersection kernel: parity with the brute-force scan.

The kernel runs in Pallas interpret mode off-TPU (tests are CPU); on the
chip the same code path is exercised by bench.py with
``Scene(accel="woop")``.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from theia_tpu.accel import _nearest_triangle, intersect_scene
from theia_tpu.material import (
    DispersionFreeMedium,
    HenyeyGreensteinPhaseFunction,
    Material,
    MaterialStore,
    MediumModel,
)
from theia_tpu.ops.intersect_woop import nearest_triangle_woop, pack_woop
from theia_tpu.scene import MeshStore, Scene, Transform

ASSETS = "/root/reference/assets"


class Model(DispersionFreeMedium, HenyeyGreensteinPhaseFunction, MediumModel):
    ModelName = "medium"

    def __init__(self):
        DispersionFreeMedium.__init__(self, n=1.33, ng=1.33, mu_a=0.01, mu_s=0.1)
        HenyeyGreensteinPhaseFunction.__init__(self, 0.5)


def build_scene(accel):
    mat = Material("m", Model().createMedium(num_lambda=8), None, flags="TR")
    store = MaterialStore.pack([mat])
    meshes = MeshStore(
        {"sphere": f"{ASSETS}/sphere.stl", "suzanne": f"{ASSETS}/suzanne.stl"}
    )
    insts = [
        meshes.createInstance("sphere", "m", Transform.TRS(scale=2.0)),
        meshes.createInstance(
            "suzanne", "m", Transform.TRS(scale=1.0, translate=(4.0, 0.0, 0.0))
        ),
    ]
    return Scene(insts, store, medium=None, accel=accel)


def test_woop_matches_bruteforce():
    scene = build_scene("woop")
    pack = scene.pack
    assert pack.woop is not None

    n = 2048
    ks = jax.random.split(jax.random.PRNGKey(3), 2)
    o = jax.random.uniform(ks[0], (n, 3), jnp.float32, -3.0, 6.0)
    d = jax.random.normal(ks[1], (n, 3), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    t_b, i_b = _nearest_triangle(pack, o, d, jnp.inf, 256)
    t_w, i_w = nearest_triangle_woop(pack.woop, o, d, jnp.inf)

    t_b, i_b, t_w, i_w = map(np.asarray, (t_b, i_b, t_w, i_w))
    hit_b = i_b >= 0
    assert (hit_b == (i_w >= 0)).mean() > 0.999
    both = hit_b & (i_w >= 0)
    assert both.sum() > 200
    assert np.allclose(t_w[both], t_b[both], rtol=1e-4, atol=1e-5)
    assert (i_b[both] == i_w[both]).mean() > 0.995


def test_woop_full_hit_reconstruction():
    """intersect_scene with the woop backend returns the same SurfaceHit
    as the brute backend (same Morton triangle order)."""
    scene = build_scene("woop")
    pack = scene.pack
    n = 512
    ks = jax.random.split(jax.random.PRNGKey(5), 2)
    o = jax.random.uniform(ks[0], (n, 3), jnp.float32, -3.0, 6.0)
    d = jax.random.normal(ks[1], (n, 3), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    medium = jnp.zeros(n, jnp.int32)

    hit_w = intersect_scene(pack, medium, o, d, 1e4)
    # brute on the SAME pack (woop field removed -> brute path)
    import dataclasses

    pack_b = dataclasses.replace(pack, woop=None)
    hit_b = intersect_scene(pack_b, medium, o, d, 1e4)

    assert (np.asarray(hit_w.valid) == np.asarray(hit_b.valid)).all()
    v = np.asarray(hit_b.valid)
    for field in ("t", "world_pos", "obj_pos", "obj_nrm", "ray_nrm"):
        a = np.asarray(getattr(hit_w, field))[v]
        b = np.asarray(getattr(hit_b, field))[v]
        assert np.allclose(a, b, rtol=1e-4, atol=1e-5), field
    for field in ("instance", "custom_id", "flags", "inward", "medium_tr"):
        a = np.asarray(getattr(hit_w, field))[v]
        b = np.asarray(getattr(hit_b, field))[v]
        assert (a == b).all(), field


def test_mt_pallas_matches_bruteforce():
    """The VPU Moeller-Trumbore Pallas kernel (accel='mt') agrees with the
    brute scan on hits, distances and full SurfaceHit reconstruction."""
    import dataclasses

    scene = build_scene("mt")
    pack = scene.pack
    assert pack.mt is not None

    n = 2048
    ks = jax.random.split(jax.random.PRNGKey(11), 2)
    o = jax.random.uniform(ks[0], (n, 3), jnp.float32, -3.0, 6.0)
    d = jax.random.normal(ks[1], (n, 3), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    medium = jnp.zeros(n, jnp.int32)

    hit_m = intersect_scene(pack, medium, o, d, 1e4)
    pack_b = dataclasses.replace(pack, mt=None)
    hit_b = intersect_scene(pack_b, medium, o, d, 1e4)

    assert (np.asarray(hit_m.valid) == np.asarray(hit_b.valid)).all()
    v = np.asarray(hit_b.valid)
    assert v.sum() > 200
    for field in ("t", "world_pos", "obj_pos", "obj_nrm", "ray_nrm"):
        a = np.asarray(getattr(hit_m, field))[v]
        b = np.asarray(getattr(hit_b, field))[v]
        assert np.allclose(a, b, rtol=1e-4, atol=1e-5), field
    for field in ("instance", "custom_id", "flags", "inward", "medium_tr"):
        a = np.asarray(getattr(hit_m, field))[v]
        b = np.asarray(getattr(hit_b, field))[v]
        assert (a == b).all(), field


def test_mt_pallas_finite_tmax():
    """Per-ray finite t_max: hits beyond the bound are rejected exactly
    like the brute scan (drives the kernel's slab-culling path)."""
    scene = build_scene("mt")
    pack = scene.pack
    n = 1024
    ks = jax.random.split(jax.random.PRNGKey(13), 3)
    o = jax.random.uniform(ks[0], (n, 3), jnp.float32, -3.0, 6.0)
    d = jax.random.normal(ks[1], (n, 3), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    tm = jax.random.uniform(ks[2], (n,), jnp.float32, 0.1, 6.0)

    from theia_tpu.ops.intersect_mt_pallas import nearest_triangle_mt

    t_m, i_m = nearest_triangle_mt(pack.mt, o, d, tm)
    t_b, i_b = _nearest_triangle(pack, o, d, tm, 256)
    t_m, i_m, t_b, i_b = map(np.asarray, (t_m, i_m, t_b, i_b))
    assert (i_m == i_b).all()
    hit = i_b >= 0
    assert hit.sum() > 50
    # kernel uses a Newton-refined approximate reciprocal: ~1e-6 relative
    assert np.allclose(t_m[hit], t_b[hit], rtol=1e-4, atol=1e-5)
