"""Debug renderer and scene templates.

:class:`SceneRender` is a simple orthographic ray caster for inspecting
scenes — colors encode surface normals (reference:
src/theia/scene.py:938-1133, shader/scene.render.glsl).

:class:`SceneTemplate` stamps a template scene (instances with named
materials and detector ids) across a list of transforms — for detector
arrays (reference: src/theia/scene.py:713-935; the reference loads 3D
files via trimesh's scene graph, here templates are described
programmatically since the environment ships no trimesh)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .accel import intersect_scene
from .scene import MeshInstance, RectBBox, Scene, Transform

__all__ = ["SceneRender", "SceneTemplate"]


class SceneRender:
    """Orthographic normal-shaded debug renderer."""

    def __init__(
        self,
        *,
        width: int = 1024,
        height: int = 1024,
        dimension=(1.0, 1.0),
        position=(0.0, 0.0, 0.0),
        direction=(0.0, 1.0, 0.0),
        up=(0.0, 0.0, 1.0),
        maxDistance: float = 100.0,
    ) -> None:
        self.width = width
        self.height = height
        self.dimension = dimension
        self.position = position
        self.direction = direction
        self.up = up
        self.maxDistance = maxDistance

    def render(self, scene: Scene) -> np.ndarray:
        """Render the scene to an (H, W, 4) uint8 RGBA image."""
        pack = scene.pack
        w, h = self.width, self.height
        d = np.asarray(self.direction, np.float64)
        d /= np.linalg.norm(d)
        upv = np.asarray(self.up, np.float64)
        right = np.cross(d, upv)
        right /= np.linalg.norm(right)
        upv = np.cross(right, d)

        xs = (np.arange(w) / (w - 1) - 0.5) * self.dimension[0]
        ys = (np.arange(h) / (h - 1) - 0.5) * self.dimension[1]
        gx, gy = np.meshgrid(xs, ys)
        origins = (
            np.asarray(self.position)[None, None]
            + gx[..., None] * right[None, None]
            + gy[..., None] * upv[None, None]
        ).reshape(-1, 3)
        dirs = np.broadcast_to(d, origins.shape)

        @jax.jit
        def cast(origin, direction):
            hit = intersect_scene(
                pack,
                jnp.asarray(pack.medium) * jnp.ones(origin.shape[0], jnp.int32),
                origin,
                direction,
                jnp.float32(self.maxDistance),
            )
            # colors encode the outward normal; white background
            rgb = 0.5 * (hit.ray_nrm + 1.0)
            color = jnp.where(hit.valid[:, None], rgb, 1.0)
            return color, hit.t

        color, t = cast(
            jnp.asarray(origins, jnp.float32), jnp.asarray(dirs, jnp.float32)
        )
        img = np.ones((h * w, 4), np.float32)
        img[:, :3] = np.asarray(color)
        return (img.reshape(h, w, 4) * 255).astype(np.uint8)


class SceneTemplate:
    """A reusable set of instance blueprints to stamp across transforms."""

    def __init__(self, instances: list[MeshInstance]) -> None:
        self._instances = instances
        self._next_detector = max(
            (i.detectorId for i in instances), default=-1
        ) + 1

    @property
    def instances(self) -> list[MeshInstance]:
        return self._instances

    def createScene(
        self,
        transforms: list[Transform],
        materials,
        *,
        medium: str | None = None,
        bbox: RectBBox | None = None,
        assignDetectorIds: bool = True,
        accel: str = "auto",
        leaf_size: int = 8,
    ) -> Scene:
        """Stamp the template once per transform
        (reference: src/theia/scene.py:713-935 SceneTemplate)."""
        out = []
        det = 0
        for trafo in transforms:
            for proto in self._instances:
                inst = MeshInstance(
                    proto.key,
                    proto.mesh,
                    proto.material,
                    trafo @ proto.transform,
                    det if assignDetectorIds else proto.detectorId,
                )
                out.append(inst)
            det += 1
        return Scene(
            out,
            materials,
            medium=medium,
            bbox=bbox,
            accel=accel,
            leaf_size=leaf_size,
        )
