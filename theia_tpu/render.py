"""Debug renderer and scene templates.

:class:`SceneRender` is a simple orthographic ray caster for inspecting
scenes — colors encode surface normals (reference:
src/theia/scene.py:938-1133, shader/scene.render.glsl).

:class:`SceneTemplate` stamps a template scene (instances with named
materials and detector ids) across a list of transforms — for detector
arrays (reference: src/theia/scene.py:713-935). Templates are built
programmatically from :class:`MeshInstance` lists or loaded from OBJ
files with named objects + material tags (:meth:`SceneTemplate.fromFile`,
matching the reference's trimesh-scene-graph loading)."""

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
    """A reusable set of instance blueprints to stamp across transforms.

    Built either programmatically from :class:`MeshInstance` blueprints or
    from an OBJ file carrying named objects + material assignments
    (:meth:`fromFile` — the reference's file-based template path,
    src/theia/scene.py:750-817). File templates use the reference's
    detector-id *stride* semantics: each stamped copy offsets all nonzero
    detector ids by ``idStride`` so every detector in the array stays
    uniquely addressable (ref src/theia/scene.py:905-931)."""

    def __init__(
        self, instances: list[MeshInstance], *, idStride: int | None = None
    ) -> None:
        self._instances = instances
        self._id_stride = idStride
        self._next_detector = max(
            (i.detectorId for i in instances), default=-1
        ) + 1

    @classmethod
    def fromFile(
        cls,
        file,
        *,
        templateTransform: Transform | None = None,
        detectorIdMap: dict[str, int] | None = None,
        detectorMaterial: set[str] | None = None,
    ) -> "SceneTemplate":
        """Load a template from an OBJ file with named objects + usemtl
        material tags (reference: src/theia/scene.py:750-817, which reads
        the same metadata through trimesh).

        Detector-id assignment mirrors the reference: an explicit
        ``detectorIdMap`` (unmapped instances get 0), or unique ids for
        instances whose material is in ``detectorMaterial``, or — by
        default — a unique id per instance starting from 1."""
        from .mesh import loadObjScene

        objs = loadObjScene(file)
        next_id = 1
        instances = []
        for o in objs:
            if not o.material:
                raise ValueError(f'Mesh "{o.name}" has no material assigned!')
            if detectorIdMap is not None:
                det = detectorIdMap.get(o.name, 0)
            elif detectorMaterial is not None:
                det = 0
                if o.material in detectorMaterial:
                    det = next_id
                    next_id += 1
            else:
                det = next_id
                next_id += 1
            trafo = (
                templateTransform if templateTransform is not None else Transform()
            )
            instances.append(MeshInstance(o.name, o.mesh, o.material, trafo, det))
        return cls(instances, idStride=next_id - 1)

    @property
    def instances(self) -> list[MeshInstance]:
        return self._instances

    @property
    def idStride(self) -> int | None:
        """Detector-id offset between stamped copies (file templates)."""
        return self._id_stride

    def detectorIds(
        self, nCopies: int, *, detectorIdStride: int | None = None
    ) -> dict[tuple[str, int], int]:
        """Map (instance name, copy index) -> detectorId for a stamped
        scene (the reference returns this map from createScene,
        src/theia/scene.py:911-921).

        Mirrors ``createScene``'s assignment exactly: stride-based offsets
        for file templates (nonzero proto ids only); for programmatic
        templates (no stride) every instance of copy ``i`` gets id ``i``."""
        stride = detectorIdStride if detectorIdStride is not None else (
            self._id_stride
        )
        out = {}
        for i in range(nCopies):
            for proto in self._instances:
                if stride is not None:
                    if proto.detectorId != 0:
                        out[(proto.key, i)] = proto.detectorId + i * stride
                else:
                    out[(proto.key, i)] = i
        return out

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
        detectorIdStride: int | None = None,
        sceneTransform: Transform | None = None,
    ) -> Scene:
        """Stamp the template once per transform
        (reference: src/theia/scene.py:713-935 SceneTemplate).

        In-memory templates assign one detector id per stamped copy;
        file templates (``idStride`` set) offset each copy's nonzero
        instance ids by the stride instead."""
        stride = detectorIdStride if detectorIdStride is not None else (
            self._id_stride
        )
        out = []
        det = 0
        for i, trafo in enumerate(transforms):
            for proto in self._instances:
                if not assignDetectorIds:
                    det_id = proto.detectorId
                elif stride is not None:
                    det_id = (
                        proto.detectorId + i * stride
                        if proto.detectorId != 0
                        else 0
                    )
                else:
                    det_id = det
                t = trafo @ proto.transform
                if sceneTransform is not None:
                    t = sceneTransform @ t
                inst = MeshInstance(
                    proto.key,
                    proto.mesh,
                    proto.material,
                    t,
                    det_id,
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
