"""Wavefront OBJ loader (+ minimal MTL).

The reference consumes meshes through Unity's asset pipeline; the framework
needs standalone loaders.  Supports v/vn/vt, polygon triangulation (fan),
negative indices, usemtl grouping, and a pragmatic MTL subset mapped onto
the metallic-roughness material model (Kd -> baseColor, Ke -> emission,
Ns -> roughness, d -> opacity, Ni -> ior).
"""

from __future__ import annotations

import os

import numpy as np

from unity_webgpu_pathtracer_tpu.scene.material import MaterialDesc
from unity_webgpu_pathtracer_tpu.scene.mesh import Mesh
from unity_webgpu_pathtracer_tpu.scene.scene import Scene


def load_mtl(path: str) -> dict[str, MaterialDesc]:
    materials = {}
    cur = None
    if not os.path.exists(path):
        return materials
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts or parts[0].startswith("#"):
                continue
            key = parts[0]
            if key == "newmtl":
                cur = MaterialDesc()
                materials[parts[1]] = cur
            elif cur is None:
                continue
            elif key == "Kd":
                kd = tuple(float(x) for x in parts[1:4])
                cur.base_color = (*kd, cur.base_color[3])
            elif key == "Ke":
                cur.emission = tuple(float(x) for x in parts[1:4])
            elif key == "Ns":
                # Phong exponent -> perceptual roughness.
                cur.roughness = float(np.clip(1.0 - np.sqrt(float(parts[1]) / 1000.0), 0.02, 1.0))
            elif key == "d":
                a = float(parts[1])
                cur.base_color = (*cur.base_color[:3], a)
                if a < 1.0:
                    cur.alpha_mode = 1  # blend
            elif key == "Ni":
                cur.ior = float(parts[1])
            elif key == "Pm":  # PBR extension: metallic
                cur.metallic = float(parts[1])
            elif key == "Pr":  # PBR extension: roughness
                cur.roughness = float(parts[1])
    return materials


def load_obj(path: str) -> Scene:
    """Load an OBJ file into a Scene (one mesh per material group)."""
    positions, normals, uvs = [], [], []
    groups: dict[str, list] = {}
    current = "default"
    mtl: dict[str, MaterialDesc] = {}

    def resolve(idx, n):
        i = int(idx)
        return i - 1 if i > 0 else n + i

    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts or parts[0].startswith("#"):
                continue
            key = parts[0]
            if key == "v":
                positions.append([float(x) for x in parts[1:4]])
            elif key == "vn":
                normals.append([float(x) for x in parts[1:4]])
            elif key == "vt":
                uvs.append([float(x) for x in parts[1:3]])
            elif key == "mtllib":
                mtl.update(load_mtl(os.path.join(os.path.dirname(path), parts[1])))
            elif key == "usemtl":
                current = parts[1]
            elif key == "f":
                corners = []
                for vert in parts[1:]:
                    comps = vert.split("/")
                    vi = resolve(comps[0], len(positions))
                    ti = resolve(comps[1], len(uvs)) if len(comps) > 1 and comps[1] else -1
                    ni = resolve(comps[2], len(normals)) if len(comps) > 2 and comps[2] else -1
                    corners.append((vi, ti, ni))
                for k in range(1, len(corners) - 1):  # fan triangulation
                    groups.setdefault(current, []).append(
                        (corners[0], corners[k], corners[k + 1])
                    )

    scene = Scene()
    positions = np.asarray(positions, np.float32)
    normals_a = np.asarray(normals, np.float32) if normals else None
    uvs_a = np.asarray(uvs, np.float32) if uvs else None

    for name, faces in groups.items():
        mat_id = scene.add_material(mtl.get(name, MaterialDesc()))
        # Re-index per group: unique (v, t, n) corners become vertices.
        corner_map: dict[tuple, int] = {}
        verts, vnorms, vuvs, tris = [], [], [], []
        for tri in faces:
            idxs = []
            for corner in tri:
                if corner not in corner_map:
                    corner_map[corner] = len(verts)
                    vi, ti, ni = corner
                    verts.append(positions[vi])
                    vnorms.append(normals_a[ni] if (normals_a is not None and ni >= 0)
                                  else np.zeros(3, np.float32))
                    vuvs.append(uvs_a[ti] if (uvs_a is not None and ti >= 0)
                                else np.zeros(2, np.float32))
                idxs.append(corner_map[corner])
            tris.append(idxs)
        has_normals = normals_a is not None and any(np.any(n) for n in vnorms[:1])
        mesh = Mesh(
            vertices=np.asarray(verts, np.float32),
            indices=np.asarray(tris, np.int32),
            normals=np.asarray(vnorms, np.float32) if has_normals else None,
            uvs=np.asarray(vuvs, np.float32) if uvs_a is not None else None,
            material_index=mat_id,
        )
        scene.add_mesh(mesh)
    return scene
