"""Triangle meshes and flattening to the renderer's flat-array contract.

The reference flattens Unity meshes on the GPU (``MeshProcessing.compute``):
one thread per triangle decodes the vertex buffer, transforms to world space
(identity when a TLAS keeps meshes local, ``BVHScene.cs:497-511``), and emits
``float4`` vertex triples plus 128-byte ``TriangleAttributes``.  Scene build
here is a once-per-scene host step, so the same flattening runs in vectorized
numpy and emits:

* ``tris (M, 9)`` float32 — precomputed ``[e2, e1, v0]`` Möller-Trumbore
  records (the reference's ``BVHTris`` layout, ``tiny_bvh.h:5963-5968``),
* attribute arrays per triangle-vertex (normals/tangents/uvs/material).
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class Mesh:
    """Host-side indexed triangle mesh."""

    vertices: np.ndarray                 # (V, 3) float32
    indices: np.ndarray                  # (F, 3) int32
    normals: np.ndarray | None = None    # (V, 3)
    tangents: np.ndarray | None = None   # (V, 3)
    uvs: np.ndarray | None = None        # (V, 2)
    material_index: int = 0

    def __post_init__(self):
        self.vertices = np.asarray(self.vertices, np.float32).reshape(-1, 3)
        self.indices = np.asarray(self.indices, np.int32).reshape(-1, 3)
        if self.normals is not None:
            self.normals = np.asarray(self.normals, np.float32).reshape(-1, 3)
        if self.tangents is not None:
            self.tangents = np.asarray(self.tangents, np.float32).reshape(-1, 3)
        if self.uvs is not None:
            self.uvs = np.asarray(self.uvs, np.float32).reshape(-1, 2)

    @property
    def triangle_count(self) -> int:
        return self.indices.shape[0]

    def compute_vertex_normals(self) -> np.ndarray:
        """Area-weighted smooth normals for meshes that ship without them."""
        v = self.vertices
        f = self.indices
        fn = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
        n = np.zeros_like(v)
        for k in range(3):
            np.add.at(n, f[:, k], fn)
        lens = np.linalg.norm(n, axis=-1, keepdims=True)
        return (n / np.maximum(lens, 1e-20)).astype(np.float32)


@dataclasses.dataclass
class FlatTriangles:
    """Flattened per-triangle arrays (the GPU-buffer contract)."""

    positions: np.ndarray   # (F, 3, 3) triangle vertices
    normals: np.ndarray     # (F, 3, 3)
    tangents: np.ndarray    # (F, 3, 3)
    uvs: np.ndarray         # (F, 3, 2)
    material: np.ndarray    # (F,) int32

    @property
    def count(self) -> int:
        return self.positions.shape[0]

    def tri_records(self) -> np.ndarray:
        """(F, 9) float32 ``[e2, e1, v0]`` intersection records."""
        v0 = self.positions[:, 0]
        e1 = self.positions[:, 1] - v0
        e2 = self.positions[:, 2] - v0
        return np.concatenate([e2, e1, v0], axis=-1).astype(np.float32)


def flatten_mesh(mesh: Mesh, transform: np.ndarray | None = None,
                 material_index: int | None = None) -> FlatTriangles:
    """Flatten one mesh, optionally transforming to world space.

    Normal transform uses the inverse-transpose like
    ``MeshProcessing.compute:112-114``.
    """
    f = mesh.indices
    v = mesh.vertices
    n = mesh.normals if mesh.normals is not None else mesh.compute_vertex_normals()
    t = mesh.tangents
    uv = mesh.uvs

    if transform is not None:
        m = np.asarray(transform, np.float64)
        v = (v @ m[:3, :3].T + m[:3, 3]).astype(np.float32)
        nit = np.linalg.inv(m[:3, :3]).T
        n = n @ nit.T
        n = (n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)).astype(np.float32)
        if t is not None:
            t = (t @ m[:3, :3].T).astype(np.float32)

    fcount = f.shape[0]
    positions = v[f]                       # (F,3,3)
    normals = n[f]
    if t is None:
        # Arbitrary tangent frame; the BSDF uses an ONB from the normal
        # (the reference's tangent path is disabled, brdf.hlsl:230-232).
        tangents = np.zeros_like(normals)
        tangents[..., 0] = 1.0
    else:
        tangents = t[f]
    uvs = uv[f] if uv is not None else np.zeros((fcount, 3, 2), np.float32)
    mat = np.full(
        (fcount,),
        mesh.material_index if material_index is None else material_index,
        np.int32,
    )
    return FlatTriangles(
        positions=positions.astype(np.float32),
        normals=normals.astype(np.float32),
        tangents=tangents.astype(np.float32),
        uvs=uvs.astype(np.float32),
        material=mat,
    )


def concat_flat(parts: list[FlatTriangles]) -> FlatTriangles:
    return FlatTriangles(
        positions=np.concatenate([p.positions for p in parts], 0),
        normals=np.concatenate([p.normals for p in parts], 0),
        tangents=np.concatenate([p.tangents for p in parts], 0),
        uvs=np.concatenate([p.uvs for p in parts], 0),
        material=np.concatenate([p.material for p in parts], 0),
    )
