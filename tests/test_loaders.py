"""OBJ and glTF/GLB loader round-trip tests on synthesized assets."""

import json
import struct

import numpy as np

from unity_webgpu_pathtracer_tpu.scene.gltf import load_gltf
from unity_webgpu_pathtracer_tpu.scene.obj import load_obj


OBJ_TEXT = """
# test cube corner
mtllib test.mtl
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vn 0 0 1
vt 0 0
vt 1 0
vt 1 1
vt 0 1
usemtl red
f 1/1/1 2/2/1 3/3/1 4/4/1
"""

MTL_TEXT = """
newmtl red
Kd 0.8 0.1 0.1
Ke 0.0 0.0 0.0
Ns 250
Ni 1.45
"""


def test_obj_loader(tmp_path):
    (tmp_path / "test.obj").write_text(OBJ_TEXT)
    (tmp_path / "test.mtl").write_text(MTL_TEXT)
    scene = load_obj(str(tmp_path / "test.obj"))
    assert len(scene.meshes) == 1
    mesh, _ = scene.meshes[0]
    assert mesh.triangle_count == 2          # quad fan-triangulated
    assert mesh.vertices.shape == (4, 3)
    assert np.allclose(mesh.normals, [0, 0, 1])
    mat = scene.materials[mesh.material_index]
    assert np.allclose(mat.base_color[:3], (0.8, 0.1, 0.1))
    assert abs(mat.ior - 1.45) < 1e-6
    # Renders end-to-end.
    data = scene.build("wide")
    assert data.tris.shape[0] == 2


def _make_glb(path):
    positions = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    normals = np.tile(np.array([0, 0, 1], np.float32), (3, 1))
    indices = np.array([0, 1, 2], np.uint16)
    bin_data = positions.tobytes() + normals.tobytes() + indices.tobytes()
    pad = (4 - len(bin_data) % 4) % 4
    bin_data += b"\x00" * pad
    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0, "translation": [1.0, 2.0, 3.0]}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "NORMAL": 1},
            "indices": 2, "material": 0,
        }]}],
        "materials": [{"pbrMetallicRoughness": {
            "baseColorFactor": [0.2, 0.4, 0.6, 1.0],
            "metallicFactor": 0.3, "roughnessFactor": 0.7,
        }}],
        "buffers": [{"byteLength": len(bin_data)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 36},
            {"buffer": 0, "byteOffset": 72, "byteLength": 6},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 2, "componentType": 5123, "count": 3, "type": "SCALAR"},
        ],
    }
    js = json.dumps(gltf).encode()
    js += b" " * ((4 - len(js) % 4) % 4)
    total = 12 + 8 + len(js) + 8 + len(bin_data)
    with open(path, "wb") as f:
        f.write(struct.pack("<III", 0x46546C67, 2, total))
        f.write(struct.pack("<II", len(js), 0x4E4F534A))
        f.write(js)
        f.write(struct.pack("<II", len(bin_data), 0x004E4942))
        f.write(bin_data)


def test_glb_loader(tmp_path):
    path = str(tmp_path / "tri.glb")
    _make_glb(path)
    scene = load_gltf(path)
    assert len(scene.meshes) == 1
    mesh, transform = scene.meshes[0]
    assert mesh.triangle_count == 1
    # Node translation applied as the mesh transform.
    np.testing.assert_allclose(transform[:3, 3], [1, 2, 3], atol=1e-6)
    mat = scene.materials[mesh.material_index]
    assert np.allclose(mat.base_color, (0.2, 0.4, 0.6, 1.0))
    assert mat.metallic == 0.3 and mat.roughness == 0.7
    data = scene.build("wide")
    assert data.tris.shape[0] == 1


def test_glb_instancing_mode(tmp_path):
    path = str(tmp_path / "tri.glb")
    _make_glb(path)
    scene = load_gltf(path, use_instancing=True)
    assert len(scene.instances) == 1
    data = scene.build("wide")
    assert data.inst_l2w.shape[0] == 1
