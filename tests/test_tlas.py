"""TLAS/instancing: instanced render must match the equivalent flattened
(world-space baked) scene, including rotation/scale/material overrides."""

import numpy as np
import pytest

from unity_webgpu_pathtracer_tpu.api import Renderer
from unity_webgpu_pathtracer_tpu.config import SKY_MODE_ENVIRONMENT, RenderConfig
from unity_webgpu_pathtracer_tpu.models import primitives as prim
from unity_webgpu_pathtracer_tpu.render.camera import make_camera_params
from unity_webgpu_pathtracer_tpu.scene.material import MaterialDesc
from unity_webgpu_pathtracer_tpu.scene.scene import Scene

SIZE = 48
CAM = dict(eye=(0, 1.5, 6.0), target=(0, 0.0, 0), fov_y_deg=45.0)
TRANSFORMS = [
    prim.transform_trs(translate=(-1.5, 0, 0), rotate_y=0.7, scale=0.8),
    prim.transform_trs(translate=(1.5, 0.3, 0), rotate_y=-0.4, scale=1.3),
    prim.transform_trs(translate=(0, -0.8, 1.0), scale=(1.5, 0.6, 1.0)),
]


def _materials(scene):
    return [
        scene.add_material(MaterialDesc(base_color=(0.8, 0.3, 0.2, 1), roughness=0.6)),
        scene.add_material(MaterialDesc(base_color=(0.2, 0.6, 0.9, 1), roughness=0.3,
                                        metallic=0.5)),
        scene.add_material(MaterialDesc(base_color=(0.9, 0.9, 0.2, 1), roughness=0.9)),
    ]


def _instanced_scene():
    scene = Scene()
    mats = _materials(scene)
    mesh_id = scene.add_mesh(prim.uv_sphere(radius=0.7, stacks=12, slices=24))
    box_id = scene.add_mesh(prim.box(size=(1.0, 1.0, 1.0)))
    scene.add_instance(mesh_id, TRANSFORMS[0], mats[0])
    scene.add_instance(mesh_id, TRANSFORMS[1], mats[1])
    scene.add_instance(box_id, TRANSFORMS[2], mats[2])
    return scene


def _flattened_scene():
    scene = Scene()
    mats = _materials(scene)
    for i, (mesh_fn, mat) in enumerate(
        [(lambda m: prim.uv_sphere(radius=0.7, stacks=12, slices=24, material_index=m), mats[0]),
         (lambda m: prim.uv_sphere(radius=0.7, stacks=12, slices=24, material_index=m), mats[1]),
         (lambda m: prim.box(size=(1.0, 1.0, 1.0), material_index=m), mats[2])]
    ):
        scene.add_mesh(mesh_fn(mat), TRANSFORMS[i])
    return scene


@pytest.mark.slow
@pytest.mark.parametrize("integrator", ["megakernel", "fused"])
def test_instanced_matches_flattened(integrator):
    kw = dict(width=SIZE, height=SIZE, samples_per_pass=24, max_bounces=3,
              sky_mode=SKY_MODE_ENVIRONMENT)
    params = make_camera_params(width=SIZE, height=SIZE, **CAM,
                                environment_color=np.array([0.8, 0.8, 0.8], np.float32))
    pool = dict(pool_size=2048) if integrator == "fused" else {}
    ri = Renderer(_instanced_scene(),
                  RenderConfig(traversal="wide", integrator=integrator, **pool, **kw),
                  params)
    rf = Renderer(_flattened_scene(),
                  RenderConfig(traversal="wide", integrator=integrator, **pool, **kw),
                  params)
    ri.render(1)
    rf.render(1)
    a, b = ri.radiance(), rf.radiance()
    assert np.isfinite(a).all()
    # Identical geometry/material semantics; same RNG pairing per pixel for
    # the megakernel (instancing changes hit bookkeeping, not sampling) —
    # allow MC-noise-level deviation from normal interpolation differences.
    k = 8
    ad = a.reshape(SIZE // k, k, SIZE // k, k, 3).mean((1, 3))
    bd = b.reshape(SIZE // k, k, SIZE // k, k, 3).mean((1, 3))
    rel = np.abs(ad - bd) / (bd + 0.05)
    assert rel.mean() < 0.05, rel.mean()


def test_aila_laine_export():
    """Reference-format TLAS export: DFS walk covers every instance once."""
    from unity_webgpu_pathtracer_tpu.accel.tlas import export_aila_laine

    bounds = [((-1, -1, -1), (1, 1, 1)), ((-2, 0, -2), (2, 1, 2))]
    instances = [(i % 2, TRANSFORMS[i % 3], None) for i in range(7)]
    nodes, index = export_aila_laine(instances, bounds)
    assert nodes.shape[1] == 16 and sorted(index.tolist()) == list(range(7))
    iv = nodes.view(np.int32)
    seen = []
    stack = [0]
    while stack:
        n = stack.pop()
        cnt = iv[n, 11]
        if cnt > 0:
            seen.extend(index[iv[n, 15] : iv[n, 15] + cnt].tolist())
        else:
            stack.extend([iv[n, 3], iv[n, 7]])
    assert sorted(seen) == list(range(7))


def test_shared_mesh_instanced_once():
    """Two instances of one mesh share BLAS rows (dedup like BVHScene.cs:455-459)."""
    scene = _instanced_scene()
    data = scene.build("wide")
    assert data.inst_l2w.shape[0] == 3
    # Combined table: TLAS rows + one sphere BLAS + one box BLAS (not two spheres).
    sphere_rows = None
    single = Scene()
    single.add_material(MaterialDesc())
    single.add_mesh(prim.uv_sphere(radius=0.7, stacks=12, slices=24))
    single.add_instance(0, TRANSFORMS[0], 0)
    d1 = single.build("wide")
    sphere_rows = d1.wide_nodes.shape[1]
    box = Scene()
    box.add_material(MaterialDesc())
    box.add_mesh(prim.box(size=(1.0, 1.0, 1.0)))
    box.add_instance(0, TRANSFORMS[2], 0)
    box_rows = box.build("wide").wide_nodes.shape[1]
    # 3 instances but the table is ~ one sphere + one box + small TLAS.
    assert data.wide_nodes.shape[1] < sphere_rows + box_rows + 16
