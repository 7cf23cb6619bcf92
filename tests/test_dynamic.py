"""Dynamic-scene APIs: material edits, light edits, instance transforms —
each must change the image and reset accumulation (the reference's dirty
tracking, PathTracer.cs:169-180/463-471)."""

import numpy as np
import pytest

from unity_webgpu_pathtracer_tpu.api import Renderer
from unity_webgpu_pathtracer_tpu.config import RenderConfig, SKY_MODE_ENVIRONMENT
from unity_webgpu_pathtracer_tpu.models import primitives as prim
from unity_webgpu_pathtracer_tpu.models.examples import lights_scene, tlas_scene
from unity_webgpu_pathtracer_tpu.render.camera import make_camera_params
from unity_webgpu_pathtracer_tpu.scene.lights import LightDesc
from unity_webgpu_pathtracer_tpu.scene.material import MaterialDesc
from unity_webgpu_pathtracer_tpu.scene.scene import Scene

SIZE = 32


def _sphere_scene():
    scene = Scene()
    m = scene.add_material(MaterialDesc(base_color=(0.8, 0.2, 0.2, 1), roughness=0.6))
    scene.add_mesh(prim.uv_sphere(radius=1.0, stacks=12, slices=24, material_index=m))
    config = RenderConfig(width=SIZE, height=SIZE, samples_per_pass=8, max_bounces=2,
                          traversal="wide", sky_mode=SKY_MODE_ENVIRONMENT)
    params = make_camera_params(eye=(0, 0, 3), target=(0, 0, 0), fov_y_deg=45,
                                width=SIZE, height=SIZE,
                                environment_color=np.array([1.0, 1.0, 1.0], np.float32))
    return Renderer(scene, config, params)


def test_update_material_changes_image_and_resets():
    r = _sphere_scene()
    r.render(2)
    before = r.radiance().copy()
    assert r.sample_count == 16
    r.update_material(0, MaterialDesc(base_color=(0.1, 0.9, 0.1, 1), roughness=0.6))
    assert r.sample_count == 0          # accumulation reset
    r.render(2)
    after = r.radiance()
    center = (slice(12, 20), slice(12, 20))
    assert after[center][..., 1].mean() > before[center][..., 1].mean()
    assert after[center][..., 0].mean() < before[center][..., 0].mean()


@pytest.mark.slow
def test_update_lights_changes_image():
    scene, cam, overrides = lights_scene()
    config = RenderConfig(width=SIZE, height=SIZE, samples_per_pass=8, max_bounces=2,
                          traversal="wide", has_lights=True,
                          sky_mode=overrides["sky_mode"])
    params = make_camera_params(width=SIZE, height=SIZE, **cam)
    r = Renderer(scene, config, params)
    r.render(1)
    before = r.radiance().copy()
    brighter = [LightDesc(**{**l.__dict__, "intensity": l.intensity * 4})
                for l in scene.lights]
    r.update_lights(brighter)
    assert r.sample_count == 0
    r.render(1)
    assert r.radiance().mean() > before.mean() * 2.0


def test_update_instance_transform_moves_object():
    scene, cam, overrides = tlas_scene(n=3, phase=0.0)
    config = RenderConfig(width=SIZE, height=SIZE, samples_per_pass=8, max_bounces=2,
                          traversal="wide", sky_mode=overrides["sky_mode"])
    params = make_camera_params(width=SIZE, height=SIZE, **cam)
    r = Renderer(scene, config, params)
    r.render(1)
    before = r.radiance().copy()
    # Move the middle sphere up by 1.5 (Bounce.cs analogue).
    r.update_instance_transform(1, prim.transform_trs(translate=(1 - 1.5, 2.0, 0)))
    assert r.sample_count == 0
    r.render(1)
    after = r.radiance()
    assert np.abs(after - before).max() > 0.05


def test_wide8_tlas_only_update_matches_full_rebuild():
    """Transform-only updates refresh just the TLAS rows in place; the
    result must equal a from-scratch rebuild, and the BLAS rows must be
    untouched (reference capability: BVHScene.cs:769-841)."""
    import numpy as np

    from unity_webgpu_pathtracer_tpu.accel.wide8 import tlas_capacity
    from unity_webgpu_pathtracer_tpu.models import primitives as prim
    from unity_webgpu_pathtracer_tpu.scene.material import MaterialDesc
    from unity_webgpu_pathtracer_tpu.scene.scene import Scene, rebuild_tlas_rows

    scene = Scene()
    m = scene.add_material(MaterialDesc(base_color=(0.7, 0.3, 0.2, 1.0)))
    mesh = scene.add_mesh(prim.uv_sphere(radius=0.4, stacks=8, slices=12,
                                         material_index=m))
    for i in range(5):
        scene.add_instance(mesh, prim.transform_trs(translate=(i * 1.2, 0, 0)))
    sd0 = scene.build("wide8")
    cap = tlas_capacity(5)

    # Move one instance; in-place TLAS refresh.
    scene.set_instance_transform(2, prim.transform_trs(translate=(2.4, 1.5, 0)))
    rows, l2w, w2l = rebuild_tlas_rows(scene)
    updated = np.asarray(sd0.wide8_nodes).copy()
    updated[:cap] = rows

    # Ground truth: full rebuild from a fresh Scene state.
    scene._blas8_cache = None
    scene._tlas8_layout = None
    sd1 = scene.build("wide8")

    np.testing.assert_array_equal(updated, np.asarray(sd1.wide8_nodes))
    np.testing.assert_array_equal(l2w, np.asarray(sd1.inst_l2w))
    np.testing.assert_array_equal(w2l, np.asarray(sd1.inst_w2l))
    # BLAS rows (after the TLAS capacity) were not touched by the update.
    np.testing.assert_array_equal(
        np.asarray(sd0.wide8_nodes)[cap:], np.asarray(sd1.wide8_nodes)[cap:])
