"""White-furnace test: unit-albedo diffuse sphere in a constant-radiance
environment must render to exactly the environment radiance (energy
conservation through the full integrator: NEE + MIS + BSDF sampling + RR)."""

import numpy as np
import pytest

from unity_webgpu_pathtracer_tpu.api import Renderer
from unity_webgpu_pathtracer_tpu.config import SKY_MODE_ENVIRONMENT, RenderConfig, RenderParams
from unity_webgpu_pathtracer_tpu.models import primitives as prim
from unity_webgpu_pathtracer_tpu.render.camera import make_camera_params
from unity_webgpu_pathtracer_tpu.scene.material import MaterialDesc
from unity_webgpu_pathtracer_tpu.scene.scene import Scene


def _render_sphere(albedo, spp=32, bounces=8, roughness=1.0, metallic=0.0):
    scene = Scene()
    m = scene.add_material(
        MaterialDesc(base_color=(albedo, albedo, albedo, 1.0),
                     roughness=roughness, metallic=metallic)
    )
    scene.add_mesh(prim.uv_sphere(radius=1.0, stacks=16, slices=32, material_index=m))
    size = 48
    config = RenderConfig(
        width=size, height=size, samples_per_pass=spp, max_bounces=bounces,
        traversal="bruteforce", sky_mode=SKY_MODE_ENVIRONMENT,
        use_russian_roulette=True,
    )
    params = make_camera_params(
        eye=(0, 0, 3.0), target=(0, 0, 0), fov_y_deg=45.0, width=size, height=size,
        environment_color=np.array([1.0, 1.0, 1.0], np.float32),
        environment_intensity=np.float32(1.0),
    )
    r = Renderer(scene, config, params)
    r.render(1)
    return r.radiance()


@pytest.mark.slow
def test_white_furnace_diffuse():
    img = _render_sphere(albedo=1.0)
    assert np.isfinite(img).all()
    # Background rays must see exactly the environment radiance.
    assert img[:6, :6].mean() == pytest.approx(1.0, abs=1e-4)
    # Sphere: the Disney/Burley diffuse lobe is known to gain a few percent
    # at roughness 1 (retro-reflection term), so the furnace bound is
    # [0.95, 1.12] on the mean rather than exactly 1.
    assert 0.95 < img.mean() < 1.12, img.mean()
    assert img.max() < 1.8


@pytest.mark.slow
def test_gray_furnace_absorbs():
    img = _render_sphere(albedo=0.5)
    # Sphere pixels must be darker than the environment, no energy gain.
    assert img.max() < 1.35  # small MC fluctuation allowance
    center = img[20:28, 20:28].mean()
    assert 0.45 < center < 0.85
