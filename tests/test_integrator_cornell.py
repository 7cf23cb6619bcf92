"""End-to-end milestone test: Cornell box converges with the megakernel
integrator + brute-force intersection (BASELINE.json config 1)."""

import numpy as np
import pytest

from unity_webgpu_pathtracer_tpu.api import Renderer
from unity_webgpu_pathtracer_tpu.config import RenderConfig
from unity_webgpu_pathtracer_tpu.models.cornell import cornell_box
from unity_webgpu_pathtracer_tpu.render.camera import make_camera_params


@pytest.fixture(scope="module")
def cornell_render():
    scene, cam = cornell_box()
    size = 64
    config = RenderConfig(
        width=size, height=size, samples_per_pass=4, max_bounces=4,
        traversal="bruteforce", sky_mode=2,  # no sky: light is the only source
    )
    params = make_camera_params(width=size, height=size, **cam)
    r = Renderer(scene, config, params)
    r.render(passes=4)  # 16 spp
    return r


def test_converges_no_nans(cornell_render):
    img = cornell_render.radiance()
    assert np.isfinite(img).all()
    assert cornell_render.sample_count == 16


def test_global_illumination_structure(cornell_render):
    img = cornell_render.radiance()
    h, w, _ = img.shape
    # Scene is lit: interior pixels have energy.
    assert img.mean() > 0.01
    # Left wall region is red-dominant, right wall green-dominant.
    left = img[h // 2 - 8 : h // 2 + 8, : w // 8]
    right = img[h // 2 - 8 : h // 2 + 8, -w // 8 :]
    assert left[..., 0].mean() > left[..., 1].mean() * 1.5
    assert right[..., 1].mean() > right[..., 0].mean() * 1.5
    # Ceiling light region is the brightest spot.
    top_center = img[-h // 8 :, w // 2 - 8 : w // 2 + 8]
    assert top_center.mean() > img.mean()


def test_deterministic_given_seed(cornell_render):
    scene, cam = cornell_box()
    config = RenderConfig(width=32, height=32, samples_per_pass=2, max_bounces=3,
                          traversal="bruteforce", sky_mode=2)
    params = make_camera_params(width=32, height=32, **cam)
    r1 = Renderer(scene, config, params)
    r2 = Renderer(scene, config, params)
    r1.render(2)
    r2.render(2)
    np.testing.assert_array_equal(r1.radiance(), r2.radiance())


def test_film_checkpoint_resume(tmp_path, cornell_render):
    scene, cam = cornell_box()
    config = RenderConfig(width=32, height=32, samples_per_pass=2, max_bounces=3,
                          traversal="bruteforce", sky_mode=2)
    params = make_camera_params(width=32, height=32, **cam)
    r1 = Renderer(scene, config, params)
    r1.render(1)
    r1.save_checkpoint(str(tmp_path / "ckpt.npz"))
    r1.render(1)

    r2 = Renderer(scene, config, params)
    r2.load_checkpoint(str(tmp_path / "ckpt.npz"))
    assert r2.sample_count == 2
    r2.render(1)
    np.testing.assert_allclose(r1.radiance(), r2.radiance(), atol=1e-6)
