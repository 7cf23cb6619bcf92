"""Split-table (wide2) backend: traversal equivalence + fused integration +
the lane-cap regression (paths must never be truncated by loop bookkeeping)."""

import numpy as np
import pytest

from unity_webgpu_pathtracer_tpu.api import Renderer
from unity_webgpu_pathtracer_tpu.config import SKY_MODE_ENVIRONMENT, RenderConfig
from unity_webgpu_pathtracer_tpu.models.benchmark import million_triangle_scene
from unity_webgpu_pathtracer_tpu.models.examples import tlas_scene
from unity_webgpu_pathtracer_tpu.ops import intersect as bf
from unity_webgpu_pathtracer_tpu.ops import traverse_wide2 as t2
from unity_webgpu_pathtracer_tpu.render.camera import make_camera_params

from tests.test_bvh import _random_rays


@pytest.fixture(scope="module")
def small_scene():
    scene, cam = million_triangle_scene(4_000)
    return scene, cam


@pytest.mark.parametrize("octants", [1, 8])
def test_wide2_matches_bruteforce(small_scene, octants):
    scene, _ = small_scene
    sd = scene.build("wide2", octants=octants)
    o, d = _random_rays(512, seed=octants, spread=6)
    import jax.numpy as jnp

    tt1, _, s1, _ = t2.closest_hit(sd, o, d)
    tt2, _, s2, _ = bf.closest_hit_bruteforce(sd, o, d)
    np.testing.assert_allclose(np.asarray(tt1), np.asarray(tt2), rtol=1e-4, atol=1e-4)
    occ1 = np.asarray(t2.occluded(sd, o, d, jnp.full((512,), 5.0)))
    occ2 = np.asarray(bf.occluded_bruteforce(sd, o, d, jnp.full((512,), 5.0)))
    np.testing.assert_array_equal(occ1, occ2)


@pytest.mark.slow
def test_fused_wide2_matches_megakernel_mean(small_scene):
    """Regression for the lane-cap truncation bug: on scenes with long
    traversals, fused and megakernel means must agree — any per-iteration
    path budget silently darkens the fused image."""
    scene, cam = small_scene
    size = 48
    params = make_camera_params(width=size, height=size, **cam)
    kw = dict(width=size, height=size, samples_per_pass=8, max_bounces=6,
              sky_mode=SKY_MODE_ENVIRONMENT, has_environment_texture=True)
    rf = Renderer(scene, RenderConfig(traversal="wide2", integrator="fused",
                                      pool_size=1024, **kw), params)
    rm = Renderer(scene, RenderConfig(traversal="wide", integrator="megakernel",
                                      **kw), params)
    rf.render(1)
    rm.render(1)
    a, b = rf.radiance(), rm.radiance()
    assert np.isfinite(a).all()
    assert abs(a.mean() - b.mean()) / max(b.mean(), 1e-9) < 0.03, (a.mean(), b.mean())


@pytest.mark.slow
def test_fused_wide2_tlas():
    scene, cam, ov = tlas_scene(n=3)
    size = 32
    config = RenderConfig(width=size, height=size, samples_per_pass=8,
                          max_bounces=3, traversal="wide2",
                          sky_mode=ov["sky_mode"], integrator="fused",
                          pool_size=1024)
    params = make_camera_params(width=size, height=size, **cam)
    r = Renderer(scene, config, params)
    r.render(1)
    a = r.radiance()
    assert np.isfinite(a).all() and a.mean() > 0.05

    # Same scene through the unified wide fused path: means agree.
    scene2, _, _ = tlas_scene(n=3)
    config2 = RenderConfig(width=size, height=size, samples_per_pass=8,
                           max_bounces=3, traversal="wide",
                           sky_mode=ov["sky_mode"], integrator="fused",
                           pool_size=1024)
    r2 = Renderer(scene2, config2, params)
    r2.render(1)
    assert abs(a.mean() - r2.radiance().mean()) / r2.radiance().mean() < 0.05
