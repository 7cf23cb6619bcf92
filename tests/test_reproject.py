"""Temporal reprojection (render/reproject.py, BASELINE.md milestone 5).

Identity moves must be exact (pixel-center taps are single-tap bilinear
and depth always agrees with itself); small translations must carry
converged history that statistically matches a fresh render; reverse
moves must disocclude everything (count 0 -> clean restart)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from unity_webgpu_pathtracer_tpu.api import Renderer
from unity_webgpu_pathtracer_tpu.config import RenderConfig
from unity_webgpu_pathtracer_tpu.models.cornell import cornell_box
from unity_webgpu_pathtracer_tpu.render.camera import make_camera_params
from unity_webgpu_pathtracer_tpu.render.reproject import reproject_film


SIZE = 24


@pytest.fixture(scope="module")
def setup():
    scene, cam = cornell_box()
    config = RenderConfig(width=SIZE, height=SIZE, samples_per_pass=8,
                          max_bounces=3, sky_mode=2, traversal="wide",
                          integrator="fused", pool_size=512)
    params = make_camera_params(width=SIZE, height=SIZE, **cam)
    return scene, cam, config, params


def test_identity_reprojection_exact(setup):
    scene, cam, config, params = setup
    r = Renderer(scene, config, params)
    r.render(2)
    warped = reproject_film(r.scene, config, r.film, params, params)
    # Projection float eps gives neighbor taps ~2e-7 weight, so black
    # pixels beside bright ones pick up ~1e-6 absolute leakage.
    np.testing.assert_allclose(np.asarray(warped.accum),
                               np.asarray(r.film.accum), rtol=1e-5, atol=1e-5)
    assert int(jnp.min(warped.sample_count)) == r.sample_count
    assert warped.sample_count.shape == (SIZE, SIZE, 1)


def test_small_move_carries_history(setup):
    scene, cam, config, params = setup
    r = Renderer(scene, config, params)
    r.render(4)
    eye = np.asarray(cam["eye"], np.float64)
    moved = dict(cam, eye=tuple(eye + np.array([0.02, 0.01, 0.0])))
    new_params = make_camera_params(width=SIZE, height=SIZE, **moved)

    warped = reproject_film(r.scene, config, r.film, params, new_params)
    counts = np.asarray(warped.sample_count)[..., 0]
    assert (counts > 0).mean() > 0.7, "most pixels should survive a tiny move"

    fresh = Renderer(scene, config, new_params)
    fresh.render(4)
    a = np.asarray(warped.accum)
    b = np.asarray(fresh.film.accum)
    valid = counts > 0
    # Monte-Carlo noise at 32 spp on a 24x24 cornell box: compare means.
    ma, mb = a[valid].mean(), b[valid].mean()
    assert abs(ma - mb) / max(mb, 1e-6) < 0.15, (ma, mb)


def test_reverse_move_disoccludes_everything(setup):
    scene, cam, config, params = setup
    r = Renderer(scene, config, params)
    r.render(2)
    eye = np.asarray(cam["eye"], np.float64)
    target = np.asarray(cam["target"], np.float64)
    flipped = dict(cam, eye=tuple(target + (target - eye)),
                   target=tuple(2 * target - eye + (target - eye)))
    new_params = make_camera_params(width=SIZE, height=SIZE, **flipped)
    warped = reproject_film(r.scene, config, r.film, params, new_params)
    counts = np.asarray(warped.sample_count)[..., 0]
    assert (counts == 0).mean() > 0.9, "a reversed camera sees new surfaces"


def test_update_camera_reproject_then_step(setup):
    scene, cam, config, params = setup
    r = Renderer(scene, config, params)
    r.render(2)
    eye = np.asarray(cam["eye"], np.float64)
    moved = dict(cam, eye=tuple(eye + np.array([0.01, 0.0, 0.0])))
    new_params = make_camera_params(width=SIZE, height=SIZE, **moved)
    r.update_camera(new_params, reproject=True, max_history=12)
    assert r.film.sample_count.shape == (SIZE, SIZE, 1)
    assert int(jnp.max(r.film.sample_count)) <= 12
    before = r.sample_count
    r.step()  # per-pixel count path through accumulate + jnp.max pass base
    assert r.sample_count == before + config.samples_per_pass
    assert np.isfinite(np.asarray(r.film.accum)).all()


def test_checkpoint_roundtrip_per_pixel_counts(setup, tmp_path):
    scene, cam, config, params = setup
    r = Renderer(scene, config, params)
    r.render(2)
    r.update_camera(params, reproject=True)  # per-pixel counts
    path = str(tmp_path / "film.npz")
    r.save_checkpoint(path)
    r2 = Renderer(scene, config, params)
    r2.load_checkpoint(path)
    np.testing.assert_array_equal(np.asarray(r2.film.accum),
                                  np.asarray(r.film.accum))
    np.testing.assert_array_equal(np.asarray(r2.film.sample_count),
                                  np.asarray(r.film.sample_count))
    r2.step()  # resumes cleanly with per-pixel counts
    assert np.isfinite(np.asarray(r2.film.accum)).all()


def test_update_camera_no_reproject_resets(setup):
    scene, cam, config, params = setup
    r = Renderer(scene, config, params)
    r.render(1)
    r.update_camera(params)
    assert r.sample_count == 0
