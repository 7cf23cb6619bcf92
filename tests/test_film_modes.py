"""Film-accumulation mode parity: legacy scatter vs lane film vs sorted-prefix.

All three modes draw the identical (pixel, sample) seed set, so per-sample
radiance is bit-identical; only the scatter-add association differs, which
can move float sums by ~1 ulp (same tolerance as tests/test_multichip.py).

The sorted-prefix mode (config.use_sorted_film) additionally rank-gates
death records to K = pool >> film_k_shift per transition and parks the
overflow in-lane; a large film_k_shift here forces heavy rejection so the
backpressure + post-loop straggler flush paths are actually exercised.
"""

import dataclasses

import numpy as np
import pytest

from unity_webgpu_pathtracer_tpu.api import Renderer
from unity_webgpu_pathtracer_tpu.config import RenderConfig
from unity_webgpu_pathtracer_tpu.models.cornell import cornell_box
from unity_webgpu_pathtracer_tpu.render.camera import make_camera_params


def _render(config, params, scene, passes=2):
    r = Renderer(scene, config, params)
    r.render(passes)
    return r.radiance()


@pytest.fixture(scope="module")
def cornell_setup():
    scene, cam = cornell_box()
    size = 24
    config = RenderConfig(width=size, height=size, samples_per_pass=4,
                          max_bounces=3, sky_mode=2, traversal="wide",
                          integrator="fused", pool_size=512,
                          use_sorted_film=False, use_record_film=False)
    params = make_camera_params(width=size, height=size, **cam)
    legacy = _render(config, params, scene)
    return scene, config, params, legacy


def test_sorted_film_matches_legacy(cornell_setup):
    scene, config, params, legacy = cornell_setup
    f = _render(dataclasses.replace(config, use_sorted_film=True,
                                    film_k_shift=1), params, scene)
    np.testing.assert_allclose(f, legacy, rtol=3e-7, atol=1e-7)


def test_sorted_film_backpressure_matches_legacy(cornell_setup):
    # K = 512 >> 6 = 8 accepted records/transition: nearly every death is
    # rank-rejected and parked, so completion relies on retry + the
    # post-loop straggler flush. Radiance must still be conserved exactly.
    scene, config, params, legacy = cornell_setup
    f = _render(dataclasses.replace(config, use_sorted_film=True,
                                    film_k_shift=6), params, scene)
    np.testing.assert_allclose(f, legacy, rtol=3e-7, atol=1e-7)


def test_record_film_matches_legacy(cornell_setup):
    scene, config, params, legacy = cornell_setup
    f = _render(dataclasses.replace(config, use_record_film=True,
                                    film_k_shift=1), params, scene)
    np.testing.assert_allclose(f, legacy, rtol=3e-7, atol=1e-7)


def test_record_film_backpressure_matches_legacy(cornell_setup):
    # K = 512 >> 6 = 8 accepted records/transition: nearly every death is
    # rank-rejected and parked, so completion relies on retry + the
    # post-loop straggler append. Radiance must still be conserved.
    scene, config, params, legacy = cornell_setup
    f = _render(dataclasses.replace(config, use_record_film=True,
                                    film_k_shift=6), params, scene)
    np.testing.assert_allclose(f, legacy, rtol=3e-7, atol=1e-7)


def test_record_film_takes_dispatch_over_sorted(cornell_setup):
    # use_record_film takes the branch even when use_sorted_film (the
    # production default) is also set.
    scene, config, params, legacy = cornell_setup
    f = _render(dataclasses.replace(config, use_record_film=True,
                                    use_sorted_film=True), params, scene)
    np.testing.assert_allclose(f, legacy, rtol=3e-7, atol=1e-7)


def test_record_film_deterministic(cornell_setup):
    scene, config, params, _ = cornell_setup
    cfg = dataclasses.replace(config, use_record_film=True, film_k_shift=2)
    np.testing.assert_array_equal(_render(cfg, params, scene),
                                  _render(cfg, params, scene))


def test_sort_perm_variant_bitwise_matches(cornell_setup):
    # film_sort_perm replaces radiance sort payloads with a stable
    # permutation + gather; stability makes it BIT-identical per mode.
    scene, config, params, _ = cornell_setup
    for extra in ({"use_sorted_film": True},
                  {"use_record_film": True, "film_k_shift": 0}):
        a = _render(dataclasses.replace(config, **extra), params, scene)
        b = _render(dataclasses.replace(config, film_sort_perm=True,
                                        **extra), params, scene)
        np.testing.assert_array_equal(a, b)


def test_lane_film_matches_legacy(cornell_setup):
    scene, config, params, legacy = cornell_setup
    f = _render(dataclasses.replace(config, use_lane_film=True),
                params, scene)
    np.testing.assert_allclose(f, legacy, rtol=3e-7, atol=1e-7)


def test_lane_film_wins_dispatch_over_sorted(cornell_setup):
    # use_lane_film takes the dispatch branch even when use_sorted_film is
    # also set (the production default) — regression for an
    # UnboundLocalError when the sorted-path fallbacks were gated on
    # use_sorted_film alone.
    scene, config, params, legacy = cornell_setup
    f = _render(dataclasses.replace(config, use_lane_film=True,
                                    use_sorted_film=True), params, scene)
    np.testing.assert_allclose(f, legacy, rtol=3e-7, atol=1e-7)


def test_sorted_film_deterministic(cornell_setup):
    scene, config, params, _ = cornell_setup
    cfg = dataclasses.replace(config, use_sorted_film=True, film_k_shift=2)
    np.testing.assert_array_equal(_render(cfg, params, scene),
                                  _render(cfg, params, scene))


def test_attr_compact_modes(cornell_setup):
    # Compact f16 attribute rows (production default mode 2): modes 1 and
    # 2 read the same packed halfwords through different gather shapes,
    # so they are BIT-identical; vs the f32 rows the only delta is f16
    # rounding of normals/uvs (~1e-3 on unit normals -> ~1e-4 radiance
    # on this scene).
    scene, config, params, _ = cornell_setup
    f32 = _render(dataclasses.replace(config, attr_compact=0), params, scene)
    c1 = _render(dataclasses.replace(config, attr_compact=1), params, scene)
    c2 = _render(dataclasses.replace(config, attr_compact=2), params, scene)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_allclose(c2, f32, atol=2e-3, rtol=2e-3)


def test_attr_compact_oct_mode(cornell_setup):
    # Mode 3 (16-byte oct-normal rows, no uv): radiometry within oct
    # quantization noise of the f32 rows on an untextured scene, and a
    # static error when textures or normal maps are configured (the rows
    # carry no uv to feed them).
    scene, config, params, _ = cornell_setup
    f32 = _render(dataclasses.replace(config, attr_compact=0), params, scene)
    c3 = _render(dataclasses.replace(config, attr_compact=3), params, scene)
    # Perturbing normals by the oct quantization (~7e-4 rad) can flip a
    # rare near-edge sample onto a different path entirely (chaotic
    # trajectories), so the comparison is statistical: almost every pixel
    # within quantization noise, image mean unchanged.
    close = np.isclose(c3, f32, atol=2e-3, rtol=2e-3)
    assert close.mean() > 0.995, f"{(~close).sum()} of {close.size} off"
    # At this tiny spp a single flipped bright path moves the image mean
    # by ~1%; the proper radiometric net is the golden-image z-test
    # (tests/test_golden.py) at production spp.
    np.testing.assert_allclose(c3.mean(), f32.mean(), rtol=2e-2)
    with pytest.raises(ValueError, match="attr_compact=3"):
        _render(dataclasses.replace(config, attr_compact=3,
                                    has_textures=True), params, scene)
