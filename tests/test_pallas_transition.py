"""Pallas transition (shade) kernel vs the XLA transition.

The kernel (ops/pallas_transition.py) is an op-for-op planes-dialect
transcription of render/fused.py::_transition for the production shape.
Contract (interpret mode, CPU): CONTROL FLOW is exactly identical — rays /
arrivals / occupancy counters and the queue evolution match bit-for-bit
(the RNG stream is exactly shared: in-kernel PCG is native uint32, and the
uint32 -> f32 convert uses an exactly-rounding two-part formula,
experiments/round18_mosaic_probe.py) — while film values are ulp-close
(~1e-7): XLA picks different FMA contractions across the pallas_call
boundary, exactly like the arrival kernel's contract.

The compiled-Mosaic radiometry check is the on-TPU bench A/B
(experiments/round18_ptrans_ab.py) plus the TPU golden smoke.
"""

import jax
import numpy as np
import pytest

from unity_webgpu_pathtracer_tpu.config import SKY_MODE_ENVIRONMENT, RenderConfig
from unity_webgpu_pathtracer_tpu.models.benchmark import million_triangle_scene
from unity_webgpu_pathtracer_tpu.ops import pallas_transition as pt
from unity_webgpu_pathtracer_tpu.render import fused
from unity_webgpu_pathtracer_tpu.render.camera import make_camera_params


def test_mode_constants_in_sync():
    """ops.pallas_transition duplicates fused's mode enum (import cycle)."""
    assert pt.MODE_PRIMARY == fused.MODE_PRIMARY
    assert pt.MODE_SHADOW_ENV == fused.MODE_SHADOW_ENV
    assert pt.MODE_SHADOW_LIGHT == fused.MODE_SHADOW_LIGHT
    assert pt.MODE_DEAD == fused.MODE_DEAD
    from unity_webgpu_pathtracer_tpu.ops.traverse_wide16 import FULL

    assert pt.FULL16 == FULL


def _bench_like_config(**overrides):
    kw = dict(
        width=40, height=24, samples_per_pass=4, max_bounces=5,
        traversal="wide16", sky_mode=SKY_MODE_ENVIRONMENT,
        has_environment_texture=True, use_russian_roulette=True,
        integrator="fused", pool_size=1024, bvh_octants=1,
        transition_every=4, attr_compact=2,
    )
    kw.update(overrides)
    return RenderConfig(**kw)


@pytest.fixture(scope="module")
def small_scene():
    scene, cam = million_triangle_scene(2000)
    sd = scene.build("wide16")
    params = make_camera_params(width=40, height=24, **cam)
    return sd, params


@pytest.mark.smoke
def test_supported_gate(small_scene):
    sd, _ = small_scene
    assert fused._pallas_transition_supported(sd, _bench_like_config(
        use_pallas_transition=True))
    assert not fused._pallas_transition_supported(sd, _bench_like_config(
        use_pallas_transition=False))
    for bad in (dict(traversal="wide8"),
                dict(attr_compact=0),
                dict(sky_mode=1),
                dict(has_environment_texture=False),
                dict(has_textures=True),
                dict(has_normal_maps=True),
                dict(use_record_film=False, use_sorted_film=True),
                dict(use_lane_film=True)):
        cfg = _bench_like_config(use_pallas_transition=True, **bad)
        assert not fused._pallas_transition_supported(sd, cfg), bad


@pytest.mark.smoke
@pytest.mark.parametrize("rr", [True, False])
def test_fused_film_pallas_transition_matches_xla(small_scene, rr):
    """Full fused pass, XLA transition vs Pallas transition (interpret on
    CPU): exactly identical control flow (rays/arrivals/occupancy), film
    ulp-close (FMA contraction differs across the pallas_call boundary)."""
    sd, params = small_scene
    films = {}
    stats = {}
    for flag in (False, True):
        cfg = _bench_like_config(use_pallas_transition=flag,
                                 use_russian_roulette=rr)
        step = jax.jit(fused.fused_pass_with_stats, static_argnums=(1,))
        film, occ, rays, arr = step(sd, cfg, params, 0)
        films[flag] = np.asarray(film)
        stats[flag] = (int(rays), int(arr), float(occ))
    assert stats[False] == stats[True]
    np.testing.assert_allclose(films[True], films[False], rtol=2e-5,
                               atol=1e-6)


@pytest.mark.smoke
def test_fused_film_pallas_transition_oct_rows(small_scene):
    """attr_compact=3 (16-byte oct-normal rows): the kernel sees
    XLA-decoded unit vertex normals; control flow matches the XLA mode-3
    transition exactly, film ulp-close."""
    sd, params = small_scene
    films = {}
    stats = {}
    for flag in (False, True):
        cfg = _bench_like_config(use_pallas_transition=flag, attr_compact=3)
        assert fused._pallas_transition_supported(sd, cfg) == flag
        step = jax.jit(fused.fused_pass_with_stats, static_argnums=(1,))
        film, occ, rays, arr = step(sd, cfg, params, 0)
        films[flag] = np.asarray(film)
        stats[flag] = (int(rays), int(arr), float(occ))
    assert stats[False] == stats[True]
    np.testing.assert_allclose(films[True], films[False], rtol=2e-5,
                               atol=1e-6)


def test_fused_film_pallas_transition_multi_pass(small_scene):
    """Second pass (different current_sample) also matches — the RNG
    seeding path through the epilogue regeneration is shared."""
    sd, params = small_scene
    films = {}
    for flag in (False, True):
        cfg = _bench_like_config(use_pallas_transition=flag)
        step = jax.jit(fused.fused_pass_with_stats, static_argnums=(1,))
        film, *_ = step(sd, cfg, params, 7)
        films[flag] = np.asarray(film)
    np.testing.assert_allclose(films[True], films[False], rtol=2e-5,
                               atol=1e-5)


@pytest.mark.smoke
def test_f16_decode_exact_all_patterns():
    """ops.pallas_transition._f16_decode is bit-exact vs XLA's
    bitcast-f16 + convert-f32 over ALL 65536 halfword patterns (normals,
    subnormals, +-0, inf, NaN)."""
    import jax.numpy as jnp

    h = np.arange(65536, dtype=np.int32)
    got = np.asarray(pt._f16_decode(jnp.asarray(h)))
    ref = np.frombuffer(h.astype(np.uint16).tobytes(),
                        dtype=np.float16).astype(np.float32)
    np.testing.assert_array_equal(got.view(np.uint32), ref.view(np.uint32))


@pytest.mark.smoke
def test_fused_film_attr_in_kernel_matches(small_scene):
    """attr_in_kernel (raw pair rows + in-kernel f16 decode) vs the
    XLA-decoded shade_rowT feed: the decode itself is bit-exact (see
    test_f16_decode_exact_all_patterns), so control flow (rays/arrivals/
    occupancy and the RNG stream behind them) matches EXACTLY; the film
    is ulp-close (XLA contracts the normal-interp FMAs differently for
    the two input producers, same as the other kernel-boundary tests)."""
    sd, params = small_scene
    films = {}
    stats = {}
    for flag in (False, True):
        cfg = _bench_like_config(use_pallas_transition=True,
                                 attr_in_kernel=flag)
        step = jax.jit(fused.fused_pass_with_stats, static_argnums=(1,))
        film, occ, rays, arr = step(sd, cfg, params, 0)
        films[flag] = np.asarray(film)
        stats[flag] = (int(rays), int(arr), float(occ))
    assert stats[False] == stats[True]
    np.testing.assert_allclose(films[True], films[False], rtol=2e-5,
                               atol=1e-6)


@pytest.mark.smoke
def test_pool_rounded_to_1024_with_pallas(small_scene):
    """Pools not divisible by 1024 fail Mosaic layout verification on
    hardware (XLA tiles (B,) as T(1024); observed on cornell 48x48 @
    2 spp -> B=4608).  With Pallas kernels on, the pool is rounded up —
    and per-sample radiance is (pixel, sample)-seeded, so the film is
    EXACTLY the pool-independent result."""
    sd, params = small_scene
    films = {}
    for pool in (1152, 2048):  # 1152 would fail Mosaic un-rounded
        cfg = _bench_like_config(use_pallas_transition=True, pool_size=pool)
        step = jax.jit(fused.fused_pass_with_stats, static_argnums=(1,))
        film, *_ = step(sd, cfg, params, 0)
        films[pool] = np.asarray(film)
    # 1152 rounds UP to 2048 -> the two runs are the same program; a
    # missing round would change record grouping (1-ulp film sums) and
    # fail Mosaic layout verification on hardware.
    np.testing.assert_array_equal(films[1152], films[2048])


@pytest.mark.smoke
@pytest.mark.parametrize("ptrans", [False, True])
def test_mask_stale_gathers_film_identical(small_scene, ptrans):
    """mask_stale_gathers clamps the attr/env gather index to row 0 for
    lanes that cannot consume the result this transition.  Every consumer
    of the gathered rows is masked by shade/env_done/light_done, so the
    film and every counter must be EXACTLY identical — this is the
    correctness contract the config flag documents."""
    sd, params = small_scene
    films = {}
    stats = {}
    for flag in (False, True):
        cfg = _bench_like_config(use_pallas_transition=ptrans,
                                 mask_stale_gathers=flag)
        step = jax.jit(fused.fused_pass_with_stats, static_argnums=(1,))
        film, occ, rays, arr = step(sd, cfg, params, 0)
        films[flag] = np.asarray(film)
        stats[flag] = (int(rays), int(arr), float(occ))
    assert stats[False] == stats[True]
    np.testing.assert_array_equal(films[True], films[False])


@pytest.mark.smoke
@pytest.mark.parametrize("ptrans", [False, True])
def test_env_split_rows_film_identical(small_scene, ptrans):
    """env_split_rows extracts the merged-env-row fields from the
    transposed gather result (contiguous (B,) slices) instead of strided
    [B, j] columns.  Per-element values and op order are identical, so
    the film and every counter must be EXACTLY identical."""
    sd, params = small_scene
    films = {}
    stats = {}
    for flag in (False, True):
        cfg = _bench_like_config(use_pallas_transition=ptrans,
                                 env_split_rows=flag)
        step = jax.jit(fused.fused_pass_with_stats, static_argnums=(1,))
        film, occ, rays, arr = step(sd, cfg, params, 0)
        films[flag] = np.asarray(film)
        stats[flag] = (int(rays), int(arr), float(occ))
    assert stats[False] == stats[True]
    np.testing.assert_array_equal(films[True], films[False])


@pytest.mark.smoke
def test_tile3d_film_identical(small_scene):
    """ptrans_tile3d feeds the kernel (n, 8, 128) operands instead of
    (8, B/8).  The kernel is per-lane elementwise and inputs/outputs
    share the lane map, so control flow (rays / arrivals / occupancy)
    must be EXACTLY identical; the film is ulp-close (the XLA fusions
    AROUND the pallas_call re-contract FMAs when the operand reshape
    pattern changes — measured 1-ulp diffs on ~0.2% of pixels, the same
    contract as the ptrans-vs-XLA film comparison)."""
    sd, params = small_scene
    films = {}
    stats = {}
    for flag in (False, True):
        cfg = _bench_like_config(use_pallas_transition=True,
                                 ptrans_tile3d=flag)
        step = jax.jit(fused.fused_pass_with_stats, static_argnums=(1,))
        film, occ, rays, arr = step(sd, cfg, params, 0)
        films[flag] = np.asarray(film)
        stats[flag] = (int(rays), int(arr), float(occ))
    assert stats[False] == stats[True]
    np.testing.assert_allclose(films[True], films[False], rtol=1e-6,
                               atol=1e-6)


def test_pallas_transition_firefly_and_canary(small_scene):
    """Static firefly / NaN-canary variants run through the kernel too."""
    sd, params = small_scene
    films = {}
    for flag in (False, True):
        cfg = _bench_like_config(use_pallas_transition=flag,
                                 use_firefly_filter=True,
                                 debug_nan_canary=True)
        step = jax.jit(fused.fused_pass_with_stats, static_argnums=(1,))
        film, *_ = step(sd, cfg, params, 0)
        films[flag] = np.asarray(film)
    np.testing.assert_allclose(films[True], films[False], rtol=2e-5,
                               atol=1e-5)
