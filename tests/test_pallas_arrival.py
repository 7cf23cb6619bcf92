"""Pallas arrival kernel vs jnp arrival: same traversal, ulp-level math.

Exact bitwise equality is not achievable across lowering paths (FMA
contraction differs, shifting Möller-Trumbore t by 1-2 ulp, which can flip
near-tie winners), so the contract is: identical control flow wherever the
arithmetic agrees, and hit results within ulp-scale tolerance elsewhere.
The production check is the on-TPU fused-film A/B (test_wide16 /
pass_sweep with the pallas flag).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from unity_webgpu_pathtracer_tpu.ops import traverse_wide16 as tw16
from unity_webgpu_pathtracer_tpu.ops.pallas_arrival import arrival_step16_pallas
from unity_webgpu_pathtracer_tpu.utils.math import FAR_PLANE, safe_rcp

from tests.test_wide16 import FakeScene
from tests.test_wide8 import random_rays, random_tris


def _run_pair(tris_n, b, steps, seed, active_frac=None, tk=False):
    tris = random_tris(tris_n, seed=seed)
    sc = FakeScene(tris)
    o, d = random_rays(b, seed=seed + 1)
    o, d = jnp.asarray(o), jnp.asarray(d)
    inv = safe_rcp(d)
    active = None
    if active_frac is not None:
        rng = np.random.default_rng(0)
        active = jnp.asarray(rng.random(b) < active_frac)

    s_ref = tw16.init_state16(b, jnp.float32(FAR_PLANE), depth=12)
    s_pal = s_ref
    for _ in range(steps):
        s_ref = tw16.arrival_step16(sc.wide16_nodes, o, d, inv, s_ref,
                                    active, has_instances=False)
        s_pal = arrival_step16_pallas(sc.wide16_nodes, o.T, d.T, inv.T,
                                      s_pal, active, interpret=True,
                                      transpose_in_kernel=tk)
    return s_ref, s_pal


@pytest.mark.parametrize("steps", [1, 8, 40])
def test_pallas_arrival_matches(steps):
    s_ref, s_pal = _run_pair(3000, 4096, steps, seed=21)
    t_r, t_p = np.asarray(s_ref.t), np.asarray(s_pal.t)
    # Hit distances agree to ulp scale everywhere.
    assert np.allclose(t_r, t_p, rtol=1e-5, atol=1e-5), (
        np.abs(t_r - t_p).max())
    # Control flow is identical except on ulp near-ties (divergent winners
    # reorder the rest of that lane's traversal): require >= 99.5% exact.
    for name in ("ptr", "pend", "sp", "tri", "found"):
        a = np.asarray(getattr(s_ref, name))
        p = np.asarray(getattr(s_pal, name))
        frac = (a == p).mean()
        assert frac >= 0.995, (name, frac)


def test_pallas_arrival_one_step_exact_flow():
    """A single arrival from a fresh state has no accumulated ulp skew:
    the structural fields must match exactly."""
    s_ref, s_pal = _run_pair(500, 2048, 1, seed=5)
    for name in ("ptr", "pend", "sp", "tri", "found", "stack_row",
                 "stack_mask"):
        assert np.array_equal(np.asarray(getattr(s_ref, name)),
                              np.asarray(getattr(s_pal, name))), name


def test_pallas_arrival_with_active_mask():
    s_ref, s_pal = _run_pair(500, 2048, 6, seed=5, active_frac=0.7)
    assert np.allclose(np.asarray(s_ref.t), np.asarray(s_pal.t),
                       rtol=1e-5, atol=1e-5)
    for name in ("ptr", "sp", "found"):
        a = np.asarray(getattr(s_ref, name))
        p = np.asarray(getattr(s_pal, name))
        assert (a == p).mean() >= 0.995, name


def test_fused_film_pallas_matches_jnp():
    """Production fused pass with the Pallas arrivals vs the jnp arrivals:
    statistically identical film (ulp-level MT differences can flip
    near-tie hits, so not bitwise)."""
    from unity_webgpu_pathtracer_tpu.config import RenderConfig
    from unity_webgpu_pathtracer_tpu.models.cornell import cornell_box
    from unity_webgpu_pathtracer_tpu.render.camera import make_camera_params
    from unity_webgpu_pathtracer_tpu.render.fused import fused_pass_with_stats

    size = 48
    scene, cam = cornell_box()
    params = make_camera_params(width=size, height=size, **cam)
    sd = scene.build("wide16")
    films = {}
    for pal in (False, True):
        config = RenderConfig(
            width=size, height=size, samples_per_pass=8, max_bounces=3,
            traversal="wide16", sky_mode=2, integrator="fused",
            pool_size=2048, use_pallas_arrival=pal,
        )
        film, _occ, rays, _arr = fused_pass_with_stats(
            sd, config, params, np.uint32(0), pool_size=2048)
        films[pal] = np.asarray(film) / 8.0
        assert np.isfinite(films[pal]).all()
    a, b = films[False], films[True]
    assert abs(a.mean() - b.mean()) / max(a.mean(), 1e-6) < 0.02, (
        a.mean(), b.mean())


@pytest.mark.parametrize("b,tk", [(1024, False), (1280, False), (2048, True)])
def test_pallas_arrival_block_sizes_and_modes(b, tk):
    """Smaller adaptive blocks (1024; 1280 -> blk=256) and the in-kernel
    transpose mode keep single-arrival control flow exact."""
    s_ref, s_pal = _run_pair(500, b, 1, seed=7, tk=tk)
    for name in ("ptr", "pend", "sp", "tri", "found", "stack_row",
                 "stack_mask"):
        assert np.array_equal(np.asarray(getattr(s_ref, name)),
                              np.asarray(getattr(s_pal, name))), name


def _tlas_scene():
    """Two instances of one mesh (one scaled) — the test_wide16 TLAS
    fixture, packaged for arrival-level parity checks."""
    from unity_webgpu_pathtracer_tpu.accel.wide16 import (
        build_scene_wide16,
        build_tlas_wide16,
    )
    from tests.test_wide8 import recs_of

    base = random_tris(300, seed=9, spread=1.0, size=0.3)
    recs = recs_of(base)
    w16 = build_scene_wide16(base, recs)
    p = base.reshape(-1, 3)
    bounds = (p.min(0), p.max(0))
    t1 = np.eye(4, dtype=np.float32)
    t2 = np.eye(4, dtype=np.float32)
    t2[:3, 3] = (3.0, 0.5, -1.0)
    t2[0, 0] = 2.0
    nodes, _l2w, _w2l, _layout = build_tlas_wide16(
        [w16], [bounds], [(0, t1, None), (0, t2, None)], [0])
    return jnp.asarray(nodes.nodes), nodes.depth


@pytest.mark.parametrize("steps", [1, 8, 40])
def test_pallas_arrival_instanced_matches(steps):
    """Instanced (TLAS) kernel vs jnp arrival_step16(has_instances=True):
    identical control flow modulo ulp near-ties, including the instance
    registers and local-ray planes."""
    nodes, depth = _tlas_scene()
    b = 2048
    o, d = random_rays(b, seed=31, spread=4.0)
    o, d = jnp.asarray(o), jnp.asarray(d)
    inv = safe_rcp(d)
    s_ref = tw16.init_state16(b, jnp.float32(FAR_PLANE), depth=depth + 2)
    s_pal = s_ref
    for _ in range(steps):
        s_ref = tw16.arrival_step16(nodes, o, d, inv, s_ref, None,
                                    has_instances=True)
        s_pal = arrival_step16_pallas(nodes, o.T, d.T, inv.T, s_pal, None,
                                      interpret=True, has_instances=True)
    t_r, t_p = np.asarray(s_ref.t), np.asarray(s_pal.t)
    assert np.allclose(t_r, t_p, rtol=1e-5, atol=1e-5), np.abs(t_r - t_p).max()
    for name in ("ptr", "pend", "sp", "tri", "found", "inst", "hit_inst",
                 "sp_enter"):
        a = np.asarray(getattr(s_ref, name))
        p = np.asarray(getattr(s_pal, name))
        frac = (a == p).mean()
        assert frac >= 0.995, (name, frac)
    for name in ("local_o", "local_d", "local_inv"):
        a = np.asarray(getattr(s_ref, name))
        p = np.asarray(getattr(s_pal, name))
        assert np.allclose(a, p, rtol=1e-6, atol=1e-6), name


def test_pallas_arrival_instanced_one_step_exact():
    nodes, depth = _tlas_scene()
    b = 1024
    o, d = random_rays(b, seed=33, spread=4.0)
    o, d = jnp.asarray(o), jnp.asarray(d)
    inv = safe_rcp(d)
    s0 = tw16.init_state16(b, jnp.float32(FAR_PLANE), depth=depth + 2)
    s_ref = tw16.arrival_step16(nodes, o, d, inv, s0, None,
                                has_instances=True)
    s_pal = arrival_step16_pallas(nodes, o.T, d.T, inv.T, s0, None,
                                  interpret=True, has_instances=True)
    for name in ("ptr", "pend", "sp", "tri", "found", "inst", "hit_inst",
                 "sp_enter", "stack_row", "stack_mask"):
        assert np.array_equal(np.asarray(getattr(s_ref, name)),
                              np.asarray(getattr(s_pal, name))), name


def test_fused_film_pallas_matches_jnp_instanced():
    """Fused pass on an INSTANCED scene: Pallas arrivals vs jnp arrivals
    produce statistically identical films (round-3 verdict item #3 — the
    flagship must not silently fall back on TLAS scenes)."""
    from unity_webgpu_pathtracer_tpu.config import RenderConfig
    from unity_webgpu_pathtracer_tpu.models.examples import tlas_scene

    scene, cam, _extra = tlas_scene(n=4)
    from unity_webgpu_pathtracer_tpu.render.camera import make_camera_params
    from unity_webgpu_pathtracer_tpu.render.fused import fused_pass_with_stats

    size = 48
    params = make_camera_params(width=size, height=size, **cam)
    sd = scene.build("wide16")
    films = {}
    for pal in (False, True):
        config = RenderConfig(
            width=size, height=size, samples_per_pass=8, max_bounces=3,
            traversal="wide16", sky_mode=2, integrator="fused",
            pool_size=2048, use_pallas_arrival=pal,
        )
        film, _occ, _rays, _arr = fused_pass_with_stats(
            sd, config, params, np.uint32(0), pool_size=2048)
        films[pal] = np.asarray(film) / 8.0
        assert np.isfinite(films[pal]).all()
    a, b = films[False], films[True]
    assert abs(a.mean() - b.mean()) / max(a.mean(), 1e-6) < 0.02, (
        a.mean(), b.mean())
