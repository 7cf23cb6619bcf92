"""Disney BSDF validation: pdf normalization, energy conservation,
sampling/eval consistency, white furnace."""

import jax
import jax.numpy as jnp
import numpy as np

from unity_webgpu_pathtracer_tpu.render import bsdf
from unity_webgpu_pathtracer_tpu.utils.math import build_onb, to_world

R = np.random.default_rng(7)


def _mat(n, **kw):
    return bsdf.make_material(batch_shape=(n,), **kw)


def _fixed_v(n, v=(0.2, 0.1, 0.97)):
    v = np.asarray(v, np.float32)
    v /= np.linalg.norm(v)
    return jnp.broadcast_to(jnp.asarray(v), (n, 3))


NORMAL = jnp.asarray([0.0, 0.0, 1.0])


def _uniform_sphere(n, seed=0):
    r = np.random.default_rng(seed)
    z = 1 - 2 * r.uniform(size=n)
    phi = r.uniform(size=n) * 2 * np.pi
    rad = np.sqrt(np.maximum(0, 1 - z * z))
    return jnp.asarray(
        np.stack([rad * np.cos(phi), rad * np.sin(phi), z], -1).astype(np.float32)
    )


def _pdf_integral(mat_kwargs, n=400_000):
    """MC estimate of ∫ pdf(L) dω over the full sphere — should be ~1."""
    l = _uniform_sphere(n, 3)
    v = _fixed_v(n)
    nrm = jnp.broadcast_to(NORMAL, (n, 3))
    m = _mat(n, **mat_kwargs)
    _, pdf = bsdf.eval_brdf(m, v, nrm, l)
    return float(np.asarray(pdf).mean() * 4 * np.pi)


def test_pdf_normalizes_diffuse():
    assert abs(_pdf_integral(dict(base_color=(0.8, 0.6, 0.4), roughness=0.6)) - 1.0) < 0.03


def test_pdf_normalizes_metal():
    # Smooth metal: nearly all VNDF reflections stay above the horizon.
    assert abs(_pdf_integral(dict(metallic=1.0, roughness=0.05)) - 1.0) < 0.05
    # Rough metal: the pdf loses the below-horizon reflection mass (those
    # samples terminate via the reference's pdf>0 check, pathtrace.hlsl:110),
    # so the integral is ≤ 1 but must never exceed it.
    v = _pdf_integral(dict(metallic=1.0, roughness=0.5))
    assert 0.7 < v <= 1.02, v


def test_pdf_normalizes_glass():
    v = _pdf_integral(dict(base_color=(1, 1, 1), opacity=0.0, roughness=0.4, ior=1.5))
    assert abs(v - 1.0) < 0.06


def test_pdf_normalizes_clearcoat_mix():
    v = _pdf_integral(dict(base_color=(0.5, 0.5, 0.5), roughness=0.4, clearcoat=1.0,
                           clearcoat_gloss=0.5))
    assert abs(v - 1.0) < 0.05


def test_sample_eval_consistency():
    """E_{L~sample}[g(L)·/pdf] must equal uniform-MC ∫g dω for the same g."""
    n = 300_000
    v = _fixed_v(n)
    nrm = jnp.broadcast_to(NORMAL, (n, 3))
    m = _mat(n, base_color=(0.7, 0.7, 0.7), roughness=0.3, metallic=0.3)
    state = jnp.arange(n, dtype=jnp.uint32) * jnp.uint32(2654435761) + jnp.uint32(1)

    def g(l):  # arbitrary smooth positive test function
        return 1.0 + l[..., 2] ** 2

    _, l_s, pdf_s, _ = bsdf.sample_brdf(m, v, nrm, state)
    pdf_s = np.asarray(pdf_s)
    mask = pdf_s > 1e-6
    # Compare ∫ g·pdf dω computed two ways. Samples whose eval-pdf is zero
    # (below-horizon reflections) are dead lanes and contribute zero, but the
    # normalization stays over ALL draws:
    # route A: sampled directions -> mean of 1{pdf>0}·g(L)
    route_a = float((np.asarray(g(l_s)) * mask).mean())
    # route B: uniform sphere -> mean g·pdf·4π
    l_u = _uniform_sphere(n, 11)
    _, pdf_u = bsdf.eval_brdf(m, v, nrm, l_u)
    route_b = float((np.asarray(g(l_u)) * np.asarray(pdf_u)).mean() * 4 * np.pi)
    assert abs(route_a - route_b) < 0.02, (route_a, route_b)


def test_furnace_diffuse_energy():
    """Directional-hemispherical reflectance of pure diffuse ≈ albedo.

    E[f/pdf] over BSDF samples estimates ∫ f dω; for the Disney diffuse lobe
    at normal-ish incidence this is within a few % of base color.
    """
    n = 200_000
    v = _fixed_v(n, (0.0, 0.0, 1.0))
    nrm = jnp.broadcast_to(NORMAL, (n, 3))
    albedo = 0.6
    m = _mat(n, base_color=(albedo,) * 3, roughness=1.0, metallic=0.0, ior=1.3)
    state = jnp.arange(n, dtype=jnp.uint32) * jnp.uint32(747796405) + jnp.uint32(99)
    f, _, pdf, _ = bsdf.sample_brdf(m, v, nrm, state)
    f, pdf = np.asarray(f), np.asarray(pdf)
    w = np.where(pdf[:, None] > 1e-6, f / np.maximum(pdf[:, None], 1e-6), 0.0)
    refl = w.mean(axis=0)
    # Disney adds retro/specular energy; stays within [0.8·albedo, 1.15·albedo].
    assert (refl > albedo * 0.8).all() and (refl < albedo * 1.15).all(), refl


def test_no_nans_across_material_space():
    """Random material × geometry sweep must never produce NaN f or pdf."""
    n = 20_000
    r = np.random.default_rng(5)
    m = bsdf.make_material(
        batch_shape=(n,),
        base_color=r.uniform(0, 1, (n, 3)).astype(np.float32),
        roughness=r.uniform(0, 1, n).astype(np.float32),
        metallic=r.uniform(0, 1, n).astype(np.float32),
        opacity=r.uniform(0, 1, n).astype(np.float32),
        clearcoat=r.uniform(0, 1, n).astype(np.float32),
        clearcoat_gloss=r.uniform(0, 1, n).astype(np.float32),
        sheen=r.uniform(0, 1, n).astype(np.float32),
        sheen_tint=r.uniform(0, 1, n).astype(np.float32),
        subsurface=r.uniform(0, 1, n).astype(np.float32),
        specular_tint=r.uniform(0, 1, n).astype(np.float32),
        anisotropic=r.uniform(-1, 1, n).astype(np.float32),
        ior=r.uniform(1.0, 2.5, n).astype(np.float32),
    )
    v = _uniform_sphere(n, 13)
    v = jnp.where(v[..., 2:3] < 0, -v, v)  # V above surface
    nrm = jnp.broadcast_to(NORMAL, (n, 3))
    state = jnp.arange(n, dtype=jnp.uint32)
    f, l, pdf, _ = bsdf.sample_brdf(m, v, nrm, state)
    for arr in (f, l, pdf):
        assert np.isfinite(np.asarray(arr)).all()
    le, pe = bsdf.eval_brdf(m, v, nrm, _uniform_sphere(n, 17))
    assert np.isfinite(np.asarray(le)).all() and np.isfinite(np.asarray(pe)).all()


def test_eval_brdf_jits():
    n = 128
    m = _mat(n, roughness=0.4)
    v = _fixed_v(n)
    nrm = jnp.broadcast_to(NORMAL, (n, 3))
    l = _uniform_sphere(n)
    f, pdf = jax.jit(bsdf.eval_brdf)(m, v, nrm, l)
    assert f.shape == (n, 3) and pdf.shape == (n,)
