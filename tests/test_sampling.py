"""Monte-Carlo validation of sampling pdfs against closed forms."""

import jax.numpy as jnp
import numpy as np

from unity_webgpu_pathtracer_tpu.render import sampling as sp
from unity_webgpu_pathtracer_tpu.utils.math import PI

R = np.random.default_rng(0)
N = 200_000


def _uniform_hemisphere(n):
    z = R.uniform(size=n)
    phi = R.uniform(size=n) * 2 * np.pi
    r = np.sqrt(1 - z * z)
    return np.stack([r * np.cos(phi), r * np.sin(phi), z], -1).astype(np.float32)


def test_gtr2_ndf_normalization():
    # ∫_hemisphere D(h) (h·n) dω = 1 for a normalized NDF.
    for a in (0.1, 0.3, 0.8):
        h = _uniform_hemisphere(N)
        d = np.asarray(sp.gtr2(jnp.asarray(h[:, 2]), a))
        integral = (d * h[:, 2]).mean() * 2 * np.pi
        assert abs(integral - 1.0) < 0.03, (a, integral)


def test_gtr1_ndf_normalization():
    for a in (0.1, 0.5):
        h = _uniform_hemisphere(N)
        d = np.asarray(sp.gtr1(jnp.asarray(h[:, 2]), a))
        integral = (d * h[:, 2]).mean() * 2 * np.pi
        assert abs(integral - 1.0) < 0.05, (a, integral)


def test_gtr2_aniso_matches_iso_when_ax_eq_ay():
    h = _uniform_hemisphere(1000)
    iso = np.asarray(sp.gtr2(jnp.asarray(h[:, 2]), 0.4))
    aniso = np.asarray(
        sp.gtr2_aniso(jnp.asarray(h[:, 2]), jnp.asarray(h[:, 0]), jnp.asarray(h[:, 1]), 0.4, 0.4)
    )
    np.testing.assert_allclose(aniso, iso, rtol=2e-3, atol=1e-5)


def test_cosine_hemisphere_distribution():
    u1 = jnp.asarray(R.uniform(size=N).astype(np.float32))
    u2 = jnp.asarray(R.uniform(size=N).astype(np.float32))
    d = np.asarray(sp.cosine_sample_hemisphere(u1, u2))
    assert (d[:, 2] >= 0).all()
    # E[cos θ] = 2/3 for pdf = cosθ/π.
    assert abs(d[:, 2].mean() - 2.0 / 3.0) < 3e-3


def test_uniform_sphere_distribution():
    u1 = jnp.asarray(R.uniform(size=N).astype(np.float32))
    u2 = jnp.asarray(R.uniform(size=N).astype(np.float32))
    d = np.asarray(sp.uniform_sample_sphere(u1, u2))
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    assert np.abs(d.mean(axis=0)).max() < 5e-3


def test_vndf_visible_and_unit():
    v = np.array([0.3, -0.2, 0.9], dtype=np.float32)
    v /= np.linalg.norm(v)
    u1 = jnp.asarray(R.uniform(size=5000).astype(np.float32))
    u2 = jnp.asarray(R.uniform(size=5000).astype(np.float32))
    vv = jnp.broadcast_to(jnp.asarray(v), (5000, 3))
    h = np.asarray(sp.sample_ggx_vndf(vv, 0.3, 0.3, u1, u2))
    np.testing.assert_allclose(np.linalg.norm(h, axis=-1), 1.0, atol=1e-5)
    assert (h[:, 2] >= -1e-6).all()
    # All sampled normals are visible from V.
    assert ((h * v).sum(-1) >= -1e-5).all()


def test_dielectric_fresnel_normal_incidence_and_tir():
    eta = 1.0 / 1.5
    f0 = float(sp.dielectric_fresnel(jnp.asarray(1.0), eta))
    assert abs(f0 - ((1 - eta) / (1 + eta)) ** 2) < 1e-6
    # TIR from the dense side at grazing angle.
    f = float(sp.dielectric_fresnel(jnp.asarray(0.1), 1.5))
    assert f == 1.0


def test_power_heuristic():
    assert abs(float(sp.power_heuristic(jnp.asarray(1.0), jnp.asarray(1.0))) - 0.5) < 1e-6
    assert float(sp.power_heuristic(jnp.asarray(1.0), jnp.asarray(0.0))) == 1.0
    assert float(sp.power_heuristic(jnp.asarray(0.0), jnp.asarray(1.0))) == 0.0


def test_smith_g_range():
    nv = jnp.asarray(R.uniform(0.01, 1.0, size=1000).astype(np.float32))
    g = np.asarray(sp.smith_g(nv, 0.5))
    assert (g > 0).all() and (g <= 2.0).all()


def test_gaussian_aa_jitter_stats():
    u = jnp.asarray(R.uniform(1e-7, 1, size=N).astype(np.float32))
    v = jnp.asarray(R.uniform(size=N).astype(np.float32))
    gx, gy = sp.sample_gaussian(u, v)
    gx, gy = np.asarray(gx), np.asarray(gy)
    assert abs(gx.mean()) < 0.01 and abs(gy.mean()) < 0.01
    assert abs(gx.std() - 1.0) < 0.01 and abs(gy.std() - 1.0) < 0.01
