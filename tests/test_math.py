"""Vector math tests: ONB orthonormality, reflect/refract, disk sampling."""

import jax.numpy as jnp
import numpy as np

from unity_webgpu_pathtracer_tpu.utils import math as um


def _rand_dirs(n, seed=0):
    r = np.random.default_rng(seed)
    v = r.normal(size=(n, 3)).astype(np.float32)
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def test_onb_orthonormal():
    z = jnp.asarray(_rand_dirs(1000))
    x, y, zn = um.build_onb(z)
    for v in (x, y, zn):
        np.testing.assert_allclose(np.asarray(um.length(v)), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(um.dot(x, y)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(um.dot(x, zn)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(um.dot(y, zn)), 0.0, atol=1e-5)
    # Right-handed: cross(x, y) == z
    np.testing.assert_allclose(np.asarray(um.cross(x, y)), np.asarray(zn), atol=1e-5)


def test_onb_degenerate_down_axis():
    # z = -Z is the hard case the reference's frisvad variant guards
    # (common.hlsl:365-375).
    z = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, 1.0], [0.0, 0.0, 0.0]])
    x, y, zn = um.build_onb(z)
    assert np.isfinite(np.asarray(x)).all() and np.isfinite(np.asarray(y)).all()
    np.testing.assert_allclose(np.asarray(um.dot(x, y)), 0.0, atol=1e-5)
    # Zero input -> identity frame.
    np.testing.assert_allclose(np.asarray(zn)[2], [0, 0, 1], atol=1e-6)


def test_to_world_to_local_roundtrip():
    z = jnp.asarray(_rand_dirs(100, 1))
    onb = um.build_onb(z)
    v = jnp.asarray(_rand_dirs(100, 2))
    np.testing.assert_allclose(
        np.asarray(um.to_world(onb, um.to_local(onb, v))), np.asarray(v), atol=1e-5
    )


def test_reflect():
    i = jnp.asarray([[1.0, -1.0, 0.0]]) / np.sqrt(2.0)
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    r = um.reflect(i, n)
    np.testing.assert_allclose(np.asarray(r)[0], [1 / np.sqrt(2), 1 / np.sqrt(2), 0], atol=1e-6)


def test_refract_tir_is_zero():
    # Grazing ray from dense medium: eta > 1 causes TIR.
    i = jnp.asarray([[0.99, -np.sqrt(1 - 0.99**2), 0.0]], dtype=jnp.float32)
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    t = um.refract(i, n, 1.5)
    np.testing.assert_allclose(np.asarray(t), 0.0, atol=1e-7)


def test_refract_snell():
    # Straight-on ray passes through unchanged.
    i = jnp.asarray([[0.0, -1.0, 0.0]])
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    t = um.refract(i, n, 1.0 / 1.5)
    np.testing.assert_allclose(np.asarray(t)[0], [0, -1, 0], atol=1e-6)


def test_concentric_disk_in_unit_disk_and_area_uniform():
    r = np.random.default_rng(3)
    u1 = jnp.asarray(r.uniform(size=20000).astype(np.float32))
    u2 = jnp.asarray(r.uniform(size=20000).astype(np.float32))
    dx, dy = um.concentric_sample_disk(u1, u2)
    rad2 = np.asarray(dx) ** 2 + np.asarray(dy) ** 2
    assert rad2.max() <= 1.0 + 1e-5
    # Uniform over area: E[r^2] = 1/2.
    assert abs(rad2.mean() - 0.5) < 5e-3
    # Degenerate center input maps to origin.
    dx0, dy0 = um.concentric_sample_disk(jnp.asarray([0.5]), jnp.asarray([0.5]))
    np.testing.assert_allclose([np.asarray(dx0)[0], np.asarray(dy0)[0]], 0.0, atol=1e-7)


def test_luminance():
    np.testing.assert_allclose(
        float(um.luminance(jnp.asarray([1.0, 1.0, 1.0]))), 1.0, atol=1e-6
    )


def test_safe_rcp_no_nan():
    v = jnp.asarray([[0.0, 2.0, -4.0]])
    r = np.asarray(um.safe_rcp(v))
    assert np.isfinite(r[0, 1]) and r[0, 1] == 0.5 and r[0, 2] == -0.25
    assert not np.isnan(r).any()
