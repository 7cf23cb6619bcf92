"""Microfacet / hemisphere sampling math.

Vectorized ports of the reference's sampling kernels
(``Assets/Resources/util/sampling.hlsl``): GTR1/GTR2 NDFs and samplers
(:6-93), visible-normal GGX sampling (:56-74), Smith masking (:95-108),
Schlick weight (:110), dielectric Fresnel with TIR (:117-135), hemisphere /
sphere samplers (:137-161) and the beta=2 power heuristic (:163-167).  All
functions are shape-polymorphic over leading batch axes and branch-free.
"""

from __future__ import annotations

import jax.numpy as jnp

from unity_webgpu_pathtracer_tpu.utils.math import (
    INV_4_PI,
    INV_PI,
    PI,
    TWO_PI,
    cross,
    normalize,
)


def gtr1(n_dot_h: jnp.ndarray, a) -> jnp.ndarray:
    """Berry/GTR1 NDF for clearcoat (sampling.hlsl:6-18). a>=1 -> 1/pi."""
    a = jnp.asarray(a)
    a2 = a * a
    t = 1.0 + (a2 - 1.0) * n_dot_h * n_dot_h
    d = (a2 - 1.0) / (PI * jnp.log(a2) * t)
    return jnp.where(a >= 1.0, INV_PI, d)


def sample_gtr1(rgh, r1: jnp.ndarray, r2: jnp.ndarray) -> jnp.ndarray:
    """Sample a GTR1 half-vector in tangent space (sampling.hlsl:20-33)."""
    a = jnp.maximum(jnp.asarray(rgh), 0.001)
    a2 = a * a
    phi = r1 * TWO_PI
    cos_theta = jnp.sqrt(
        jnp.maximum((1.0 - jnp.power(a2, 1.0 - r2)) / (1.0 - a2), 0.0)
    )
    sin_theta = jnp.clip(jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0)), 0.0, 1.0)
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )


def gtr2(n_dot_h: jnp.ndarray, a) -> jnp.ndarray:
    """Isotropic GGX/GTR2 NDF (sampling.hlsl:35-40)."""
    a2 = a * a
    t = 1.0 + (a2 - 1.0) * n_dot_h * n_dot_h
    return a2 / (PI * t * t)


def gtr2_aniso(n_dot_h, h_dot_x, h_dot_y, ax, ay) -> jnp.ndarray:
    """Anisotropic GGX NDF (sampling.hlsl:76-82)."""
    a = h_dot_x / ax
    b = h_dot_y / ay
    c = a * a + b * b + n_dot_h * n_dot_h
    return 1.0 / (PI * ax * ay * c * c)


def sample_ggx_vndf(v: jnp.ndarray, ax, ay, r1, r2) -> jnp.ndarray:
    """Heitz visible-normal GGX sampling, tangent space (sampling.hlsl:56-74)."""
    ax = jnp.asarray(ax)[..., None] if jnp.ndim(ax) else ax
    ay = jnp.asarray(ay)[..., None] if jnp.ndim(ay) else ay
    vh = normalize(
        jnp.stack(
            [
                (ax if jnp.ndim(ax) == 0 else ax[..., 0]) * v[..., 0],
                (ay if jnp.ndim(ay) == 0 else ay[..., 0]) * v[..., 1],
                v[..., 2],
            ],
            axis=-1,
        )
    )
    lensq = vh[..., 0] ** 2 + vh[..., 1] ** 2
    inv_len = 1.0 / jnp.sqrt(jnp.maximum(lensq, 1e-20))
    t1 = jnp.where(
        (lensq > 0.0)[..., None],
        jnp.stack([-vh[..., 1], vh[..., 0], jnp.zeros_like(lensq)], axis=-1)
        * inv_len[..., None],
        jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], dtype=v.dtype), vh.shape),
    )
    t2 = cross(vh, t1)
    r = jnp.sqrt(r1)
    phi = TWO_PI * r2
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh[..., 2])
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(1.0 - p1 * p1, 0.0)) + s * p2
    nh = (
        p1[..., None] * t1
        + p2[..., None] * t2
        + jnp.sqrt(jnp.maximum(1.0 - p1 * p1 - p2 * p2, 0.0))[..., None] * vh
    )
    out = jnp.stack(
        [
            (ax if jnp.ndim(ax) == 0 else ax[..., 0]) * nh[..., 0],
            (ay if jnp.ndim(ay) == 0 else ay[..., 0]) * nh[..., 1],
            jnp.maximum(nh[..., 2], 0.0),
        ],
        axis=-1,
    )
    return normalize(out)


def smith_g(n_dot_v: jnp.ndarray, alpha_g) -> jnp.ndarray:
    """Smith masking term (sampling.hlsl:95-100)."""
    a = alpha_g * alpha_g
    b = n_dot_v * n_dot_v
    return (2.0 * n_dot_v) / (n_dot_v + jnp.sqrt(jnp.maximum(a + b - a * b, 0.0)))


def smith_g_aniso(n_dot_v, v_dot_x, v_dot_y, ax, ay) -> jnp.ndarray:
    """Anisotropic Smith masking (sampling.hlsl:102-108)."""
    a = v_dot_x * ax
    b = v_dot_y * ay
    c = n_dot_v
    return (2.0 * n_dot_v) / (n_dot_v + jnp.sqrt(jnp.maximum(a * a + b * b + c * c, 0.0)))


def schlick_weight(u: jnp.ndarray) -> jnp.ndarray:
    """(1-u)^5, clamped (sampling.hlsl:110-115)."""
    m = jnp.clip(1.0 - u, 0.0, 1.0)
    m2 = m * m
    return m2 * m2 * m


def dielectric_fresnel(cos_theta_i: jnp.ndarray, eta) -> jnp.ndarray:
    """Exact unpolarized dielectric Fresnel; 1.0 on TIR (sampling.hlsl:117-135)."""
    sin2_t = eta * eta * (1.0 - cos_theta_i * cos_theta_i)
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    rs = (eta * cos_t - cos_theta_i) / jnp.where(
        eta * cos_t + cos_theta_i == 0.0, 1.0, eta * cos_t + cos_theta_i
    )
    rp = (eta * cos_theta_i - cos_t) / jnp.where(
        eta * cos_theta_i + cos_t == 0.0, 1.0, eta * cos_theta_i + cos_t
    )
    f = 0.5 * (rs * rs + rp * rp)
    return jnp.where(sin2_t > 1.0, 1.0, f)


def cosine_sample_hemisphere(r1: jnp.ndarray, r2: jnp.ndarray) -> jnp.ndarray:
    """Cosine-weighted hemisphere direction, tangent space (sampling.hlsl:137-146)."""
    r = jnp.sqrt(r1)
    phi = TWO_PI * r2
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - x * x - y * y))
    return jnp.stack([x, y, z], axis=-1)


def uniform_sample_hemisphere(r1: jnp.ndarray, r2: jnp.ndarray) -> jnp.ndarray:
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - r1 * r1))
    phi = TWO_PI * r2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), r1], axis=-1)


def uniform_sample_sphere(r1: jnp.ndarray, r2: jnp.ndarray) -> jnp.ndarray:
    z = 1.0 - 2.0 * r1
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = TWO_PI * r2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def power_heuristic(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Beta=2 MIS weight (sampling.hlsl:163-167)."""
    t = a * a
    return t / jnp.where(b * b + t == 0.0, 1.0, b * b + t)


def sample_gaussian(u: jnp.ndarray, v: jnp.ndarray):
    """Box-Muller 2D Gaussian used for AA jitter (``PathTracer.compute:33-38``)."""
    r = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(1e-38, u)))
    theta = TWO_PI * v
    return r * jnp.cos(theta), r * jnp.sin(theta)


def sample_hg(v: jnp.ndarray, g, r1, r2) -> jnp.ndarray:
    """Henyey-Greenstein phase sampling about ``v`` (sampling.hlsl:169-191).

    Present for parity with the reference's (unused) volumetric plumbing
    (``Medium`` struct, common.hlsl:97-104).
    """
    from unity_webgpu_pathtracer_tpu.utils.math import build_onb, to_world

    g = jnp.asarray(g)
    sqr_term = (1.0 - g * g) / jnp.maximum(1.0 + g - 2.0 * g * r2, 1e-6)
    cos_aniso = -(1.0 + g * g - sqr_term * sqr_term) / jnp.where(
        jnp.abs(g) < 1e-6, 1.0, 2.0 * g
    )
    cos_theta = jnp.where(jnp.abs(g) < 0.001, 1.0 - 2.0 * r2, cos_aniso)
    phi = r1 * TWO_PI
    sin_theta = jnp.clip(jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0)), 0.0, 1.0)
    onb = build_onb(v)
    local = jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )
    return to_world(onb, local)


def phase_hg(cos_theta: jnp.ndarray, g) -> jnp.ndarray:
    """HG phase function value (sampling.hlsl:193-197)."""
    denom = 1.0 + g * g + 2.0 * g * cos_theta
    return INV_4_PI * (1.0 - g * g) / (denom * jnp.sqrt(jnp.maximum(denom, 1e-12)))
