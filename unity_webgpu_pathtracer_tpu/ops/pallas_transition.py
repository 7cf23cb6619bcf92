"""Pallas transition (shade) step for the fused wavefront integrator (TPU).

The round-16 trace anatomy (docs/PERFORMANCE.md) prices the non-arrival
"transition" at ~1.8 ms of the 4.28 ms super-iteration; ~0.97 ms of that is
a tail of ~30 small XLA shading fusions (Disney lobes, NEE contribution,
RR, state stitching) plus the (B, 119) state select — each fusion round-
trips its (B, k) intermediates through HBM.  This module runs the entire
per-lane shade/NEE/BSDF/bookkeeping stage as ONE ``pallas_call`` so every
intermediate lives in vregs/VMEM:

* Vectors travel as (3, B) planes (a (B, 3) block would lane-pad 3 -> 128);
  the kernel-side math is a *component-form* ("planes") transcription of
  ``render/bsdf.py`` / ``render/sampling.py`` / ``scene/material.py`` —
  faithful op-for-op so CPU interpret-mode evolution is bit-identical to
  the XLA ``render/fused.py::_transition`` path (modulo FMA contraction).
* The PCG RNG (``utils/rng.py``, reference ``util/random.hlsl:5-16``) runs
  in-kernel in native uint32 (probed exact on Mosaic); the uint32 -> f32
  conversion Mosaic lacks is replaced by an exactly-rounding two-part
  convert (hi24*256 + lo8 — one final rounding, verified bit-identical to
  XLA's convert over 268M samples incl. edge cases).
* Gathers stay OUTSIDE (XLA owns them): the merged env row
  (``scene/envmap.py::sample_env_transition`` — also holds the arccos/
  atan2 Mosaic lacks), the packed attr row + f16 decode, and the
  material record fetch.  Their outputs enter as pre-gathered planes.
* The work-queue regeneration + record-film append stay OUTSIDE too
  (cumsum/sort have no Mosaic lowering); the kernel emits ``died`` /
  ``rad_out`` / pre-regen state and ``render/fused.py`` finishes the
  transition.

Scope (static gate, ``supported()``): the production bench shape —
wide16 traversal, HDRI env NEE with merged rows, no analytic lights, no
textures / normal maps / TLAS, record or legacy-scatter film.  Unsupported
configs fall back to the XLA transition.

Reference semantics covered here: the shade half of the megakernel bounce
loop (``Assets/Resources/util/pathtrace.hlsl:25-128``), the Disney BSDF
(``util/brdf.hlsl:114-340``), sampling kernels (``util/sampling.hlsl``),
sky MIS (``util/sky.hlsl:110-129``), and material derivation
(``util/material.hlsl:84-137``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from unity_webgpu_pathtracer_tpu.utils.math import (
    EPSILON,
    FAR_PLANE,
    INV_PI,
    TWO_PI,
)

BLK = 2048
MIN_BLK = 256
# Lanes travel through the kernel as (SUB, lanes/SUB) 2-D blocks: a 1-D
# (B,) operand tiles as (1, B) vregs on Mosaic — 1 of 8 sublanes used —
# so every per-lane column op would run at 1/8 VPU rate.  Reshaping each
# column to (8, B/8) (and each (R, B) plane to (R*8, B/8), component r =
# rows [8r, 8r+8)) fills the vregs; the math is purely elementwise per
# lane, so results are bit-identical to the 1-D layout.
SUB = 8

# Mode constants — MUST match render/fused.py (asserted there at import).
MODE_PRIMARY = 0
MODE_SHADOW_ENV = 1
MODE_SHADOW_LIGHT = 2
MODE_DEAD = 3

FULL16 = 0xFFFF  # traverse_wide16.FULL (fresh-ray pending mask)

_F32 = jnp.float32


# ---------------------------------------------------------------------------
# planes-dialect vector helpers: a vec3 is a tuple of three (B,) arrays.
# Every helper mirrors its utils/math.py counterpart op-for-op.
# ---------------------------------------------------------------------------

def _vdot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _vcross(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def _vscale(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def _vadd(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _vsub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _vneg(a):
    return (-a[0], -a[1], -a[2])


def _vwhere(m, a, b):
    return (jnp.where(m, a[0], b[0]),
            jnp.where(m, a[1], b[1]),
            jnp.where(m, a[2], b[2]))


def _vnormalize(v, eps=1.0e-20):
    # utils.math.normalize: v * (1/sqrt(max(dot, eps)))
    s = 1.0 / jnp.sqrt(jnp.maximum(_vdot(v, v), eps))
    return _vscale(v, s)


def _vreflect(i, n):
    d = _vdot(i, n)
    return (i[0] - 2.0 * d * n[0], i[1] - 2.0 * d * n[1],
            i[2] - 2.0 * d * n[2])


def _vrefract(i, n, eta):
    cos_i = -_vdot(i, n)
    k = 1.0 - eta * eta * (1.0 - cos_i * cos_i)
    coef = eta * cos_i - jnp.sqrt(jnp.maximum(k, 0.0))
    refr = (eta * i[0] + coef * n[0], eta * i[1] + coef * n[1],
            eta * i[2] + coef * n[2])
    zero = jnp.zeros_like(k)
    bad = k < 0.0
    return (jnp.where(bad, zero, refr[0]), jnp.where(bad, zero, refr[1]),
            jnp.where(bad, zero, refr[2]))


def _lum(c):
    return (c[0] * _F32(0.299) + c[1] * _F32(0.587) + c[2] * _F32(0.114))


def _safe_div(a, b, eps=1e-20):
    return a / jnp.where(jnp.abs(b) < eps, jnp.where(b < 0, -eps, eps), b)


def _schlick_weight(u):
    m = jnp.clip(1.0 - u, 0.0, 1.0)
    m2 = m * m
    return m2 * m2 * m


def _dielectric_fresnel(cos_theta_i, eta):
    sin2_t = eta * eta * (1.0 - cos_theta_i * cos_theta_i)
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    rs = (eta * cos_t - cos_theta_i) / jnp.where(
        eta * cos_t + cos_theta_i == 0.0, 1.0, eta * cos_t + cos_theta_i)
    rp = (eta * cos_theta_i - cos_t) / jnp.where(
        eta * cos_theta_i + cos_t == 0.0, 1.0, eta * cos_theta_i + cos_t)
    f = 0.5 * (rs * rs + rp * rp)
    return jnp.where(sin2_t > 1.0, 1.0, f)


def _smith_g(n_dot_v, alpha_g):
    a = alpha_g * alpha_g
    b = n_dot_v * n_dot_v
    return (2.0 * n_dot_v) / (n_dot_v + jnp.sqrt(jnp.maximum(a + b - a * b, 0.0)))


def _smith_g_aniso(n_dot_v, v_dot_x, v_dot_y, ax, ay):
    a = v_dot_x * ax
    b = v_dot_y * ay
    c = n_dot_v
    return (2.0 * n_dot_v) / (n_dot_v + jnp.sqrt(jnp.maximum(a * a + b * b + c * c, 0.0)))


def _gtr1(n_dot_h, a):
    a2 = a * a
    t = 1.0 + (a2 - 1.0) * n_dot_h * n_dot_h
    d = (a2 - 1.0) / (_F32(3.14159265358979323) * jnp.log(a2) * t)
    return jnp.where(a >= 1.0, _F32(INV_PI), d)


def _gtr2_aniso(n_dot_h, h_dot_x, h_dot_y, ax, ay):
    a = h_dot_x / ax
    b = h_dot_y / ay
    c = a * a + b * b + n_dot_h * n_dot_h
    return 1.0 / (_F32(3.14159265358979323) * ax * ay * c * c)


def _power_heuristic(a, b):
    t = a * a
    return t / jnp.where(b * b + t == 0.0, 1.0, b * b + t)


def _build_onb(z):
    """Planes transcription of utils.math.build_onb (frisvad + guard)."""
    len_sq = _vdot(z, z)
    zn = _vnormalize(z)
    zx, zy, zz = zn
    k = 1.0 / jnp.maximum(1.0 + zz, 1.0e-5)
    a = zy * k
    b = zy * a
    c = -zx * a
    x = _vnormalize((zz + b, c, -zx))
    y = _vnormalize((c, 1.0 - b, -zy))
    deg = len_sq == 0.0
    one = jnp.ones_like(zx)
    zero = jnp.zeros_like(zx)
    x = _vwhere(deg, (one, zero, zero), x)
    y = _vwhere(deg, (zero, one, zero), y)
    zn = _vwhere(deg, (zero, zero, one), zn)
    return x, y, zn


def _to_local(onb, w):
    x, y, z = onb
    return (_vdot(x, w), _vdot(y, w), _vdot(z, w))


def _to_world(onb, local):
    x, y, z = onb
    return (x[0] * local[0] + y[0] * local[1] + z[0] * local[2],
            x[1] * local[0] + y[1] * local[1] + z[1] * local[2],
            x[2] * local[0] + y[2] * local[1] + z[2] * local[2])


def _cosine_sample_hemisphere(r1, r2):
    r = jnp.sqrt(r1)
    phi = _F32(TWO_PI) * r2
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - x * x - y * y))
    return (x, y, z)


def _sample_gtr1(rgh, r1, r2):
    a = jnp.maximum(rgh, 0.001)
    a2 = a * a
    phi = r1 * _F32(TWO_PI)
    cos_theta = jnp.sqrt(
        jnp.maximum((1.0 - jnp.power(a2, 1.0 - r2)) / (1.0 - a2), 0.0))
    sin_theta = jnp.clip(
        jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0)), 0.0, 1.0)
    return (sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta)


def _sample_ggx_vndf(v, ax, ay, r1, r2):
    vh = _vnormalize((ax * v[0], ay * v[1], v[2]))
    lensq = vh[0] * vh[0] + vh[1] * vh[1]
    inv_len = 1.0 / jnp.sqrt(jnp.maximum(lensq, 1e-20))
    has = lensq > 0.0
    one = jnp.ones_like(lensq)
    zero = jnp.zeros_like(lensq)
    t1 = _vwhere(has, (-vh[1] * inv_len, vh[0] * inv_len, zero),
                 (one, zero, zero))
    t2 = _vcross(vh, t1)
    r = jnp.sqrt(r1)
    phi = _F32(TWO_PI) * r2
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh[2])
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(1.0 - p1 * p1, 0.0)) + s * p2
    p3 = jnp.sqrt(jnp.maximum(1.0 - p1 * p1 - p2 * p2, 0.0))
    nh = (p1 * t1[0] + p2 * t2[0] + p3 * vh[0],
          p1 * t1[1] + p2 * t2[1] + p3 * vh[1],
          p1 * t1[2] + p2 * t2[2] + p3 * vh[2])
    return _vnormalize((ax * nh[0], ay * nh[1], jnp.maximum(nh[2], 0.0)))


# ---------------------------------------------------------------------------
# In-kernel PCG RNG (uint32-native; exact on Mosaic per round-18 probe).
# ---------------------------------------------------------------------------

def _pcg_next(state):
    old = state + jnp.uint32(747796405) + jnp.uint32(2891336453)
    shift = (old >> jnp.uint32(28)) + jnp.uint32(4)
    word = ((old >> shift) ^ old) * jnp.uint32(277803737)
    return (word >> jnp.uint32(22)) ^ word


def _u32_to_f32_exact(u):
    """uint32 -> f32, bit-identical to XLA's convert (Mosaic lacks the
    direct cast).  hi24*256 is exact, the final add rounds once — the same
    single correct rounding the hardware convert performs (verified
    exhaustively-at-scale in experiments/round18_mosaic_probe.py notes)."""
    i = jax.lax.bitcast_convert_type(u, jnp.int32)
    hi = ((i >> 8) & 0xFFFFFF).astype(jnp.float32)
    lo = (i & 0xFF).astype(jnp.float32)
    return hi * 256.0 + lo


def _rand_f32(state):
    state = _pcg_next(state)
    u = _u32_to_f32_exact(state) * _F32(1.0 / 4294967295.0)
    return u, state


# ---------------------------------------------------------------------------
# planes-form material + Disney BSDF (transcribed from render/bsdf.py).
# ---------------------------------------------------------------------------

class MatP(NamedTuple):
    bc: tuple                 # base color (3-tuple of (B,))
    opacity: jnp.ndarray
    emission: tuple           # (3-tuple)
    alpha_mode: jnp.ndarray   # int32
    alpha_cutoff: jnp.ndarray
    roughness: jnp.ndarray    # post max_roughness override
    subsurface: jnp.ndarray
    spec_tint: jnp.ndarray
    sheen: jnp.ndarray
    sheen_tint: jnp.ndarray
    clearcoat: jnp.ndarray
    cc_rough: jnp.ndarray
    spec_trans: jnp.ndarray
    ior: jnp.ndarray
    metallic: jnp.ndarray
    ax: jnp.ndarray
    ay: jnp.ndarray
    eta: jnp.ndarray


def _lobe_probabilities(mat: MatP, v):
    """brdf.hlsl:137-156 via render/bsdf.py::_lobe_probabilities."""
    lum_bc = _lum(mat.bc)
    lum_den = jnp.maximum(lum_bc, 1e-20)
    has = lum_bc > 0.0
    one = jnp.ones_like(lum_bc)
    ctint = _vwhere(has, (mat.bc[0] / lum_den, mat.bc[1] / lum_den,
                          mat.bc[2] / lum_den), (one, one, one))
    f0 = ((1.0 - mat.eta) / (1.0 + mat.eta)) ** 2
    cspec0 = (f0 * (1.0 + (ctint[0] - 1.0) * mat.spec_tint),
              f0 * (1.0 + (ctint[1] - 1.0) * mat.spec_tint),
              f0 * (1.0 + (ctint[2] - 1.0) * mat.spec_tint))
    csheen = (1.0 + (ctint[0] - 1.0) * mat.sheen_tint,
              1.0 + (ctint[1] - 1.0) * mat.sheen_tint,
              1.0 + (ctint[2] - 1.0) * mat.sheen_tint)
    dielectric_wt = (1.0 - mat.metallic) * (1.0 - mat.spec_trans)
    metal_wt = mat.metallic
    glass_wt = (1.0 - mat.metallic) * mat.spec_trans
    sw = _schlick_weight(v[2])
    diff_pr = dielectric_wt * _lum(mat.bc)
    dielectric_pr = dielectric_wt * _lum(
        (cspec0[0] + (1.0 - cspec0[0]) * sw,
         cspec0[1] + (1.0 - cspec0[1]) * sw,
         cspec0[2] + (1.0 - cspec0[2]) * sw))
    metal_pr = metal_wt * _lum(
        (mat.bc[0] + (1.0 - mat.bc[0]) * sw,
         mat.bc[1] + (1.0 - mat.bc[1]) * sw,
         mat.bc[2] + (1.0 - mat.bc[2]) * sw))
    glass_pr = glass_wt
    clearcoat_pr = 0.25 * mat.clearcoat
    total = diff_pr + dielectric_pr + metal_pr + glass_pr + clearcoat_pr
    inv_total = _safe_div(jnp.ones_like(total), total)
    return ((diff_pr * inv_total, dielectric_pr * inv_total,
             metal_pr * inv_total, glass_pr * inv_total,
             clearcoat_pr * inv_total),
            (dielectric_wt, metal_wt, glass_wt),
            (f0, csheen, cspec0))


def _eval_diffuse(mat: MatP, csheen, v, l, h):
    lz, vz = l[2], v[2]
    l_dot_h = _vdot(l, h)
    rr = 2.0 * mat.roughness * l_dot_h * l_dot_h
    fl = _schlick_weight(lz)
    fv = _schlick_weight(vz)
    fretro = rr * (fl + fv + fl * fv * (rr - 1.0))
    fd = (1.0 - 0.5 * fl) * (1.0 - 0.5 * fv)
    fss90 = 0.5 * rr
    fss = (1.0 + (fss90 - 1.0) * fl) * (1.0 + (fss90 - 1.0) * fv)
    ss = 1.25 * (fss * (_safe_div(jnp.ones_like(lz), lz + vz) - 0.5) + 0.5)
    fh = _schlick_weight(l_dot_h)
    coef = (fd + fretro) + (ss - (fd + fretro)) * mat.subsurface
    f = (_F32(INV_PI) * mat.bc[0] * coef + fh * mat.sheen * csheen[0],
         _F32(INV_PI) * mat.bc[1] * coef + fh * mat.sheen * csheen[1],
         _F32(INV_PI) * mat.bc[2] * coef + fh * mat.sheen * csheen[2])
    pdf = lz * _F32(INV_PI)
    valid = lz > 0.0
    zero = jnp.zeros_like(lz)
    return _vwhere(valid, f, (zero, zero, zero)), jnp.where(valid, pdf, 0.0)


def _eval_microfacet_reflection(mat: MatP, v, l, h, f_term):
    lz, vz = l[2], v[2]
    d = _gtr2_aniso(h[2], h[0], h[1], mat.ax, mat.ay)
    g1 = _smith_g_aniso(jnp.abs(vz), v[0], v[1], mat.ax, mat.ay)
    g2 = g1 * _smith_g_aniso(jnp.abs(lz), l[0], l[1], mat.ax, mat.ay)
    pdf = _safe_div(g1 * d, 4.0 * vz)
    coef = _safe_div(d * g2, 4.0 * lz * vz)
    f = (f_term[0] * coef, f_term[1] * coef, f_term[2] * coef)
    valid = lz > 0.0
    zero = jnp.zeros_like(lz)
    return _vwhere(valid, f, (zero, zero, zero)), jnp.where(valid, pdf, 0.0)


def _eval_microfacet_refraction(mat: MatP, eta, v, l, h, f_term):
    lz, vz = l[2], v[2]
    l_dot_h = _vdot(l, h)
    v_dot_h = _vdot(v, h)
    d = _gtr2_aniso(h[2], h[0], h[1], mat.ax, mat.ay)
    g1 = _smith_g_aniso(jnp.abs(vz), v[0], v[1], mat.ax, mat.ay)
    g2 = g1 * _smith_g_aniso(jnp.abs(lz), l[0], l[1], mat.ax, mat.ay)
    denom = (l_dot_h + v_dot_h * eta) ** 2
    eta2 = eta * eta
    jacobian = _safe_div(jnp.abs(l_dot_h), denom)
    pdf = _safe_div(g1 * jnp.maximum(0.0, v_dot_h) * d * jacobian, vz)
    # Match bsdf.py's left-assoc product: ((sqrt(bc)*(1-F))*coef1)*coef2.
    coef1 = d * g2 * jnp.abs(v_dot_h) * jacobian * eta2
    coef2 = _safe_div(jnp.ones_like(lz), jnp.abs(lz * vz))
    f = (jnp.sqrt(jnp.maximum(mat.bc[0], 0.0)) * (1.0 - f_term) * coef1 * coef2,
         jnp.sqrt(jnp.maximum(mat.bc[1], 0.0)) * (1.0 - f_term) * coef1 * coef2,
         jnp.sqrt(jnp.maximum(mat.bc[2], 0.0)) * (1.0 - f_term) * coef1 * coef2)
    valid = lz < 0.0
    zero = jnp.zeros_like(lz)
    return _vwhere(valid, f, (zero, zero, zero)), jnp.where(valid, pdf, 0.0)


def _eval_clearcoat(mat: MatP, v, l, h):
    lz, vz = l[2], v[2]
    v_dot_h = _vdot(v, h)
    f = 0.04 + 0.96 * _schlick_weight(v_dot_h)
    d = _gtr1(h[2], mat.cc_rough)
    g = _smith_g(lz, _F32(0.25)) * _smith_g(vz, _F32(0.25))
    jacobian = _safe_div(jnp.ones_like(lz), 4.0 * v_dot_h)
    pdf = d * h[2] * jacobian
    valid = lz > 0.0
    fo_s = jnp.where(valid, f * d * g, 0.0)
    return (fo_s, fo_s, fo_s), jnp.where(valid, pdf, 0.0)


def _eval_brdf_local(mat: MatP, v, l, probs):
    """render/bsdf.py::_eval_brdf_local, planes form (brdf.hlsl:114-225).

    ``probs`` is the shared _lobe_probabilities(mat, v) result (XLA
    computes it twice and CSEs; here it is hoisted explicitly)."""
    lz, vz = l[2], v[2]
    h_refl = _vnormalize(_vadd(l, v))
    h_refr = _vnormalize((l[0] + v[0] * mat.eta, l[1] + v[1] * mat.eta,
                          l[2] + v[2] * mat.eta))
    h = _vwhere(lz > 0.0, h_refl, h_refr)
    h = _vwhere(h[2] < 0.0, _vneg(h), h)

    ((diff_pr, dielectric_pr, metal_pr, glass_pr, clearcoat_pr),
     (dielectric_wt, metal_wt, glass_wt), (f0, csheen, cspec0)) = probs

    reflect_side = lz * vz > 0.0
    v_dot_h = jnp.abs(_vdot(v, h))

    zero = jnp.zeros_like(lz)
    f = (zero, zero, zero)
    pdf = zero

    # Diffuse
    fd, pd = _eval_diffuse(mat, csheen, v, l, h)
    gate = (diff_pr > 0.0) & reflect_side
    f = (f[0] + jnp.where(gate, fd[0] * dielectric_wt, 0.0),
         f[1] + jnp.where(gate, fd[1] * dielectric_wt, 0.0),
         f[2] + jnp.where(gate, fd[2] * dielectric_wt, 0.0))
    pdf = pdf + jnp.where(gate, pd * diff_pr, 0.0)

    # Dielectric reflection (Fresnel normalized against F0)
    inv_eta = _safe_div(jnp.ones_like(lz), mat.ior)
    fres = _safe_div(_dielectric_fresnel(v_dot_h, inv_eta) - f0, 1.0 - f0)
    fres = jnp.where((f0 != 1.0) & (mat.ior != 0.0), fres, 0.0)
    f_term = (cspec0[0] + (1.0 - cspec0[0]) * fres,
              cspec0[1] + (1.0 - cspec0[1]) * fres,
              cspec0[2] + (1.0 - cspec0[2]) * fres)
    fr, pr = _eval_microfacet_reflection(mat, v, l, h, f_term)
    gate = (dielectric_pr > 0.0) & reflect_side
    f = (f[0] + jnp.where(gate, fr[0] * dielectric_wt, 0.0),
         f[1] + jnp.where(gate, fr[1] * dielectric_wt, 0.0),
         f[2] + jnp.where(gate, fr[2] * dielectric_wt, 0.0))
    pdf = pdf + jnp.where(gate, pr * dielectric_pr, 0.0)

    # Metallic reflection (Schlick to white)
    sw_vh = _schlick_weight(v_dot_h)
    f_metal = (mat.bc[0] + (1.0 - mat.bc[0]) * sw_vh,
               mat.bc[1] + (1.0 - mat.bc[1]) * sw_vh,
               mat.bc[2] + (1.0 - mat.bc[2]) * sw_vh)
    fm, pm = _eval_microfacet_reflection(mat, v, l, h, f_metal)
    gate = (metal_pr > 0.0) & reflect_side
    f = (f[0] + jnp.where(gate, fm[0] * metal_wt, 0.0),
         f[1] + jnp.where(gate, fm[1] * metal_wt, 0.0),
         f[2] + jnp.where(gate, fm[2] * metal_wt, 0.0))
    pdf = pdf + jnp.where(gate, pm * metal_pr, 0.0)

    # Glass reflect/refract (achromatic Fresnel split)
    f_glass = _dielectric_fresnel(v_dot_h, mat.eta)
    fgr, pgr = _eval_microfacet_reflection(
        mat, v, l, h, (f_glass, f_glass, f_glass))
    fgt, pgt = _eval_microfacet_refraction(
        mat, mat.eta, v, l, h, f_glass)
    gate = glass_pr > 0.0
    fg = _vwhere(reflect_side, fgr, fgt)
    f = (f[0] + jnp.where(gate, fg[0] * glass_wt, 0.0),
         f[1] + jnp.where(gate, fg[1] * glass_wt, 0.0),
         f[2] + jnp.where(gate, fg[2] * glass_wt, 0.0))
    pdf = pdf + jnp.where(
        gate,
        jnp.where(reflect_side, pgr * glass_pr * f_glass,
                  pgt * glass_pr * (1.0 - f_glass)),
        0.0)

    # Clearcoat
    fc, pc = _eval_clearcoat(mat, v, l, h)
    gate = (clearcoat_pr > 0.0) & reflect_side
    cc_w = 0.25 * mat.clearcoat
    f = (f[0] + jnp.where(gate, fc[0] * cc_w, 0.0),
         f[1] + jnp.where(gate, fc[1] * cc_w, 0.0),
         f[2] + jnp.where(gate, fc[2] * cc_w, 0.0))
    pdf = pdf + jnp.where(gate, pc * clearcoat_pr, 0.0)

    # occlusion is identically 1 in the untextured configs this kernel
    # serves (material.hlsl occlusion texture fallback) — skip the multiply.
    alz = jnp.abs(lz)
    return (f[0] * alz, f[1] * alz, f[2] * alz), pdf


def _sample_brdf(mat: MatP, onb, v, probs, state):
    """render/bsdf.py::sample_brdf with the ONB/v/probs hoisted (same
    values — XLA CSEs the duplicates).  Returns (f, l_world, pdf, state)."""
    r1, state = _rand_f32(state)
    r2, state = _rand_f32(state)
    r3, state = _rand_f32(state)

    (diff_pr, dielectric_pr, metal_pr, glass_pr, _cc_pr), _, _ = probs
    cdf0 = diff_pr
    cdf1 = cdf0 + dielectric_pr
    cdf2 = cdf1 + metal_pr
    cdf3 = cdf2 + glass_pr

    l_diff = _cosine_sample_hemisphere(r1, r2)

    h_ggx = _sample_ggx_vndf(v, mat.ax, mat.ay, r1, r2)
    h_ggx = _vwhere(h_ggx[2] < 0.0, _vneg(h_ggx), h_ggx)
    l_spec = _vnormalize(_vreflect(_vneg(v), h_ggx))

    f_glass = _dielectric_fresnel(jnp.abs(_vdot(v, h_ggx)), mat.eta)
    r3_rescaled = _safe_div(r3 - cdf2, cdf3 - cdf2)
    l_refr = _vnormalize(_vrefract(_vneg(v), h_ggx, mat.eta))
    l_glass = _vwhere(r3_rescaled < f_glass, l_spec, l_refr)

    h_cc = _sample_gtr1(mat.cc_rough, r1, r2)
    h_cc = _vwhere(h_cc[2] < 0.0, _vneg(h_cc), h_cc)
    l_cc = _vnormalize(_vreflect(_vneg(v), h_cc))

    l = _vwhere(r3 < cdf0, l_diff,
                _vwhere(r3 < cdf2, l_spec,
                        _vwhere(r3 < cdf3, l_glass, l_cc)))

    f, pdf = _eval_brdf_local(mat, v, l, probs)
    return f, _to_world(onb, l), pdf, state


# ---------------------------------------------------------------------------
# The kernel.
# ---------------------------------------------------------------------------

def _f16_decode(h):
    """Exact f16 -> f32 on an i32 halfword value (0..65535): normals
    (exponent rebias), subnormals (exact 10-bit int -> f32 product), and
    inf/NaN (e=31) — bit-identical to XLA's bitcast-f16 + convert-f32
    (the path this replaces in render/fused.py::_transition_pallas)."""
    s = (h >> 15) & 1
    e = (h >> 10) & 0x1F
    m = h & 0x3FF
    bits = (s << 31) | ((e + 112) << 23) | (m << 13)
    bits = jnp.where(e == 31, (s << 31) | (0xFF << 23) | (m << 13), bits)
    v = jax.lax.bitcast_convert_type(bits, jnp.float32)
    m_f = m.astype(jnp.float32) * _F32(2.0 ** -24)
    v_sub = jnp.where(s != 0, -m_f, m_f)
    return jnp.where(e == 0, v_sub, v)


def _transition_kernel(use_rr, max_bounces, firefly, nan_canary, attr_raw,
                       *refs):
    if attr_raw:
        (mode_ref, done_ref, ptr_ref, pend_ref, sp_ref,
         t_ref, u_ref, v_ref, tri_ref, found_ref,
         trav_oT_ref, trav_dT_ref,
         path_oT_ref, path_dT_ref,
         hit_t_ref, hit_baryT_ref, hit_tri_ref,
         pendingT_ref, throughputT_ref, radianceT_ref,
         rng_ref, depth_ref, max_rough_ref, prev_pdf_ref, cap_ref,
         pairT_ref, parity_ref, mdataT_ref,
         sky_colT_ref, sky_pdf_ref, env_dirT_ref, env_liT_ref, env_pdf_ref,
         ffly_ref,
         o_mode, o_ptr, o_pend, o_sp, o_t, o_u, o_v, o_tri, o_found,
         o_trav_oT, o_trav_dT, o_path_oT, o_path_dT,
         o_hit_t, o_hit_baryT, o_hit_tri,
         o_pendingT, o_throughputT, o_radianceT, o_rad_outT,
         o_rng, o_depth, o_max_rough, o_prev_pdf, o_cap,
         o_died, o_nray) = refs
        shade_rowT_ref = None
    else:
        (mode_ref, done_ref, ptr_ref, pend_ref, sp_ref,
         t_ref, u_ref, v_ref, tri_ref, found_ref,
         trav_oT_ref, trav_dT_ref,
         path_oT_ref, path_dT_ref,
         hit_t_ref, hit_baryT_ref, hit_tri_ref,
         pendingT_ref, throughputT_ref, radianceT_ref,
         rng_ref, depth_ref, max_rough_ref, prev_pdf_ref, cap_ref,
         shade_rowT_ref, mdataT_ref,
         sky_colT_ref, sky_pdf_ref, env_dirT_ref, env_liT_ref, env_pdf_ref,
         ffly_ref,
         o_mode, o_ptr, o_pend, o_sp, o_t, o_u, o_v, o_tri, o_found,
         o_trav_oT, o_trav_dT, o_path_oT, o_path_dT,
         o_hit_t, o_hit_baryT, o_hit_tri,
         o_pendingT, o_throughputT, o_radianceT, o_rad_outT,
         o_rng, o_depth, o_max_rough, o_prev_pdf, o_cap,
         o_died, o_nray) = refs

    def comp(a, i):
        """Component i of a multi-plane block: leading index in the 3-D
        (R, k, 8, 128) layout, rows [8i, 8i+8) in the 2-D (R*8, cb) one."""
        return a[i] if a.ndim == 4 else a[SUB * i:SUB * (i + 1)]

    def p3(ref):
        a = ref[:]
        return (comp(a, 0), comp(a, 1), comp(a, 2))

    mode = mode_ref[:]
    trav_done = done_ref[:] != 0
    found = found_ref[:] != 0
    t_in, u_in, v_in = t_ref[:], u_ref[:], v_ref[:]
    tri_in = tri_ref[:]
    path_o = p3(path_oT_ref)
    path_d = p3(path_dT_ref)
    pending = p3(pendingT_ref)
    throughput = p3(throughputT_ref)
    radiance = p3(radianceT_ref)
    depth = depth_ref[:]
    rng = rng_ref[:]
    zero = jnp.zeros_like(t_in)

    shadow_done = trav_done | found
    a = (mode == MODE_PRIMARY) & trav_done
    hit_valid = tri_in >= 0

    # --- miss -> sky with MIS (env sample pre-gathered outside) ---
    sky_col = p3(sky_colT_ref)
    sky_pdf = sky_pdf_ref[:]
    mis = jnp.where(depth > 0,
                    _power_heuristic(prev_pdf_ref[:], sky_pdf), 1.0)
    miss = a & ~hit_valid
    g_miss = miss & (mis > 0)
    radiance = (radiance[0] + jnp.where(g_miss, mis * sky_col[0] * throughput[0], 0.0),
                radiance[1] + jnp.where(g_miss, mis * sky_col[1] * throughput[1], 0.0),
                radiance[2] + jnp.where(g_miss, mis * sky_col[2] * throughput[2], 0.0))

    shade = a & hit_valid

    # --- unified hit frame: interp normal from the pre-gathered attr row ---
    hbary = hit_baryT_ref[:]
    hit_bary = (comp(hbary, 0), comp(hbary, 1))
    b0 = jnp.where(a, u_in, hit_bary[0])
    b1 = jnp.where(a, v_in, hit_bary[1])
    sel_t = jnp.where(a, t_in, hit_t_ref[:])
    if attr_raw:
        # Raw 64-byte attr pair rows (u32 planes, int view): select this
        # tri's 8-word half by parity, split halfwords, exact f16 decode
        # — the XLA decode + kernel-feed staging this replaces was
        # ~0.15 ms/super of copies/bitcasts (round-19 HLO map).
        pw_all = pairT_ref[:]
        pw = [comp(pw_all, i) for i in range(16)]
        even = parity_ref[:] == 0
        sr = []
        for w in range(5):                      # halfwords 0..9 (need 0..8)
            word = jnp.where(even, pw[w], pw[8 + w])
            sr.append(_f16_decode(word & 0xFFFF))
            sr.append(_f16_decode((word >> 16) & 0xFFFF))
        sr = sr[:9]
    else:
        sr_all = shade_rowT_ref[:]
        sr = [comp(sr_all, i) for i in range(9)]
    w0 = 1.0 - b0 - b1
    normal = _vnormalize((sr[0] * w0 + sr[3] * b0 + sr[6] * b1,
                          sr[1] * w0 + sr[4] * b0 + sr[7] * b1,
                          sr[2] * w0 + sr[5] * b0 + sr[8] * b1))
    # uv (rows 9:15) feeds nothing in the untextured configs served here.

    # --- material derive (material.hlsl:84-137, untextured path) ---
    md_all = mdataT_ref[:]
    md = [comp(md_all, i) for i in range(22)]
    opacity = md[3]
    rough_m = jnp.maximum(md[9], 0.001)
    ior = jnp.clip(md[11], 1.001, 2.0)
    aniso = jnp.clip(md[13], -0.9, 0.9)
    aspect = jnp.sqrt(1.0 - aniso * 0.9)
    entering = (path_d[0] * normal[0] + path_d[1] * normal[1]
                + path_d[2] * normal[2]) < 0.0
    max_rough = jnp.where(shade,
                          jnp.maximum(max_rough_ref[:], rough_m),
                          max_rough_ref[:])
    mat = MatP(
        bc=(md[0], md[1], md[2]),
        opacity=opacity,
        emission=(md[4], md[5], md[6]),
        alpha_mode=md[12].astype(jnp.int32),
        alpha_cutoff=md[7],
        roughness=max_rough,
        subsurface=md[18],
        spec_tint=md[15],
        sheen=md[16],
        sheen_tint=md[17],
        clearcoat=md[19],
        cc_rough=0.1 + (0.001 - 0.1) * md[20],
        spec_trans=1.0 - jnp.clip(opacity, 0.0, 1.0),
        ior=ior,
        metallic=md[8],
        ax=jnp.maximum(0.001, max_rough / aspect),
        ay=jnp.maximum(0.001, max_rough * aspect),
        eta=jnp.where(entering, 1.0 / ior, ior),
    )
    nd = normal[0] * path_d[0] + normal[1] * path_d[1] + normal[2] * path_d[2]
    ffnormal = _vwhere(nd <= 0.0, normal, _vneg(normal))
    position = (path_o[0] + sel_t * path_d[0],
                path_o[1] + sel_t * path_d[1],
                path_o[2] + sel_t * path_d[2])
    scatter_pos = (position[0] + normal[0] * _F32(EPSILON),
                   position[1] + normal[1] * _F32(EPSILON),
                   position[2] + normal[2] * _F32(EPSILON))

    radiance = (radiance[0] + jnp.where(shade, mat.emission[0] * throughput[0], 0.0),
                radiance[1] + jnp.where(shade, mat.emission[1] * throughput[1], 0.0),
                radiance[2] + jnp.where(shade, mat.emission[2] * throughput[2], 0.0))
    over_budget = depth >= max_bounces
    ended_budget = shade & over_budget
    shade = shade & ~over_budget

    # --- alpha passthrough (pathtrace.hlsl:84-89) ---
    u_alpha, rng = _rand_f32(rng)
    passthrough = shade & (
        ((mat.alpha_mode == 2) & (mat.opacity < mat.alpha_cutoff))
        | ((mat.alpha_mode == 1) & (u_alpha > mat.opacity)))
    shade = shade & ~passthrough

    # --- shadow traversal finished -> apply pending contribution ---
    env_done = (mode == MODE_SHADOW_ENV) & shadow_done
    unoccluded = ~found
    g_app = env_done & unoccluded
    radiance = (radiance[0] + jnp.where(g_app, pending[0] * throughput[0], 0.0),
                radiance[1] + jnp.where(g_app, pending[1] * throughput[1], 0.0),
                radiance[2] + jnp.where(g_app, pending[2] * throughput[2], 0.0))

    to_env = shade
    to_bsdf = env_done

    # --- shared shading frame (ONB/v/probs used by both NEE eval and the
    # BSDF sample; bsdf.py builds them twice and XLA CSEs) ---
    onb = _build_onb(ffnormal)
    v_local = _to_local(onb, _vneg(path_d))
    probs = _lobe_probabilities(mat, v_local)

    # --- env NEE eval + contribution (light.hlsl:125-158) ---
    env_dir = p3(env_dirT_ref)
    env_li = p3(env_liT_ref)
    env_pdf = env_pdf_ref[:]
    l_env = _to_local(onb, env_dir)
    f_u, bpdf_u = _eval_brdf_local(mat, v_local, l_env, probs)
    mis_e = _power_heuristic(env_pdf, bpdf_u)
    epdf_den = jnp.maximum(env_pdf, 1e-20)
    contrib = (mis_e * env_li[0] * f_u[0] / epdf_den,
               mis_e * env_li[1] * f_u[1] / epdf_den,
               mis_e * env_li[2] * f_u[2] / epdf_den)
    ok = (bpdf_u > 0) & (env_pdf > 0) & (mis_e > 0)
    z3 = (zero, zero, zero)
    pending = _vwhere(to_env, _vwhere(ok, contrib, z3), pending)

    # _set_trav(to_env): fresh shadow segment at the root.
    trav_o = _vwhere(to_env, scatter_pos, p3(trav_oT_ref))
    trav_d = _vwhere(to_env, env_dir, p3(trav_dT_ref))
    ptr = jnp.where(to_env, 0, ptr_ref[:])
    pend_m = jnp.where(to_env, FULL16, pend_ref[:])
    sp = jnp.where(to_env, 0, sp_ref[:])
    t_out = jnp.where(to_env, _F32(FAR_PLANE), t_in)
    u_out = jnp.where(to_env, 0.0, u_in)
    v_out = jnp.where(to_env, 0.0, v_in)
    tri_out = jnp.where(to_env, -1, tri_in)
    # found stays i32 in-kernel: a select between a Python bool literal and
    # an i1 vector lowers to an i8->i1 trunci Mosaic rejects ("Unsupported
    # target bitwidth for truncation").
    found_out = jnp.where(to_env, 0, found_ref[:])
    new_mode = jnp.where(to_env, MODE_SHADOW_ENV, mode)

    # --- BSDF sample + Russian roulette -> next bounce or death ---
    f_s, l_s, pdf_s, rng = _sample_brdf(mat, onb, v_local, probs, rng)
    nan_lane = ((f_s[0] != f_s[0]) | (f_s[1] != f_s[1])
                | (f_s[2] != f_s[2]) | (pdf_s != pdf_s))
    sample_ok = to_bsdf & ~nan_lane & (pdf_s > 0.0)
    pdf_den = jnp.maximum(pdf_s, 1e-20)
    throughput = _vwhere(sample_ok,
                         (throughput[0] * f_s[0] / pdf_den,
                          throughput[1] * f_s[1] / pdf_den,
                          throughput[2] * f_s[2] / pdf_den),
                         throughput)
    continue_ray = sample_ok
    if use_rr:
        u_rr, rng = _rand_f32(rng)
        t_max3 = jnp.maximum(jnp.maximum(throughput[0], throughput[1]),
                             throughput[2])
        p_cont = jnp.minimum(t_max3 + 0.001, 0.95)
        rr_kill = continue_ray & (u_rr >= p_cont)
        keep = continue_ray & ~rr_kill
        throughput = _vwhere(keep,
                             (throughput[0] / p_cont, throughput[1] / p_cont,
                              throughput[2] / p_cont),
                             throughput)
        continue_ray = continue_ray & ~rr_kill

    processed = a | env_done
    cap = cap_ref[:]
    cap_exhausted = processed & (cap <= 0)
    died = (miss | ended_budget | (to_bsdf & ~continue_ray) | cap_exhausted)

    rad_out = radiance
    if firefly:
        lum = _lum(rad_out)
        ffly = ffly_ref[0]
        scale = jnp.where(lum > ffly, ffly / jnp.maximum(lum, 1e-20), 1.0)
        rad_out = (rad_out[0] * scale, rad_out[1] * scale, rad_out[2] * scale)
    if nan_canary:
        g_nan = to_bsdf & nan_lane
        rad_out = (jnp.where(g_nan, 0.0, rad_out[0]),
                   jnp.where(g_nan, 1.0, rad_out[1]),
                   jnp.where(g_nan, 0.0, rad_out[2]))

    # --- continuing bounce: new primary ray ---
    new_dir = _vwhere(passthrough, path_d, l_s)
    bounce = (continue_ray | passthrough) & ~died
    new_origin = (position[0] + new_dir[0] * _F32(EPSILON),
                  position[1] + new_dir[1] * _F32(EPSILON),
                  position[2] + new_dir[2] * _F32(EPSILON))
    path_o = _vwhere(bounce, new_origin, path_o)
    path_d = _vwhere(bounce, new_dir, path_d)
    # _set_trav(bounce)
    trav_o = _vwhere(bounce, path_o, trav_o)
    trav_d = _vwhere(bounce, path_d, trav_d)
    ptr = jnp.where(bounce, 0, ptr)
    pend_m = jnp.where(bounce, FULL16, pend_m)
    sp = jnp.where(bounce, 0, sp)
    t_out = jnp.where(bounce, _F32(FAR_PLANE), t_out)
    u_out = jnp.where(bounce, 0.0, u_out)
    v_out = jnp.where(bounce, 0.0, v_out)
    tri_out = jnp.where(bounce, -1, tri_out)
    found_out = jnp.where(bounce, 0, found_out)
    new_mode = jnp.where(bounce, MODE_PRIMARY,
                         jnp.where(died, MODE_DEAD, new_mode))
    depth = jnp.where(continue_ray, depth + 1, depth)
    prev_pdf = jnp.where(to_bsdf, pdf_s, prev_pdf_ref[:])

    # Save primary-hit registers for lanes that just shaded.
    saved = shade | passthrough
    o_hit_t[:] = jnp.where(saved, t_in, hit_t_ref[:])
    hb0 = jnp.where(saved, u_in, hit_bary[0])
    hb1 = jnp.where(saved, v_in, hit_bary[1])

    def wplanes(ref, comps):
        """Write per-component planes: stacked on a leading axis in the
        3-D (R, k, 8, 128) layout, concatenated rows in the 2-D one."""
        if len(ref.shape) == 4:
            ref[:] = jnp.stack(comps, axis=0)
        else:
            ref[:] = jnp.concatenate(comps, axis=0)

    wplanes(o_hit_baryT, [hb0, hb1])
    o_hit_tri[:] = jnp.where(saved, tri_in, hit_tri_ref[:])

    # radiance reset for accepted/regenerated lanes happens in the XLA
    # epilogue (it depends on the film's rank gate and the work queue).

    o_mode[:] = new_mode
    o_ptr[:] = ptr
    o_pend[:] = pend_m
    o_sp[:] = sp
    o_t[:] = t_out
    o_u[:] = u_out
    o_v[:] = v_out
    o_tri[:] = tri_out
    o_found[:] = found_out

    def w3(ref, vec):
        wplanes(ref, [vec[0], vec[1], vec[2]])

    w3(o_trav_oT, trav_o)
    w3(o_trav_dT, trav_d)
    w3(o_path_oT, path_o)
    w3(o_path_dT, path_d)
    w3(o_pendingT, pending)
    w3(o_throughputT, throughput)
    w3(o_radianceT, radiance)
    w3(o_rad_outT, rad_out)

    o_rng[:] = rng
    o_depth[:] = depth
    o_max_rough[:] = max_rough
    o_prev_pdf[:] = prev_pdf
    o_cap[:] = jnp.where(processed, cap - 1, cap)
    o_died[:] = died.astype(jnp.int32)
    o_nray[:] = bounce.astype(jnp.int32) + to_env.astype(jnp.int32)


class TransitionOut(NamedTuple):
    mode: jnp.ndarray
    ptr: jnp.ndarray
    pend: jnp.ndarray
    sp: jnp.ndarray
    t: jnp.ndarray
    u: jnp.ndarray
    v: jnp.ndarray
    tri: jnp.ndarray
    found: jnp.ndarray        # bool
    trav_oT: jnp.ndarray      # (3, B)
    trav_dT: jnp.ndarray
    path_oT: jnp.ndarray
    path_dT: jnp.ndarray
    hit_t: jnp.ndarray
    hit_baryT: jnp.ndarray    # (2, B)
    hit_tri: jnp.ndarray
    pendingT: jnp.ndarray
    throughputT: jnp.ndarray
    radianceT: jnp.ndarray
    rad_outT: jnp.ndarray
    rng: jnp.ndarray
    depth: jnp.ndarray
    max_rough: jnp.ndarray
    prev_pdf: jnp.ndarray
    lane_cap: jnp.ndarray
    died: jnp.ndarray         # bool
    nray: jnp.ndarray         # int32 per-lane ray starts (bounce + shadow)


def transition_step16_pallas(
    *,
    mode, trav_done, ptr, pend, sp, t, u, v, tri, found,
    trav_oT, trav_dT, path_oT, path_dT,
    hit_t, hit_baryT, hit_tri,
    pendingT, throughputT, radianceT,
    rng, depth, max_rough, prev_pdf, lane_cap,
    mdataT,
    sky_colT, sky_pdf, env_dirT, env_liT, env_pdf,
    use_rr: bool, max_bounces: int,
    shade_rowT=None, pairT=None, parity=None,
    firefly: bool = False, firefly_max=None, nan_canary: bool = False,
    interpret: bool = False, tile3d: bool = False,
) -> TransitionOut:
    """One fused transition on pre-gathered inputs.  All (3, B)/(2, B)
    operands are transposed planes; cols are (B,).  See module docstring
    for what stays outside.

    Attr rows enter EITHER pre-decoded (``shade_rowT``, (15, B) f32 unit
    vertex normals + uv) OR raw (``pairT`` (16, B) int view of the
    gathered 64-byte pair rows + ``parity`` = tri & 1): the raw form
    skips XLA's halfword-split/bitcast/convert/transpose staging and
    decodes the f16 normals in-kernel (``_f16_decode``, bit-exact)."""
    b = mode.shape[0]
    blk = BLK
    while b % blk:
        blk //= 2
    assert blk >= MIN_BLK, f"pool {b} has no usable transition block"
    assert b % SUB == 0 and blk % SUB == 0
    if tile3d and (b % 1024 or blk % 1024):
        tile3d = False            # small-pool fallback to the 2-D layout
    c_all = b // SUB          # total 2-D columns
    cb = blk // SUB           # columns per block
    grid = b // blk

    if tile3d:
        # 3-D (n, 8, 128) operand layout (round-20): a (B,) array stored
        # T(1024) is physically a sequence of (8, 128) vregs, so this
        # reshape is a FREE bitcast (0 copies, round20_tile3d_probe.py)
        # while the 2-D (8, B/8) reshape below is a strided relayout
        # (~60-75 us/super of reshape.12xx in the round-20 trace).  Same
        # full-vreg Mosaic rate (9.21 vs 9.14 ns/lane-chain).  The lane ->
        # position map differs from the 2-D layout, but inputs and outputs
        # share it and the kernel is per-lane elementwise, so results are
        # bit-identical either way.
        n_t = b // 1024
        k_t = blk // 1024

        def r2(x):
            """(B,) column -> (n, 8, 128)."""
            return x.reshape(n_t, 8, 128)

        def rp(x):
            """(R, B) plane -> (R, n, 8, 128); component r = [r]."""
            return x.reshape(x.shape[0], n_t, 8, 128)

        def col():
            return pl.BlockSpec((k_t, 8, 128), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)

        def plane(rows):
            return pl.BlockSpec((rows, k_t, 8, 128), lambda i: (0, i, 0, 0),
                                memory_space=pltpu.VMEM)

        def cshape(dt):
            return jax.ShapeDtypeStruct((n_t, 8, 128), dt)

        def pshape(rows):
            return jax.ShapeDtypeStruct((rows, n_t, 8, 128), jnp.float32)
    else:
        def r2(x):
            """(B,) column -> (SUB, B/SUB)."""
            return x.reshape(SUB, c_all)

        def rp(x):
            """(R, B) plane -> (R*SUB, B/SUB); component r = rows
            [8r, 8r+8)."""
            return x.reshape(x.shape[0] * SUB, c_all)

        def col():
            return pl.BlockSpec((SUB, cb), lambda i: (0, i),
                                memory_space=pltpu.VMEM)

        def plane(rows):
            return pl.BlockSpec((rows * SUB, cb), lambda i: (0, i),
                                memory_space=pltpu.VMEM)

        def cshape(dt):
            return jax.ShapeDtypeStruct((SUB, c_all), dt)

        def pshape(rows):
            return jax.ShapeDtypeStruct((rows * SUB, c_all), jnp.float32)

    i32, f32, u32 = jnp.int32, jnp.float32, jnp.uint32
    ffly = jnp.reshape(jnp.asarray(
        firefly_max if firefly_max is not None else 0.0, f32), (1,))

    attr_raw = pairT is not None
    assert attr_raw != (shade_rowT is not None), \
        "pass exactly one of shade_rowT / (pairT, parity)"
    if attr_raw:
        attr_ins = [rp(jax.lax.bitcast_convert_type(pairT, i32)),
                    r2(parity.astype(i32))]
        attr_specs = [plane(16), col()]
    else:
        attr_ins = [rp(shade_rowT)]
        attr_specs = [plane(15)]

    ins = [r2(mode), r2(trav_done.astype(i32)), r2(ptr), r2(pend), r2(sp),
           r2(t), r2(u), r2(v), r2(tri),
           r2(found.astype(i32)),
           rp(trav_oT), rp(trav_dT), rp(path_oT), rp(path_dT),
           r2(hit_t), rp(hit_baryT), r2(hit_tri),
           rp(pendingT), rp(throughputT), rp(radianceT),
           r2(rng), r2(depth), r2(max_rough), r2(prev_pdf), r2(lane_cap),
           *attr_ins, rp(mdataT),
           rp(sky_colT), r2(sky_pdf), rp(env_dirT), rp(env_liT), r2(env_pdf),
           ffly]
    in_specs = ([col()] * 10 + [plane(3)] * 4
                + [col(), plane(2), col()]
                + [plane(3)] * 3
                + [col()] * 5
                + attr_specs + [plane(22)]
                + [plane(3), col(), plane(3), plane(3), col()]
                + [pl.BlockSpec((1,), lambda i: (0,),
                                memory_space=pltpu.SMEM)])
    out_shapes = [
        cshape(i32), cshape(i32), cshape(i32), cshape(i32),   # mode ptr pend sp
        cshape(f32), cshape(f32), cshape(f32),                # t u v
        cshape(i32), cshape(i32),                             # tri found
        pshape(3), pshape(3), pshape(3), pshape(3),           # trav_o/d path_o/d
        cshape(f32), pshape(2), cshape(i32),                  # hit_t bary tri
        pshape(3), pshape(3), pshape(3), pshape(3),           # pend thr rad rad_out
        cshape(u32), cshape(i32), cshape(f32), cshape(f32),   # rng depth mr ppdf
        cshape(i32), cshape(i32), cshape(i32),                # cap died nray
    ]
    out_specs = ([col()] * 9 + [plane(3)] * 4
                 + [col(), plane(2), col()] + [plane(3)] * 4
                 + [col()] * 7)
    outs = pl.pallas_call(
        functools.partial(_transition_kernel, use_rr, max_bounces,
                          firefly, nan_canary, attr_raw),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(*ins)
    (o_mode, o_ptr, o_pend, o_sp, o_t, o_u, o_v, o_tri, o_found,
     o_trav_oT, o_trav_dT, o_path_oT, o_path_dT,
     o_hit_t, o_hit_baryT, o_hit_tri,
     o_pendingT, o_throughputT, o_radianceT, o_rad_outT,
     o_rng, o_depth, o_max_rough, o_prev_pdf, o_cap,
     o_died, o_nray) = outs
    # Back to the caller's 1-D/(R, B) shapes.
    (o_mode, o_ptr, o_pend, o_sp, o_t, o_u, o_v, o_tri, o_found,
     o_hit_t, o_hit_tri, o_rng, o_depth, o_max_rough, o_prev_pdf, o_cap,
     o_died, o_nray) = (x.reshape(b) for x in (
        o_mode, o_ptr, o_pend, o_sp, o_t, o_u, o_v, o_tri, o_found,
        o_hit_t, o_hit_tri, o_rng, o_depth, o_max_rough, o_prev_pdf,
        o_cap, o_died, o_nray))
    (o_trav_oT, o_trav_dT, o_path_oT, o_path_dT, o_pendingT,
     o_throughputT, o_radianceT, o_rad_outT) = (x.reshape(3, b) for x in (
        o_trav_oT, o_trav_dT, o_path_oT, o_path_dT, o_pendingT,
        o_throughputT, o_radianceT, o_rad_outT))
    o_hit_baryT = o_hit_baryT.reshape(2, b)
    return TransitionOut(
        mode=o_mode, ptr=o_ptr, pend=o_pend, sp=o_sp,
        t=o_t, u=o_u, v=o_v, tri=o_tri, found=o_found != 0,
        trav_oT=o_trav_oT, trav_dT=o_trav_dT,
        path_oT=o_path_oT, path_dT=o_path_dT,
        hit_t=o_hit_t, hit_baryT=o_hit_baryT, hit_tri=o_hit_tri,
        pendingT=o_pendingT, throughputT=o_throughputT,
        radianceT=o_radianceT, rad_outT=o_rad_outT,
        rng=o_rng, depth=o_depth, max_rough=o_max_rough,
        prev_pdf=o_prev_pdf, lane_cap=o_cap,
        died=o_died != 0, nray=o_nray)
