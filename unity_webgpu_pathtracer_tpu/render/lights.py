"""Next-event estimation: environment + analytic lights.

Port of ``util/light.hlsl``.  Differences from the reference, both
documented deviations (upstream quirks that break energy conservation):

* shadow rays here carry ``t_max = light distance`` — the reference's
  ``ShadowRayIntersect`` has no max distance (``bvh.hlsl:228-233``), so
  geometry *behind* an analytic light would occlude it;
* the uniform light pick is compensated by ``light_count`` for every light
  type — the reference multiplies only rect-light emission
  (``light.hlsl:19``), silently dimming point/spot lights when several
  lights exist.
"""

from __future__ import annotations

import jax.numpy as jnp

from unity_webgpu_pathtracer_tpu.config import (
    LIGHT_TYPE_POINT,
    LIGHT_TYPE_RECTANGLE,
    LIGHT_TYPE_SPOT,
    SKY_MODE_ENVIRONMENT,
    RenderConfig,
    RenderParams,
)
from unity_webgpu_pathtracer_tpu.render import bsdf as ubsdf
from unity_webgpu_pathtracer_tpu.render.sampling import (
    power_heuristic,
    uniform_sample_sphere,
)
from unity_webgpu_pathtracer_tpu.scene.envmap import sample_env_map
from unity_webgpu_pathtracer_tpu.utils import rng as urng
from unity_webgpu_pathtracer_tpu.utils.math import (
    EPSILON,
    FAR_PLANE,
    PI,
    cross,
    dot,
    length,
    normalize,
)


def _unity_falloff(dist, range_):
    """Unity-style distance attenuation (``light.hlsl:69-72``)."""
    r = dist / jnp.maximum(range_, 1e-6)
    atten = jnp.clip(
        1.0 / (1.0 + 25.0 * r * r) * jnp.clip((1.0 - r) * 5.0, 0.0, 1.0), 0.0, 1.0
    )
    return jnp.where(dist > range_, 0.0, atten)


def spot_cone_fade(cos_theta, cos_outer, cos_inner):
    """Spot cone edge fade (``light.hlsl:82-94``): linear in the cosine
    between the outer and inner cone angles, clamped to [0, 1].  Shared by
    the megakernel and fused integrators (and monkeypatched by the
    localized-bug golden meta-test)."""
    return jnp.clip(
        (cos_theta - cos_outer) / jnp.maximum(cos_inner - cos_outer, 1e-6),
        0.0, 1.0)


def direct_light(scene, config: RenderConfig, params: RenderParams, hit, mat,
                 ray_dir, state, occluded_fn):
    """One NEE bounce: env sample + one uniformly picked analytic light
    (``light.hlsl:117-173``).  Returns ``(Ld (B,3), new_state)``."""
    ld = jnp.zeros_like(mat.base_color)
    scatter_pos = hit.position + hit.normal * EPSILON
    v = -ray_dir

    if config.sky_mode == SKY_MODE_ENVIRONMENT:
        if config.has_environment_texture:
            light_dir, color, light_pdf, state = sample_env_map(
                scene.env, params.environment_rotation, state
            )
            shadowed = occluded_fn(scene, scatter_pos, light_dir,
                                   jnp.full(light_pdf.shape, FAR_PLANE))
            f, bsdf_pdf = ubsdf.eval_brdf(mat, v, hit.ffnormal, light_dir)
            mis = power_heuristic(light_pdf, bsdf_pdf)
            contrib = (
                mis[..., None] * color * f * params.environment_intensity
                / jnp.maximum(light_pdf, 1e-20)[..., None]
            )
            use = (~shadowed) & (bsdf_pdf > 0.0) & (light_pdf > 0.0) & (mis > 0.0)
            ld = ld + jnp.where(use[..., None], contrib, 0.0)
        else:
            # Deviation: the reference draws a cosine-hemisphere direction but
            # weights it with the uniform-sphere pdf (light.hlsl:144-145) — a
            # biased estimator.  We draw uniform-sphere so the 1/4π pdf is
            # consistent on both the NEE and the sky-MIS side.
            (r1, r2), state = urng.random_floats(state, 2)
            light_dir = uniform_sample_sphere(r1, r2)
            li = params.environment_color * params.environment_intensity
            light_pdf = 1.0 / (4.0 * PI)
            shadowed = occluded_fn(scene, scatter_pos, light_dir,
                                   jnp.full(r1.shape, FAR_PLANE))
            f, bsdf_pdf = ubsdf.eval_brdf(mat, v, hit.ffnormal, light_dir)
            mis = power_heuristic(light_pdf, bsdf_pdf)
            contrib = mis[..., None] * li * f / light_pdf
            use = (~shadowed) & (bsdf_pdf > 0.0) & (mis > 0.0)
            ld = ld + jnp.where(use[..., None], contrib, 0.0)

    if config.has_lights and scene.lights.shape[0] > 0:
        lcount = scene.lights.shape[0]
        u_pick, state = urng.random_float(state)
        idx = jnp.clip((u_pick * lcount).astype(jnp.int32), 0, lcount - 1)
        rec = scene.lights[idx]                       # (B,16)
        ltype = rec[:, 3].astype(jnp.int32)
        lpos, lu, lv = rec[:, 0:3], rec[:, 8:11], rec[:, 12:15]
        emission = rec[:, 4:7] * float(lcount)
        lrange, larea = rec[:, 7], rec[:, 11]

        (r1, r2), state = urng.random_floats(state, 2)

        # Rect: area sample with solid-angle pdf (light.hlsl:7-23).
        rect_surface = lpos + lu * r1[:, None] + lv * r2[:, None]
        to_rect = rect_surface - scatter_pos
        rect_dist = length(to_rect)
        rect_dir = to_rect / jnp.maximum(rect_dist, 1e-20)[:, None]
        rect_normal = normalize(cross(lu, lv))
        rect_pdf = rect_dist**2 / jnp.maximum(
            larea * jnp.abs(dot(rect_normal, rect_dir)), 1e-20
        )

        # Point/spot: delta direction (light.hlsl:25-45).
        to_light = lpos - scatter_pos
        delta_dist = length(to_light)
        delta_dir = to_light / jnp.maximum(delta_dist, 1e-20)[:, None]
        spot_normal = normalize(lu)

        is_rect = ltype == LIGHT_TYPE_RECTANGLE
        is_spot = ltype == LIGHT_TYPE_SPOT
        is_point = ltype == LIGHT_TYPE_POINT

        light_dir = jnp.where(is_rect[:, None], rect_dir, delta_dir)
        light_dist = jnp.where(is_rect, rect_dist, delta_dist)
        light_normal = jnp.where(
            is_rect[:, None], rect_normal,
            jnp.where(is_spot[:, None], spot_normal, -delta_dir),
        )
        light_pdf = jnp.where(is_rect, rect_pdf, 0.0)

        # EvalLight (light.hlsl:60-114)
        falloff = _unity_falloff(light_dist, lrange)
        cos_theta = dot(-light_dir, normalize(light_normal))
        falloff = jnp.where(is_rect & (cos_theta < 0.0), 0.0, falloff)
        # Spot cone: v.x=cos(outer), v.y=cos(inner) (light.hlsl:82-94).
        cos_outer, cos_inner = rec[:, 12], rec[:, 13]
        spot_fade = spot_cone_fade(cos_theta, cos_outer, cos_inner)
        falloff = jnp.where(is_spot, falloff * spot_fade, falloff)

        li = emission * falloff[:, None]
        shadowed = occluded_fn(scene, scatter_pos, light_dir, light_dist - EPSILON)
        # Reference evaluates analytic-light NEE about hit.normal (light.hlsl:105).
        f, _bsdf_pdf = ubsdf.eval_brdf(mat, v, hit.normal, light_dir)
        lpdf = jnp.where(light_pdf > 0.0, light_pdf, 1.0)
        contrib = li * f / lpdf[:, None]
        use = (~shadowed) & (is_rect | is_spot | is_point) & (falloff > 0.0)
        ld = ld + jnp.where(use[:, None], contrib, 0.0)

    return ld, state
