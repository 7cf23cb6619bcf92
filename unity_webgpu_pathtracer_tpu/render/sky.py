"""Sky radiance models (``Assets/Resources/util/sky.hlsl``).

Three variants, selected statically by ``RenderConfig`` like the reference's
HAS_ENVIRONMENT_TEXTURE keyword + EnvironmentMode uniform:

* HDRI environment texture with CDF importance sampling,
* constant environment color (uniform sphere pdf),
* "basic" RTiOW gradient sky (``sky.hlsl:101-108``).
"""

from __future__ import annotations

import jax.numpy as jnp

from unity_webgpu_pathtracer_tpu.config import (
    SKY_MODE_BASIC,
    SKY_MODE_ENVIRONMENT,
    RenderConfig,
    RenderParams,
)
from unity_webgpu_pathtracer_tpu.scene.envmap import EnvMap, eval_env_map
from unity_webgpu_pathtracer_tpu.utils.math import PI


def basic_sky(directions: jnp.ndarray, intensity):
    """RTiOW gradient (``sky.hlsl:101-108``): returns (color, pdf)."""
    a = jnp.clip(0.5 * (directions[..., 1] + 1.0), 0.0, 1.0)[..., None]
    horizon = jnp.asarray([1.0, 1.0, 1.0], directions.dtype)
    zenith = jnp.asarray([0.5, 0.7, 1.0], directions.dtype) ** 2.2
    color = (1.0 - a) * horizon + a * zenith
    pdf = jnp.full(directions.shape[:-1], 1.0 / (4.0 * PI), directions.dtype)
    return color * jnp.asarray(intensity)[..., None], pdf


def sample_sky_radiance(
    config: RenderConfig,
    params: RenderParams,
    env: EnvMap,
    directions: jnp.ndarray,
    ray_depth: jnp.ndarray,
):
    """Sky radiance for escaped rays (``sky.hlsl:110-129``).

    Primary rays (depth 0) see the sky at intensity 1, secondary rays are
    scaled by EnvironmentIntensity.  Returns ``(color, pdf)``.
    """
    intensity = jnp.where(ray_depth > 0, params.environment_intensity, 1.0)
    if config.sky_mode == SKY_MODE_ENVIRONMENT:
        if config.has_environment_texture:
            return eval_env_map(env, directions, intensity, params.environment_rotation)
        color = params.environment_color * intensity[..., None]
        pdf = jnp.full(directions.shape[:-1], 1.0 / (4.0 * PI), directions.dtype)
        return jnp.broadcast_to(color, directions.shape), pdf
    if config.sky_mode == SKY_MODE_BASIC:
        return basic_sky(directions, intensity)
    # No sky contribution.
    zeros = jnp.zeros(directions.shape[:-1], directions.dtype)
    return jnp.zeros_like(directions), zeros
