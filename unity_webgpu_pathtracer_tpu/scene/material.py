"""Material descriptions, 32-float packing, and runtime derivation.

Packing layout is byte-compatible with the reference's ``MaterialData``
record (``BVHScene.cs:241-282``, consumed by ``util/material.hlsl:84-137``
and ``util/common.hlsl:72-83``):

====== ======================= =================================
floats  struct field            contents
====== ======================= =================================
0-3     data1                   baseColor.rgb (linear), opacity
4-7     data2                   emission.rgb, alphaCutoff
8-11    data3                   metallic, roughness, normalScale, ior
12-15   data4                   alphaMode, anisotropic, specular, specularTint
16-19   data5                   sheen, sheenTint, subsurface, clearcoat
20-21   data6                   clearcoatGloss, specTrans(=1-opacity)
22-23   textures1               baseColor tex idx, metallicRoughness tex idx
24-27   textures2               normal, emission, occlusion tex idx, pad
28-31   texture1Transform       uvScale.xy, uvOffset.xy
====== ======================= =================================
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from unity_webgpu_pathtracer_tpu.render.bsdf import Material
from unity_webgpu_pathtracer_tpu.scene import texture as tex

MATERIAL_SIZE = 32
TEXTURE_OFFSET = 22


@dataclasses.dataclass
class MaterialDesc:
    """Host-side material description (glTF metallic-roughness style)."""

    base_color: tuple = (0.8, 0.8, 0.8, 1.0)   # linear RGBA
    emission: tuple = (0.0, 0.0, 0.0)
    metallic: float = 0.0
    roughness: float = 0.5
    ior: float = 1.1
    transmission: float = 0.0
    normal_scale: float = 1.0
    alpha_mode: int = 0
    alpha_cutoff: float = 0.5
    anisotropic: float = 0.0
    specular: float = 0.0
    specular_tint: float = 0.0
    sheen: float = 0.0
    sheen_tint: float = 0.0
    subsurface: float = 0.0
    clearcoat: float = 0.0
    clearcoat_gloss: float = 0.0
    # Texture indices into the scene's atlas (-1 = unbound).
    base_color_texture: int = -1
    metallic_roughness_texture: int = -1
    normal_texture: int = -1
    emission_texture: int = -1
    occlusion_texture: int = -1
    uv_scale: tuple = (1.0, 1.0)
    uv_offset: tuple = (0.0, 0.0)


def pack_materials(materials: list[MaterialDesc]) -> np.ndarray:
    """Pack to the (N, 32) float32 record table."""
    out = np.zeros((max(len(materials), 1), MATERIAL_SIZE), np.float32)
    for i, m in enumerate(materials):
        bc = np.asarray(m.base_color, np.float32)
        opacity = float(bc[3]) * (1.0 - m.transmission) if bc.shape[0] > 3 else 1.0 - m.transmission
        out[i, 0:3] = bc[:3]
        out[i, 3] = opacity
        out[i, 4:7] = np.asarray(m.emission, np.float32)
        out[i, 7] = m.alpha_cutoff
        out[i, 8] = m.metallic
        out[i, 9] = m.roughness
        out[i, 10] = m.normal_scale
        out[i, 11] = m.ior
        out[i, 12] = float(m.alpha_mode)
        out[i, 13] = m.anisotropic
        out[i, 14] = m.specular
        out[i, 15] = m.specular_tint
        out[i, 16] = m.sheen
        out[i, 17] = m.sheen_tint
        out[i, 18] = m.subsurface
        out[i, 19] = m.clearcoat
        out[i, 20] = m.clearcoat_gloss
        out[i, 21] = 1.0 - opacity
        out[i, 22] = m.base_color_texture
        out[i, 23] = m.metallic_roughness_texture
        out[i, 24] = m.normal_texture
        out[i, 25] = m.emission_texture
        out[i, 26] = m.occlusion_texture
        out[i, 27] = -1.0
        out[i, 28:30] = np.asarray(m.uv_scale, np.float32)
        out[i, 30:32] = np.asarray(m.uv_offset, np.float32)
    return out


def derive_material(
    mdata: jnp.ndarray,       # (B, 32) gathered records
    uv: jnp.ndarray,          # (B, 2)
    ray_dir: jnp.ndarray,     # (B, 3)
    normal: jnp.ndarray,      # (B, 3)
    texture_data: jnp.ndarray | None = None,
    has_textures: bool = False,
) -> Material:
    """MaterialData -> runtime Material (``material.hlsl:84-137``), batched.

    Texture fetches follow the reference selection rules: a negative texture
    index falls back to the packed constants; metallicRoughness reads
    ``(b, g^2)``; occlusion reads ``r`` (material.hlsl:38-51, 69-82).
    """
    base = mdata[:, 0:4]
    if has_textures and texture_data is not None:
        t_base = mdata[:, 22].astype(jnp.int32)
        uv_t = uv * mdata[:, 28:30] + mdata[:, 30:32]
        px = tex.sample_texture(texture_data, t_base, uv_t, bilinear=True)
        base = jnp.where((t_base >= 0)[:, None], px * base, base)

        t_mr = mdata[:, 23].astype(jnp.int32)
        mr_px = tex.sample_texture(texture_data, t_mr, uv, bilinear=True)
        metallic = jnp.where(t_mr >= 0, mr_px[:, 2], mdata[:, 8])
        roughness = jnp.where(t_mr >= 0, mr_px[:, 1] * mr_px[:, 1], mdata[:, 9])

        t_em = mdata[:, 25].astype(jnp.int32)
        em_px = tex.sample_texture(texture_data, t_em, uv, bilinear=True)
        emission = jnp.where((t_em >= 0)[:, None], em_px[:, :3], mdata[:, 4:7])

        t_oc = mdata[:, 26].astype(jnp.int32)
        oc_px = tex.sample_texture(texture_data, t_oc, uv, bilinear=True)
        occlusion = jnp.where(t_oc >= 0, oc_px[:, 0], 1.0)
    else:
        metallic = mdata[:, 8]
        roughness = mdata[:, 9]
        emission = mdata[:, 4:7]
        occlusion = jnp.ones_like(metallic)

    opacity = base[:, 3]
    roughness = jnp.maximum(roughness, 0.001)
    ior = jnp.clip(mdata[:, 11], 1.001, 2.0)
    anisotropic = jnp.clip(mdata[:, 13], -0.9, 0.9)
    aspect = jnp.sqrt(1.0 - anisotropic * 0.9)
    entering = (ray_dir[..., 0] * normal[..., 0]
                + ray_dir[..., 1] * normal[..., 1]
                + ray_dir[..., 2] * normal[..., 2]) < 0.0

    return Material(
        base_color=base[:, 0:3],
        opacity=opacity,
        emission=emission,
        alpha_mode=mdata[:, 12].astype(jnp.int32),
        alpha_cutoff=mdata[:, 7],
        anisotropic=anisotropic,
        metallic=metallic,
        roughness=roughness,
        subsurface=mdata[:, 18],
        specular_tint=mdata[:, 15],
        sheen=mdata[:, 16],
        sheen_tint=mdata[:, 17],
        clearcoat=mdata[:, 19],
        clearcoat_roughness=0.1 + (0.001 - 0.1) * mdata[:, 20],
        spec_trans=1.0 - jnp.clip(opacity, 0.0, 1.0),
        ior=ior,
        ax=jnp.maximum(0.001, roughness / aspect),
        ay=jnp.maximum(0.001, roughness * aspect),
        eta=jnp.where(entering, 1.0 / ior, ior),
        occlusion=occlusion,
    )


def apply_normal_map(mdata, uv, normal, tangent, texture_data,
                     has_textures: bool):
    """Perturb the shading normal by the material's normal map.

    The reference ships this path disabled (``util/material.hlsl:114-133``);
    here it is live behind the static ``has_normal_maps`` config flag.
    Semantics match the disabled reference code: tangent-space sample
    ``2*px - 1``, xy scaled by ``normalScale`` (mdata[10]), frame
    ``T' = normalize(T - N (T.N))``, ``B = cross(N, T')`` (no tangent w —
    the reference's attribute is a float3 too), unbound texture or a
    degenerate tangent falls back to the interpolated normal.
    """
    if not has_textures or texture_data is None:
        return normal
    t_nm = mdata[:, 24].astype(jnp.int32)
    uv_t = uv * mdata[:, 28:30] + mdata[:, 30:32]
    px = tex.sample_texture(texture_data, t_nm, uv_t, bilinear=True)
    ts = px[:, :3] * 2.0 - 1.0
    scale = mdata[:, 10]
    tsx = ts[:, 0] * scale
    tsy = ts[:, 1] * scale
    tsz = ts[:, 2]
    # Gram-Schmidt the interpolated tangent against the normal.
    t_dot_n = jnp.sum(tangent * normal, axis=-1, keepdims=True)
    t_orth = tangent - normal * t_dot_n
    t_len = jnp.sqrt(jnp.maximum(jnp.sum(t_orth * t_orth, axis=-1), 1e-20))
    t_hat = t_orth / t_len[:, None]
    b_hat = jnp.cross(normal, t_hat)
    n_new = (t_hat * tsx[:, None] + b_hat * tsy[:, None]
             + normal * tsz[:, None])
    n_len = jnp.sqrt(jnp.maximum(jnp.sum(n_new * n_new, axis=-1), 1e-20))
    n_new = n_new / n_len[:, None]
    ok = (t_nm >= 0) & (t_len > 1e-6)
    return jnp.where(ok[:, None], n_new, normal)
