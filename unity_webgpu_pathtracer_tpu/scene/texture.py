"""Software texture atlas: one flat uint32 buffer of descriptors + RGBA8 texels.

Replicates the reference's buffer contract exactly
(``CopyTextureData.compute:21-35`` writes it, ``util/texture.hlsl`` reads it):
4-word descriptors ``[width, height, offset, 0]`` for all textures first,
then each texture's texels RGBA8-packed little-endian (r in the low byte).
The reference samples with explicit UV wrap + optional 4-tap bilinear
(``texture.hlsl:25-76``); the same math runs here as batched gathers.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def build_atlas(textures: list[np.ndarray]) -> np.ndarray:
    """Pack (H, W, 3|4) uint8/float images into the flat uint32 atlas."""
    n = len(textures)
    if n == 0:
        return np.zeros((0,), np.uint32)
    descriptors = np.zeros((n, 4), np.uint32)
    blobs = []
    offset = n * 4  # texel data begins after the descriptor table
    for i, img in enumerate(textures):
        img = np.asarray(img)
        if img.dtype != np.uint8:
            img = (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
        if img.ndim == 2:
            img = img[..., None]
        h, w, c = img.shape
        rgba = np.zeros((h, w, 4), np.uint8)
        rgba[..., 3] = 255
        rgba[..., :c] = img[..., :4] if c <= 4 else img[..., :4]
        packed = (
            rgba[..., 0].astype(np.uint32)
            | (rgba[..., 1].astype(np.uint32) << 8)
            | (rgba[..., 2].astype(np.uint32) << 16)
            | (rgba[..., 3].astype(np.uint32) << 24)
        ).reshape(-1)
        descriptors[i] = (w, h, offset, 0)
        blobs.append(packed)
        offset += w * h
    return np.concatenate([descriptors.reshape(-1)] + blobs)


def _fetch_texel(data: jnp.ndarray, offset, width, height, x, y) -> jnp.ndarray:
    """``GetTexturePixel`` (texture.hlsl:6-23): clamp, gather, unpack RGBA8."""
    x = jnp.minimum(x, width - 1)
    y = jnp.minimum(y, height - 1)
    idx = jnp.clip(offset + y * width + x, 0, data.shape[0] - 1)
    px = data[idx]
    inv = jnp.float32(1.0 / 255.0)
    return jnp.stack(
        [
            (px & 0xFF).astype(jnp.float32) * inv,
            ((px >> 8) & 0xFF).astype(jnp.float32) * inv,
            ((px >> 16) & 0xFF).astype(jnp.float32) * inv,
            ((px >> 24) & 0xFF).astype(jnp.float32) * inv,
        ],
        axis=-1,
    )


def sample_texture(data: jnp.ndarray, texture_index: jnp.ndarray,
                   uv: jnp.ndarray, bilinear: bool = True) -> jnp.ndarray:
    """Batched ``SampleTexture`` (texture.hlsl:25-76).

    ``texture_index`` may be negative (unbound) — those lanes return 0 and
    the caller selects the fallback constant.  Uses the reference's
    vertex-style mapping ``t = frac(uv) * (size-1)``.
    """
    safe_idx = jnp.maximum(texture_index, 0)
    desc_base = safe_idx * 4
    n = data.shape[0]
    width = data[jnp.clip(desc_base, 0, n - 1)].astype(jnp.int32)
    height = data[jnp.clip(desc_base + 1, 0, n - 1)].astype(jnp.int32)
    offset = data[jnp.clip(desc_base + 2, 0, n - 1)].astype(jnp.int32)

    u = uv[..., 0] - jnp.floor(uv[..., 0])
    v = uv[..., 1] - jnp.floor(uv[..., 1])
    tu = u * (width.astype(jnp.float32) - 1.0)
    tv = v * (height.astype(jnp.float32) - 1.0)
    tx = tu.astype(jnp.int32)
    ty = tv.astype(jnp.int32)

    p1 = _fetch_texel(data, offset, width, height, tx, ty)
    if not bilinear:
        out = p1
    else:
        fu = (tu - tx.astype(jnp.float32))[..., None]
        fv = (tv - ty.astype(jnp.float32))[..., None]
        p2 = _fetch_texel(data, offset, width, height, tx + 1, ty)
        p3 = _fetch_texel(data, offset, width, height, tx, ty + 1)
        p4 = _fetch_texel(data, offset, width, height, tx + 1, ty + 1)
        out = (p1 * (1 - fu) + p2 * fu) * (1 - fv) + (p3 * (1 - fu) + p4 * fu) * fv
    return jnp.where((texture_index >= 0)[..., None], out, 0.0)
