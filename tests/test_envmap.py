"""Environment map: CDF + alias samplers agree with each other and with the
analytic distribution; eval/sample consistency for MIS."""

import jax.numpy as jnp
import numpy as np

from unity_webgpu_pathtracer_tpu.scene.envmap import (
    build_envmap,
    eval_env_map,
    sample_env_map,
    sample_env_map_alias,
)
from unity_webgpu_pathtracer_tpu.utils.math import luminance


def _test_image(h=16):
    r = np.random.default_rng(0)
    img = r.uniform(0.05, 1.0, (h, 2 * h, 3)).astype(np.float32)
    img[h // 2, h] = [50.0, 40.0, 30.0]  # one bright texel
    return img


def _texel_histogram(dirs, h, w, rotation=0.0):
    d = np.asarray(dirs)
    theta = np.arccos(np.clip(d[:, 1], -1, 1))
    phi = np.arctan2(d[:, 2], d[:, 0])
    u = ((np.pi + phi) / (2 * np.pi) + rotation) % 1.0
    v = 1.0 - theta / np.pi
    x = np.clip((u * w).astype(int), 0, w - 1)
    y = np.clip((v * h).astype(int), 0, h - 1)
    hist = np.zeros((h, w))
    np.add.at(hist, (y, x), 1)
    return hist


def test_samplers_match_luminance_distribution():
    img = _test_image()
    env = build_envmap(img)
    h, w = img.shape[:2]
    n = 200_000
    state = jnp.arange(n, dtype=jnp.uint32)

    lum = img[..., 0] * 0.299 + img[..., 1] * 0.587 + img[..., 2] * 0.114
    expect = lum / lum.sum()

    for sampler in (sample_env_map, sample_env_map_alias):
        dirs, color, pdf, _ = sampler(env, jnp.float32(0.0), state)
        hist = _texel_histogram(dirs, h, w) / n
        # Texel visit frequencies track luminance; the bright texel dominates.
        err = np.abs(hist - expect)
        assert err.max() < 0.01, sampler.__name__
        # The 50x-luminance texel receives its expected share of samples.
        bright = expect[h // 2, w // 2]
        assert abs(hist[h // 2, w // 2] - bright) < 0.05 * bright


def test_sample_eval_pdf_consistency():
    img = _test_image()
    env = build_envmap(img)
    n = 50_000
    state = jnp.arange(n, dtype=jnp.uint32) * jnp.uint32(77) + jnp.uint32(3)
    dirs, color, pdf_s, _ = sample_env_map_alias(env, jnp.float32(0.1), state)
    color_e, pdf_e = eval_env_map(env, dirs, jnp.float32(1.0), jnp.float32(0.1))
    # Eval at the sampled direction reproduces the sampler's color/pdf
    # (bilinear filtering makes this approximate near texel edges).
    ok = np.isfinite(np.asarray(pdf_e))
    rel = np.abs(np.asarray(pdf_e) - np.asarray(pdf_s)) / np.maximum(np.asarray(pdf_s), 1e-6)
    assert np.median(rel[ok]) < 0.1
    relc = np.abs(np.asarray(color_e) - np.asarray(color)).max(-1) / np.maximum(
        np.asarray(color).max(-1), 1e-6)
    assert np.median(relc) < 0.1


def test_pdf_integrates_to_one():
    img = _test_image()
    env = build_envmap(img)
    r = np.random.default_rng(5)
    n = 400_000
    z = 1 - 2 * r.uniform(size=n)
    phi = r.uniform(size=n) * 2 * np.pi
    rad = np.sqrt(np.maximum(0, 1 - z * z))
    dirs = jnp.asarray(np.stack([rad * np.cos(phi), z, rad * np.sin(phi)], -1)
                       .astype(np.float32))
    _, pdf = eval_env_map(env, dirs, jnp.float32(1.0), jnp.float32(0.0))
    integral = float(np.asarray(pdf).mean() * 4 * np.pi)
    assert abs(integral - 1.0) < 0.05, integral
