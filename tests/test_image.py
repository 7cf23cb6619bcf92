"""Image IO round-trip tests."""

import numpy as np

from unity_webgpu_pathtracer_tpu.utils import image as im


def test_png_roundtrip_rgb(tmp_path):
    r = np.random.default_rng(0)
    img = r.integers(0, 256, size=(33, 47, 3), dtype=np.uint8)
    p = str(tmp_path / "t.png")
    im.write_png(p, img)
    back = im.read_png(p)
    np.testing.assert_array_equal(back, img)


def test_png_roundtrip_float(tmp_path):
    img = np.linspace(0, 1, 16 * 16 * 3, dtype=np.float32).reshape(16, 16, 3)
    p = str(tmp_path / "t.png")
    im.write_png(p, img)
    back = im.read_png(p)
    np.testing.assert_allclose(back.astype(np.float32) / 255.0, img, atol=1 / 255.0 + 1e-6)


def test_hdr_roundtrip(tmp_path):
    r = np.random.default_rng(1)
    img = (r.uniform(size=(17, 23, 3)) * 100.0).astype(np.float32)
    img[0, 0] = 0.0
    p = str(tmp_path / "t.hdr")
    im.write_hdr(p, img)
    back = im.read_hdr(p)
    # RGBE quantizes each channel relative to the pixel's max channel:
    # absolute error is bounded by maxc / 256 per channel.
    tol = img.max(axis=-1, keepdims=True) / 256.0 + 1e-4
    assert (np.abs(back - img) <= tol).all()
