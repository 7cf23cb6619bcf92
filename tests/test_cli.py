"""CLI smoke tests: render and animate commands end-to-end on CPU.

Covers the reference's scripted interaction loops headlessly:
``FreeViewCamera.cs`` (orbit camera -> accumulation reset) and
``Bounce.cs`` (per-frame instance transforms -> TLAS-only refresh).
"""

import os

import numpy as np

from unity_webgpu_pathtracer_tpu.cli import main


def test_cli_render_quad(tmp_path):
    out = str(tmp_path / "quad.png")
    main(["render", "builtin:quad", "--out", out, "--size", "32",
          "--spp", "2", "--spp-per-pass", "2", "--bounces", "2"])
    assert os.path.exists(out)
    from unity_webgpu_pathtracer_tpu.utils.image import read_png

    img = read_png(out)
    assert img.shape == (32, 32, 3)
    assert img.max() > 0


def test_cli_animate_orbit_bounce(tmp_path):
    out = str(tmp_path / "frame.png")
    main(["animate", "builtin:tlas", "--out", out, "--frames", "2",
          "--size", "32", "--spp", "1", "--bounces", "2",
          "--orbit", "--bounce"])
    frames = [str(tmp_path / f"frame-{i:04d}.png") for i in range(2)]
    for f in frames:
        assert os.path.exists(f)
    from unity_webgpu_pathtracer_tpu.utils.image import read_png

    a, b = (read_png(f).astype(np.float32) for f in frames)
    # Camera orbited half a turn and instances moved: frames must differ.
    assert np.abs(a - b).max() > 0


def test_enable_compile_cache(tmp_path, monkeypatch):
    from unity_webgpu_pathtracer_tpu.compile_cache import enable_compile_cache

    import jax

    prev = jax.config.jax_compilation_cache_dir
    try:
        d = str(tmp_path / "xla_cache")
        assert enable_compile_cache(d) == d
        assert os.path.isdir(d)
        assert jax.config.jax_compilation_cache_dir == d
        monkeypatch.setenv("UWPT_CACHE", "0")
        assert enable_compile_cache(str(tmp_path / "other")) is None
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
