"""Persistent XLA compilation cache for the product entry points.

The fused wavefront pass is one large XLA module; a cold TPU compile runs
tens of seconds (the reference's analogue is shader-variant compilation,
which Unity caches on disk transparently — ``Library/ShaderCache``).  The
CLI, viewer, and (by default) :class:`~unity_webgpu_pathtracer_tpu.api.
Renderer` enable JAX's persistent compilation cache so every session after
the first starts in seconds.  Importing the package never mutates global
JAX config; constructing a ``Renderer`` DOES (documented on the class) —
it sets ``jax_compilation_cache_dir`` process-wide unless the embedding
application already configured one (an existing setting is never
overridden) or opts out with ``Renderer(..., compile_cache=False)``.

Env knobs: ``UWPT_CACHE=0`` disables, ``UWPT_CACHE_DIR`` overrides the
location (default ``~/.cache/unity_webgpu_pathtracer_tpu/xla``).
"""

from __future__ import annotations

import os


def enable_compile_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Returns the directory used, or None when disabled (``UWPT_CACHE=0``),
    unsupported by the installed jax, or already configured by the
    application (an existing ``jax_compilation_cache_dir`` is respected,
    never redirected — only pass ``cache_dir`` explicitly to override).
    Safe to call more than once.  NOTE: this mutates process-global JAX
    config; every jit compilation in the process, not just this
    package's, lands in the cache directory.
    """
    if os.environ.get("UWPT_CACHE", "1") == "0":
        return None
    if cache_dir is None:
        import jax

        try:
            existing = jax.config.jax_compilation_cache_dir
        except AttributeError:  # pragma: no cover - older jax
            existing = None
        if existing:
            return existing
    if cache_dir is None:
        cache_dir = os.environ.get("UWPT_CACHE_DIR") or os.path.join(
            os.path.expanduser("~"), ".cache", "unity_webgpu_pathtracer_tpu",
            "xla")
    try:
        os.makedirs(cache_dir, exist_ok=True)
    except OSError:
        return None
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - older jax without the knobs
        return None
    return cache_dir
