"""Persistent XLA compilation cache for the product entry points.

The fused wavefront pass is one large XLA module; a cold TPU compile runs
tens of seconds (the reference's analogue is shader-variant compilation,
which Unity caches on disk transparently — ``Library/ShaderCache``).  The
CLI and viewer enable JAX's persistent compilation cache so every session
after the first starts in seconds.  Library users opt in by calling
:func:`enable_compile_cache` themselves — importing the package never
mutates global JAX config.

Env knobs: ``UWPT_CACHE=0`` disables, ``UWPT_CACHE_DIR`` overrides the
location (default ``~/.cache/unity_webgpu_pathtracer_tpu/xla``).
"""

from __future__ import annotations

import os


def enable_compile_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Returns the directory used, or None when disabled (``UWPT_CACHE=0``)
    or unsupported by the installed jax.  Safe to call more than once.
    """
    if os.environ.get("UWPT_CACHE", "1") == "0":
        return None
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
