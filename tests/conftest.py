"""Test configuration: force an 8-device virtual CPU mesh.

All tests run on CPU (JAX executes the identical XLA program), with 8 virtual
host devices so multi-chip sharding tests exercise real collectives without
TPU hardware.  Must run before the first ``import jax``.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var on this image;
# the config update is authoritative.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: repeated suite runs skip recompiles.
import os as _os

_cache = _os.path.join(_os.path.dirname(__file__), "..", ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _os.path.abspath(_cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # older jax without the knobs
    pass
