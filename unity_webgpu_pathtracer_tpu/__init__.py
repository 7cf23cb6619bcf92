"""TPU-native progressive Monte-Carlo path-tracing framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``brendan-duncan/unity_webgpu_pathtracer`` (a Unity 6 + WebGPU HLSL megakernel
path tracer, see ``SURVEY.md``), re-architected TPU-first:

* **wavefront integration** — per-bounce jitted stages over a flat ray pool
  with path regeneration into dead lanes (replaces the reference's divergent
  per-pixel megakernel, ``Assets/Resources/util/pathtrace.hlsl:25-128``),
* **8-wide SoA BVH traversal** — batched ``lax.while_loop`` + Pallas kernels
  over flat HBM-resident node arrays (replaces the HLSL CWBVH stack traversal,
  ``Assets/Resources/util/bvh.hlsl:141-197``),
* **host-side C++/numpy BVH builders** (replaces the tinybvh C plugin,
  ``Assets/Plugins/Web/plugin.cpp``),
* **multi-chip film tiling / sample sharding** over a ``jax.sharding.Mesh``
  with ICI collectives (no analogue in the single-GPU reference).

Public entry points:

* :class:`unity_webgpu_pathtracer_tpu.api.Renderer` — progressive renderer.
* :mod:`unity_webgpu_pathtracer_tpu.models` — example scenes mirroring the
  reference's ``Assets/Examples/Scenes``.
* ``python -m unity_webgpu_pathtracer_tpu.cli`` — command-line renderer.
"""

__version__ = "0.1.0"

from unity_webgpu_pathtracer_tpu.config import RenderConfig, RenderParams  # noqa: F401

__all__ = ["RenderConfig", "RenderParams", "__version__"]
