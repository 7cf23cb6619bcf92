"""Profiling & observability.

The reference instruments with CommandBuffer profiler samples, wall-clock
Debug.Log timings, per-ray traversal step counters, and the Graphy overlay
(SURVEY.md §5).  Equivalents here:

* :class:`Timer` — wall-clock scopes with ``block_until_ready`` semantics;
* :class:`RenderStats` — per-pass rays/arrivals/occupancy aggregation fed by
  the fused integrator's on-device counters (the ``hit.steps`` analogue);
* :func:`trace` — a ``jax.profiler`` trace context for deep dives;
* :func:`scene_summary` — the structured scene-stat logging that
  ``BVHScene`` emits via Debug.Log (tri/material/texture/instance counts).
"""

from __future__ import annotations

import contextlib
import dataclasses
import time

import jax
import numpy as np


class Timer:
    """Wall-clock scope that synchronizes device work on exit."""

    def __init__(self, name: str, sync_on=None, log=print):
        self.name = name
        self.sync_on = sync_on
        self.log = log
        self.elapsed = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.sync_on is not None:
            jax.block_until_ready(self.sync_on)
        self.elapsed = time.perf_counter() - self._t0
        if self.log:
            self.log(f"[timer] {self.name}: {self.elapsed * 1e3:.1f} ms")
        return False


@dataclasses.dataclass
class RenderStats:
    """Accumulated render telemetry across passes."""

    rays: int = 0
    arrivals: int = 0
    seconds: float = 0.0
    occupancy_sum: float = 0.0
    passes: int = 0

    def update(self, rays, arrivals, occupancy, seconds) -> None:
        self.rays += int(rays)
        self.arrivals += int(arrivals)
        self.occupancy_sum += float(occupancy)
        self.seconds += seconds
        self.passes += 1

    @property
    def mrays_per_sec(self) -> float:
        return self.rays / max(self.seconds, 1e-9) / 1e6

    @property
    def occupancy(self) -> float:
        return self.occupancy_sum / max(self.passes, 1)

    def summary(self) -> str:
        return (f"{self.rays:,} rays in {self.seconds:.2f}s "
                f"({self.mrays_per_sec:.2f} Mrays/s), "
                f"{self.arrivals:,} BVH arrivals, "
                f"occupancy {self.occupancy:.2f}")


@contextlib.contextmanager
def trace(log_dir: str):
    """``jax.profiler`` trace scope (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def scene_summary(scene_data) -> dict:
    """Structured scene statistics (the BVHScene Debug.Log block)."""
    return {
        "triangles": int(scene_data.tris.shape[0]),
        "materials": int(scene_data.materials.shape[0]),
        "texture_words": int(scene_data.texture_data.shape[0]),
        "lights": int(scene_data.lights.shape[0]),
        "instances": int(scene_data.inst_l2w.shape[0]),
        "wide_rows": int(scene_data.wide_nodes.shape[1])
        if scene_data.wide_nodes.size > 48 else 0,
        "env_resolution": tuple(int(x) for x in scene_data.env.image.shape[:2]),
        "hbm_bytes": int(sum(np.prod(x.shape) * x.dtype.itemsize
                             for x in jax.tree.leaves(scene_data))),
    }
