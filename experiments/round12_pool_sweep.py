"""te / pool re-sweep under the round-12 follow-up: pool moved DOWN (128k beat 256k).

The in-kernel transpose cut per-arrival cost ~30% (no more 0.35 ms
layout copy), which moves the stall-model cadence optimum: cheaper
arrivals make stall arrivals cheaper relative to transitions, so te may
move UP from 8.  Pool re-sweep for the same reason (the wall-device gap
theory died in round 10 — device is 100% busy — so pool pricing is pure
occupancy vs queue-tail now).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/round10_te_pool.py
Env: SPP (default 32).
"""

import dataclasses
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from unity_webgpu_pathtracer_tpu.config import SKY_MODE_ENVIRONMENT, RenderConfig  # noqa: E402
from unity_webgpu_pathtracer_tpu.models.benchmark import million_triangle_scene  # noqa: E402
from unity_webgpu_pathtracer_tpu.render.camera import make_camera_params  # noqa: E402
from unity_webgpu_pathtracer_tpu.render.fused import fused_pass_with_stats  # noqa: E402

SPP = int(os.environ.get("SPP", 32))


def main():
    scene, cam = million_triangle_scene(1_000_000)
    sd = scene.build("wide16")
    params = make_camera_params(width=1920, height=1080, **cam)

    def cfg(te, pool):
        return RenderConfig(
            width=1920, height=1080, samples_per_pass=SPP, max_bounces=5,
            traversal="wide16", sky_mode=SKY_MODE_ENVIRONMENT,
            has_environment_texture=True, use_russian_roulette=True,
            integrator="fused", pool_size=pool, transition_every=te,
            use_prestep=True, use_pallas_arrival=True,
        ), pool

    import json
    grid = os.environ.get("GRID")
    if grid:
        variants = []
        first = True
        for te, pool in json.loads(grid):
            name = f"te{te} p{pool//1024}k"
            if first:
                variants.append((f"warmup {name}", *cfg(te, pool)))
                first = False
            variants.append((name, *cfg(te, pool)))
    else:
        variants = [
            ("warmup te10 p128k", *cfg(10, 1 << 17)),
            ("te10 p128k", *cfg(10, 1 << 17)),
            ("te8  p128k", *cfg(8, 1 << 17)),
            ("te12 p128k", *cfg(12, 1 << 17)),
            ("te10 p64k ", *cfg(10, 1 << 16)),
            ("te12 p64k ", *cfg(12, 1 << 16)),
            ("te10 p192k", *cfg(10, 3 << 16)),
        ]
    for name, config, pool in variants:
        @jax.jit
        def one_pass(sd, params, cs, config=config, pool=pool):
            return fused_pass_with_stats(sd, config, params, cs,
                                         pool_size=pool)
        ts = []
        for i in range(3):
            p = dataclasses.replace(params, seed_root=jnp.uint32(99 + 13 * i))
            t0 = time.perf_counter()
            out = one_pass(sd, p, 0)
            _ = float(np.asarray(out[0]).sum())
            ts.append(time.perf_counter() - t0)
        dt = min(ts[1:])
        rays = int(np.asarray(out[2]))
        arr = int(np.asarray(out[3]))
        print(f"{name:16s} pass {dt:6.2f} s  occ {float(np.asarray(out[1])):.3f} "
              f"arr/ray {arr / max(rays, 1):.2f}  "
              f"({rays / dt / 1e6:.2f} Mrays/s)", flush=True)


if __name__ == "__main__":
    main()
