"""Pool re-sweep under the sorted-prefix film at te=8.

The sorted film changed per-transition cost (sort B rows + K-slot
scatter both scale with B), so the 262144 optimum from the legacy film
needs re-checking. Host-read timing, warmup discarded, seeds varied.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/round8_pool.py
"""

import dataclasses
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from unity_webgpu_pathtracer_tpu.config import SKY_MODE_ENVIRONMENT, RenderConfig  # noqa: E402
from unity_webgpu_pathtracer_tpu.models.benchmark import million_triangle_scene  # noqa: E402
from unity_webgpu_pathtracer_tpu.render.camera import make_camera_params  # noqa: E402
from unity_webgpu_pathtracer_tpu.render.fused import fused_pass_with_stats  # noqa: E402

SPP = int(os.environ.get("SPP", 32))
TE = int(os.environ.get("TE", 8))


def main():
    scene, cam = million_triangle_scene(1_000_000)
    sd = scene.build("wide16")
    params = make_camera_params(width=1920, height=1080, **cam)

    def cfg(pool):
        return RenderConfig(
            width=1920, height=1080, samples_per_pass=SPP, max_bounces=5,
            traversal="wide16", sky_mode=SKY_MODE_ENVIRONMENT,
            has_environment_texture=True, use_russian_roulette=True,
            integrator="fused", pool_size=pool, transition_every=TE,
            use_prestep=True, use_pallas_arrival=True,
        )

    pools = [262144, 262144, 131072, 196608, 393216]
    for j, pool in enumerate(pools):
        config = cfg(pool)

        @jax.jit
        def one_pass(sd, params, cs, config=config, pool=pool):
            return fused_pass_with_stats(sd, config, params, cs, pool_size=pool)
        ts = []
        for i in range(3):
            p = dataclasses.replace(params, seed_root=jnp.uint32(7 + 11 * i))
            t0 = time.perf_counter()
            out = one_pass(sd, p, 0)
            float(np.asarray(out[0]).sum())
            ts.append(time.perf_counter() - t0)
        dt = min(ts[1:])
        rays = int(np.asarray(out[2]))
        tag = "warmup " if j == 0 else ""
        print(f"{tag}pool {pool:7d}  pass {dt:6.2f} s  "
              f"occ {float(np.asarray(out[1])):.3f} "
              f"({rays / dt / 1e6:.2f} Mrays/s)", flush=True)


if __name__ == "__main__":
    main()
