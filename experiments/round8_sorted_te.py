"""te re-sweep under the sorted-prefix film (cheap transition moves the
te optimum down: stall arrivals drop, docs/PERFORMANCE.md te sweep).

Host-read timing, warmup discarded, seeds varied per rep.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/round8_sorted_te.py
Env: SPP (default 32), POOL.
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

POOL = int(os.environ.get("POOL", 262144))
SPP = int(os.environ.get("SPP", 32))


def main():
    scene, cam = million_triangle_scene(1_000_000)
    sd = scene.build("wide16")
    params = make_camera_params(width=1920, height=1080, **cam)

    def cfg(te, sorted_film=True):
        return RenderConfig(
            width=1920, height=1080, samples_per_pass=SPP, max_bounces=5,
            traversal="wide16", sky_mode=SKY_MODE_ENVIRONMENT,
            has_environment_texture=True, use_russian_roulette=True,
            integrator="fused", pool_size=POOL, transition_every=te,
            use_prestep=True, use_pallas_arrival=True,
            use_sorted_film=sorted_film, film_k_shift=1,
        )

    variants = [("warmup s-te10", cfg(10))] + [
        (f"sorted te{te}", cfg(te)) for te in (10, 8, 6, 5)
    ] + [("legacy te10", cfg(10, sorted_film=False))]
    for name, config in variants:
        @jax.jit
        def one_pass(sd, params, cs, config=config):
            return fused_pass_with_stats(sd, config, params, cs, pool_size=POOL)
        ts = []
        for i in range(3):
            p = dataclasses.replace(params, seed_root=jnp.uint32(99 + 13 * i))
            t0 = time.perf_counter()
            out = one_pass(sd, p, 0)
            float(np.asarray(out[0]).sum())
            ts.append(time.perf_counter() - t0)
        dt = min(ts[1:])
        rays = int(np.asarray(out[2]))
        arr = int(np.asarray(out[3]))
        print(f"{name:16s} pass {dt:6.2f} s  occ {float(np.asarray(out[1])):.3f} "
              f"arr/ray {arr / max(rays, 1):.2f}  ({rays / dt / 1e6:.2f} Mrays/s)",
              flush=True)


if __name__ == "__main__":
    main()
