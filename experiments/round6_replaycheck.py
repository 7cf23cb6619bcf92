"""Diagnose the 0.00s lane=0 timing anomaly: repeated identical-shape
passes with varied seeds — which executions are real?

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/round6_replaycheck.py
"""

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

POOL = 262144


def main():
    scene, cam = million_triangle_scene(1_000_000)
    sd = scene.build("wide16")
    params = make_camera_params(width=1920, height=1080, **cam)
    for lane in (False, True):
        config = RenderConfig(
            width=1920, height=1080, samples_per_pass=16, max_bounces=5,
            traversal="wide16", sky_mode=SKY_MODE_ENVIRONMENT,
            has_environment_texture=True, use_russian_roulette=True,
            integrator="fused", pool_size=POOL, transition_every=10,
            use_prestep=True, use_pallas_arrival=True, use_lane_film=lane,
        )

        @jax.jit
        def one_pass(sd, params, cs):
            film, occ, rays, arrivals = fused_pass_with_stats(
                sd, config, params, cs, pool_size=POOL)
            return film.sum(), occ, rays, arrivals

        import dataclasses as _dc

        for i in range(5):
            p = _dc.replace(params, seed_root=jnp.uint32(1234 + 7 * i))
            t0 = time.perf_counter()
            out = one_pass(sd, p, i)
            fsum = float(np.asarray(out[0]))   # force a real host read
            dt = time.perf_counter() - t0
            print(f"lane={int(lane)} rep{i}: {dt:7.2f} s  film {fsum:.6g} "
                  f"rays {int(np.asarray(out[2]))}", flush=True)


if __name__ == "__main__":
    main()
