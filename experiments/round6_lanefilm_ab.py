"""Lane-owned film vs legacy scatter film A/B + te re-sweep (round 3).

The lane film removes the per-transition film scatter (10.35 ms at
B=262k); cheaper transitions should move the te optimum down, which cuts
stall arrivals (arr/ray 10.8 issued vs ~6 useful at te=10).

One process, full-1080p passes, throwaway first, seeds varied, min of 2.
Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/round6_lanefilm_ab.py
"""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

TRIS = int(os.environ.get("PROBE_TRIS", 1_000_000))
SPP = int(os.environ.get("SWEEP_SPP", 16))
POOL = int(os.environ.get("POOL", 262144))

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from unity_webgpu_pathtracer_tpu.config import SKY_MODE_ENVIRONMENT, RenderConfig  # noqa: E402
from unity_webgpu_pathtracer_tpu.models.benchmark import million_triangle_scene  # noqa: E402
from unity_webgpu_pathtracer_tpu.render.camera import make_camera_params  # noqa: E402
from unity_webgpu_pathtracer_tpu.render.fused import fused_pass_with_stats  # noqa: E402


def main():
    scene, cam = million_triangle_scene(TRIS)
    sd = scene.build("wide16")
    params = make_camera_params(width=1920, height=1080, **cam)
    matrix = os.environ.get(
        "MATRIX", "0:10 1:10 1:8 1:6 1:5 1:4").split()

    import dataclasses as _dc

    def run(lane, te, warm=False):
        config = RenderConfig(
            width=1920, height=1080, samples_per_pass=SPP, max_bounces=5,
            traversal="wide16", sky_mode=SKY_MODE_ENVIRONMENT,
            has_environment_texture=True, use_russian_roulette=True,
            integrator="fused", pool_size=POOL, transition_every=te,
            use_prestep=True, use_pallas_arrival=True, use_lane_film=lane,
        )

        @jax.jit
        def one_pass(sd, params):
            film, occ, rays, arrivals = fused_pass_with_stats(
                sd, config, params, 0, pool_size=POOL)
            return film.sum(), occ, rays, arrivals

        def with_seed(i):
            return _dc.replace(params, seed_root=jnp.uint32(0x9E3779B9 + i))

        t0 = time.perf_counter()
        out = one_pass(sd, with_seed(0))
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        if warm:
            return None
        times = []
        for i in range(1, 3):
            t0 = time.perf_counter()
            out = one_pass(sd, with_seed(i))
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        dt = min(times)
        fsum, occ, rays, arrivals = (np.asarray(x) for x in out)
        mrays = float(rays) / dt / 1e6
        print(f"lane={int(lane)} te={te:2d}: {dt:6.2f} s/pass, "
              f"{mrays:5.2f} Mrays/s, occ {float(occ):.3f}, "
              f"arr/ray {float(arrivals)/max(float(rays),1):5.2f}, "
              f"film {float(fsum):.6g} (compile {compile_s:.0f}s, "
              f"times {[f'{t:.2f}' for t in times]})", flush=True)
        return mrays

    # Throwaway (first measured config in a process is garbage).
    run(False, 10, warm=True)
    results = {}
    for spec in matrix:
        lane, te = spec.split(":")
        results[spec] = run(lane == "1", int(te))
    best = max(results, key=lambda k: results[k] or 0)
    print(f"\nbest: {best} ({results[best]:.2f} Mrays/s)")


if __name__ == "__main__":
    main()
