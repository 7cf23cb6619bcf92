"""Definitive config A/B: host-read timing (block_until_ready does NOT
block on axon for some programs — round6_replaycheck), alternating reps.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/round6_ab.py
Env: MATRIX="lane:te:plevels ..." (e.g. "0:10:2 1:10:2 1:6:3"),
     SWEEP_SPP (default 16), POOL, REPS (default 3).
"""

import dataclasses
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

SPP = int(os.environ.get("SWEEP_SPP", 16))
POOL = int(os.environ.get("POOL", 262144))
REPS = int(os.environ.get("REPS", 3))

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from unity_webgpu_pathtracer_tpu.config import SKY_MODE_ENVIRONMENT, RenderConfig  # noqa: E402
from unity_webgpu_pathtracer_tpu.models.benchmark import million_triangle_scene  # noqa: E402
from unity_webgpu_pathtracer_tpu.render.camera import make_camera_params  # noqa: E402
from unity_webgpu_pathtracer_tpu.render.fused import fused_pass_with_stats  # noqa: E402


def main():
    scene, cam = million_triangle_scene(1_000_000)
    sd = scene.build("wide16")
    params = make_camera_params(width=1920, height=1080, **cam)
    matrix = os.environ.get("MATRIX", "0:10:2 1:10:2 1:8:2 1:6:2 1:6:3").split()

    fns = {}
    for spec in matrix:
        lane, te, pl = (int(x) for x in spec.split(":"))
        config = RenderConfig(
            width=1920, height=1080, samples_per_pass=SPP, max_bounces=5,
            traversal="wide16", sky_mode=SKY_MODE_ENVIRONMENT,
            has_environment_texture=True, use_russian_roulette=True,
            integrator="fused", pool_size=POOL, transition_every=te,
            use_prestep=True, use_pallas_arrival=True,
            use_lane_film=bool(lane), prestep_levels=pl,
        )

        @jax.jit
        def one_pass(sd, params, cs, _config=config):
            film, occ, rays, arrivals = fused_pass_with_stats(
                sd, _config, params, cs, pool_size=POOL)
            return film.sum(), occ, rays, arrivals

        fns[spec] = one_pass

    # Warm/compile every config once (first config in a process is garbage
    # anyway), then alternate timed reps.
    for spec, fn in fns.items():
        t0 = time.perf_counter()
        out = fn(sd, params, 0)
        float(np.asarray(out[0]))
        print(f"{spec}: compile+warm {time.perf_counter()-t0:.0f}s", flush=True)

    times = {spec: [] for spec in fns}
    stats = {}
    for rep in range(REPS):
        for j, (spec, fn) in enumerate(fns.items()):
            p = dataclasses.replace(
                params, seed_root=jnp.uint32(1000 + 17 * rep + j))
            t0 = time.perf_counter()
            out = fn(sd, p, rep + 1)
            float(np.asarray(out[0]))          # host read INSIDE the clock
            times[spec].append(time.perf_counter() - t0)
            stats[spec] = out

    for spec in fns:
        fsum, occ, rays, arrivals = (np.asarray(x) for x in stats[spec])
        dt = min(times[spec])
        print(f"{spec:10s}: {dt:6.2f} s/pass  {float(rays)/dt/1e6:5.2f} Mrays/s  "
              f"occ {float(occ):.3f}  arr/ray {float(arrivals)/max(float(rays),1):5.2f}  "
              f"times {[f'{t:.2f}' for t in times[spec]]}", flush=True)


if __name__ == "__main__":
    main()
