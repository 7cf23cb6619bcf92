"""SBVH vs binned-SAH on the beams scene (long thin diagonal quads) —
the workload class where spatial splits actually pay (the sphere-grid
bench measured NULL; its arrivals gap is stalls, not tree overlap).

Host-read timing (block_until_ready does not block on axon), throwaway
warmup, seeds varied, configs alternated A/B/A/B.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/round9_sbvh_beams.py
Env: BEAM_TRIS (default 400k), SPP (default 8), TE, POOL.
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
from unity_webgpu_pathtracer_tpu.models.benchmark import beam_scene  # noqa: E402
from unity_webgpu_pathtracer_tpu.render.camera import make_camera_params  # noqa: E402
from unity_webgpu_pathtracer_tpu.render.fused import fused_pass_with_stats  # noqa: E402

TRIS = int(os.environ.get("BEAM_TRIS", 400_000))
SPP = int(os.environ.get("SPP", 8))
TE = int(os.environ.get("TE", 8))
POOL = int(os.environ.get("POOL", 262144))


def main():
    scene, cam = beam_scene(TRIS)
    data = {}
    for q in (0, 1):
        os.environ["UWPT_BVH_QUALITY"] = str(q)
        t0 = time.time()
        data[q] = scene.build("wide16")
        print(f"quality={q}: {data[q].wide16_nodes.shape[0]:,} rows, "
              f"build {time.time()-t0:.1f}s", flush=True)

    config = RenderConfig(
        width=1920, height=1080, samples_per_pass=SPP, max_bounces=5,
        traversal="wide16", sky_mode=SKY_MODE_ENVIRONMENT,
        has_environment_texture=True, use_russian_roulette=True,
        integrator="fused", pool_size=POOL, transition_every=TE,
        use_prestep=True, use_pallas_arrival=True,
    )
    params = make_camera_params(width=1920, height=1080, **cam)

    @jax.jit
    def one_pass(sd, params):
        film, occ, rays, arrivals = fused_pass_with_stats(
            sd, config, params, 0, pool_size=POOL)
        return film.sum(), occ, rays, arrivals

    def ws(i):
        return dataclasses.replace(params, seed_root=jnp.uint32(0xBEA7 + i))

    out = one_pass(data[0], ws(0))
    _ = [float(np.asarray(x)) for x in out]  # warmup, host read

    times = {0: [], 1: []}
    stats = {}
    for rep in range(3):
        for q in (0, 1):
            t0 = time.perf_counter()
            out = one_pass(data[q], ws(10 + rep * 2 + q))
            vals = [float(np.asarray(x)) for x in out]
            times[q].append(time.perf_counter() - t0)
            stats[q] = vals
    for q in (0, 1):
        fsum, occ, rays, arr = stats[q]
        dt = min(times[q])
        print(f"quality={q}: {dt:6.2f} s/pass  {rays/dt/1e6:5.2f} Mrays/s  "
              f"occ {occ:.3f}  arr/ray {arr/max(rays,1):5.2f}  film {fsum:.6g} "
              f"(times {[f'{t:.2f}' for t in times[q]]})", flush=True)


if __name__ == "__main__":
    main()
