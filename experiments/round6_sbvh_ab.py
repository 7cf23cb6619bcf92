"""SBVH vs binned-SAH A/B on the bench workload (round 3 lever #1).

One process, full-1080p passes via the production fused integrator,
throwaway warm pass first (axon async settle), seeds varied per call
(replay-cache guard), min of 2 timed passes per config, configs alternated
A/B/A/B to cancel drift.

Run: python experiments/round6_sbvh_ab.py
Env: PROBE_TRIS (default 1M), SWEEP_SPP (default 16), TE (default 10),
     POOL (default 262144), PAL (default 1).
"""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

TRIS = int(os.environ.get("PROBE_TRIS", 1_000_000))
SPP = int(os.environ.get("SWEEP_SPP", 16))
TE = int(os.environ.get("TE", 10))
POOL = int(os.environ.get("POOL", 262144))
PAL = os.environ.get("PAL", "1") == "1"

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
    data = {}
    for q in (0, 1):
        os.environ["UWPT_BVH_QUALITY"] = str(q)
        t0 = time.time()
        # Scene caches nothing for the non-instanced path; rebuild per q.
        data[q] = scene.build("wide16")
        rows = data[q].wide16_nodes.shape[0]
        print(f"quality={q}: {rows:,} rows, attr rows {data[q].tris.shape[0]:,}, "
              f"build {time.time()-t0:.1f}s", flush=True)

    config = RenderConfig(
        width=1920, height=1080, samples_per_pass=SPP, max_bounces=5,
        traversal="wide16", sky_mode=SKY_MODE_ENVIRONMENT,
        has_environment_texture=True, use_russian_roulette=True,
        integrator="fused", pool_size=POOL, transition_every=TE,
        use_prestep=True, use_pallas_arrival=PAL,
    )
    params = make_camera_params(width=1920, height=1080, **cam)

    @jax.jit
    def one_pass(sd, params):
        film, occ, rays, arrivals = fused_pass_with_stats(
            sd, config, params, 0, pool_size=POOL)
        return film.sum(), occ, rays, arrivals

    import dataclasses as _dc

    def with_seed(i):
        return _dc.replace(params, seed_root=jnp.uint32(0x9E3779B9 + i))

    # Throwaway: the first measured config in a process is garbage.
    jax.block_until_ready(one_pass(data[0], with_seed(0)))

    times = {0: [], 1: []}
    stats = {}
    for rep in range(3):
        for q in (0, 1):
            t0 = time.perf_counter()
            out = one_pass(data[q], with_seed(10 + rep * 2 + q))
            jax.block_until_ready(out)
            times[q].append(time.perf_counter() - t0)
            stats[q] = tuple(np.asarray(x) for x in out)

    for q in (0, 1):
        fsum, occ, rays, arrivals = stats[q]
        dt = min(times[q])
        print(f"quality={q}: {dt:6.2f} s/pass, {float(rays)/dt/1e6:5.2f} Mrays/s, "
              f"occ {float(occ):.3f}, arr/ray {float(arrivals)/max(float(rays),1):5.2f}, "
              f"film {float(fsum):.6g}  (times {[f'{t:.2f}' for t in times[q]]})",
              flush=True)


if __name__ == "__main__":
    main()
