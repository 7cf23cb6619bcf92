"""Sweep 2: cadence x samples-per-pass (occupancy tail) on the bench scene."""
import sys
import time

import numpy as np


def main():
    import jax

    from unity_webgpu_pathtracer_tpu.config import SKY_MODE_ENVIRONMENT, RenderConfig
    from unity_webgpu_pathtracer_tpu.models.benchmark import million_triangle_scene
    from unity_webgpu_pathtracer_tpu.render.camera import make_camera_params
    from unity_webgpu_pathtracer_tpu.render.fused import fused_pass_with_stats

    scene, cam = million_triangle_scene(1_000_000)
    sd = scene.build("wide8")
    params = make_camera_params(width=1920, height=1080, **cam,
                                environment_intensity=np.float32(1.0))
    step = jax.jit(fused_pass_with_stats, static_argnums=(1,),
                   static_argnames=("pool_size",))

    for te, spp, passes in ((6, 4, 1), (8, 4, 1), (8, 8, 1), (6, 2, 2)):
        c = RenderConfig(
            width=1920, height=1080, samples_per_pass=spp, max_bounces=5,
            traversal="wide8", sky_mode=SKY_MODE_ENVIRONMENT,
            has_environment_texture=True, use_russian_roulette=True,
            integrator="fused", pool_size=1 << 18, transition_every=te,
        )
        film, occ, rays, arr = step(sd, c, params, 0, pool_size=1 << 18)
        np.asarray(film[:4])
        t0 = time.time()
        tot = 0
        for i in range(passes):
            film, occ, rays, arr = step(sd, c, params, (i + 1) * spp,
                                        pool_size=1 << 18)
            np.asarray(film[:4])
            tot += int(rays)
        dt = time.time() - t0
        print(f"te={te} spp={spp} x{passes}: {tot/dt/1e6:.2f} Mrays/s "
              f"occ={float(occ):.3f}", flush=True)


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    main()
