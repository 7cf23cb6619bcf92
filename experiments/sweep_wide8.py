"""Sweep pool size and transition cadence for the wide8 fused bench scene."""
import sys
import time

import numpy as np


def main():
    import jax

    from unity_webgpu_pathtracer_tpu.config import SKY_MODE_ENVIRONMENT, RenderConfig
    from unity_webgpu_pathtracer_tpu.models.benchmark import million_triangle_scene
    from unity_webgpu_pathtracer_tpu.render.camera import make_camera_params
    from unity_webgpu_pathtracer_tpu.render.fused import fused_pass_with_stats

    width, height = 1920, 1080
    t0 = time.time()
    scene, cam = million_triangle_scene(1_000_000)

    def cfg(pool, te):
        return RenderConfig(
            width=width, height=height, samples_per_pass=2, max_bounces=5,
            traversal="wide8", sky_mode=SKY_MODE_ENVIRONMENT,
            has_environment_texture=True, use_russian_roulette=True,
            integrator="fused", pool_size=pool, transition_every=te,
        )

    sd = scene.build("wide8")
    print(f"build {time.time()-t0:.0f}s rows {sd.wide8_nodes.shape}", flush=True)
    params = make_camera_params(width=width, height=height, **cam,
                                environment_intensity=np.float32(1.0))
    step = jax.jit(fused_pass_with_stats, static_argnums=(1,),
                   static_argnames=("pool_size",))

    combos = [(1 << 18, 2), (1 << 18, 4), (1 << 18, 6),
              (1 << 19, 0), (1 << 20, 0)]  # te filled with best after row 1
    best_te = 4
    results = []
    for pool, te in combos:
        te = te or best_te
        c = cfg(pool, te)
        t0 = time.time()
        film, occ, rays, arr = step(sd, c, params, 0, pool_size=pool)
        np.asarray(film[:4])
        compile_s = time.time() - t0
        t0 = time.time()
        tot = 0
        for i in range(2):
            film, occ, rays, arr = step(sd, c, params, i + 1, pool_size=pool)
            np.asarray(film[:4])
            tot += int(rays)
        dt = time.time() - t0
        mr = tot / dt / 1e6
        results.append((pool, te, mr))
        print(f"pool={pool} te={te}: {mr:.2f} Mrays/s occ={float(occ):.3f} "
              f"arrivals={int(arr)} (compile {compile_s:.0f}s)", flush=True)
        if len(results) == 3:
            best_te = max(results, key=lambda r: r[2])[1]
            print("best te:", best_te, flush=True)


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    main()
