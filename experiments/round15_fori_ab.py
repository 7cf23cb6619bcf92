"""A/B of ``arrival_fori``: te Pallas arrivals via ONE lax.fori_loop vs
the Python te-unroll — compile wall AND runtime (XLA layout assignment is
structure-sensitive; round-6 measured nested control flow de-optimizing
the gather layout, so the runtime must be re-measured, not assumed).

Compile is measured cold by CLEARING the persistent cache dir for this
script (a fresh tmp dir), runtime on the usual production config.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/round15_fori_ab.py
Env: SPP (default 64), POOL (default 3<<15).
"""

import dataclasses
import os
import tempfile
import time

import numpy as np
import jax

# Fresh cache dir: compile walls below are true cold compiles.
jax.config.update("jax_compilation_cache_dir", tempfile.mkdtemp())

from unity_webgpu_pathtracer_tpu.config import SKY_MODE_ENVIRONMENT, RenderConfig  # noqa: E402
from unity_webgpu_pathtracer_tpu.models.benchmark import million_triangle_scene  # noqa: E402
from unity_webgpu_pathtracer_tpu.render.camera import make_camera_params  # noqa: E402
from unity_webgpu_pathtracer_tpu.render.fused import fused_pass_with_stats  # noqa: E402

POOL = int(os.environ.get("POOL", 3 << 15))
SPP = int(os.environ.get("SPP", 64))


def main():
    scene, cam = million_triangle_scene(1_000_000)
    sd = scene.build("wide16")
    params = make_camera_params(width=1920, height=1080, **cam,
                                environment_intensity=np.float32(1.0))
    step = jax.jit(fused_pass_with_stats, static_argnums=(1,),
                   static_argnames=("pool_size",))
    out = {}
    for name, fori in (("unroll", False), ("fori", True)):
        config = RenderConfig(
            width=1920, height=1080, samples_per_pass=SPP, max_bounces=5,
            traversal="wide16", sky_mode=SKY_MODE_ENVIRONMENT,
            has_environment_texture=True, use_russian_roulette=True,
            integrator="fused", pool_size=POOL, transition_every=8,
            use_prestep=True, use_pallas_arrival=True, arrival_fori=fori,
        )
        t0 = time.time()
        film, occ, rays, arr = step(sd, config, params, 0, pool_size=POOL)
        _ = np.asarray(film[:4])
        compile_s = time.time() - t0
        best = None
        for r in range(2):
            p = dataclasses.replace(params, seed_root=np.uint32(5 + r))
            t0 = time.time()
            film, occ, rays, arr = step(sd, config, p, 1, pool_size=POOL)
            fm = float(np.asarray(film).mean())
            dt = time.time() - t0
            if best is None or dt < best[0]:
                best = (dt, fm)
        out[name] = (compile_s, *best)
        print(f"{name}: compile+first {compile_s:.1f}s, pass {best[0]:.2f}s "
              f"({int(rays)/best[0]/1e6:.2f} Mrays/s), film {best[1]:.6f}",
              flush=True)
    cu, cf = out["unroll"], out["fori"]
    print(f"\ncompile {cu[0]:.1f} -> {cf[0]:.1f}s ({cu[0]/cf[0]:.2f}x); "
          f"pass {cu[1]:.2f} -> {cf[1]:.2f}s ({(cu[1]/cf[1]-1)*100:+.1f}%); "
          f"film rel diff {abs(cu[2]-cf[2])/max(abs(cu[2]),1e-9):.2e}")


if __name__ == "__main__":
    main()
