"""A/B of node_carry / env_carry on the production bench config.

Round-16 trace at the shipped config (te8, pool 96k): with only the attr
table carried, 2 of the 8 node gathers compile degenerate (0.177 vs
0.148 ms, fusion.540/544) and the env rows pay a per-super layout copy
(copy.117, 0.038 ms).  Carrying those tables through the while carry
should normalize them (~ +2.5% bound).  Films must stay bit-identical.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/round16_tablecarry_ab.py
Env: SPP (default 64), POOL (default 3<<15), REPS (default 3).
"""

import dataclasses
import os
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from unity_webgpu_pathtracer_tpu.config import SKY_MODE_ENVIRONMENT, RenderConfig  # noqa: E402
from unity_webgpu_pathtracer_tpu.models.benchmark import million_triangle_scene  # noqa: E402
from unity_webgpu_pathtracer_tpu.render.camera import make_camera_params  # noqa: E402
from unity_webgpu_pathtracer_tpu.render.fused import fused_pass_with_stats  # noqa: E402

POOL = int(os.environ.get("POOL", 3 << 15))
SPP = int(os.environ.get("SPP", 64))
REPS = int(os.environ.get("REPS", 3))


def main():
    scene, cam = million_triangle_scene(1_000_000)
    sd = scene.build("wide16")
    params = make_camera_params(width=1920, height=1080, **cam,
                                environment_intensity=np.float32(1.0))
    step = jax.jit(fused_pass_with_stats, static_argnums=(1,),
                   static_argnames=("pool_size",))
    films, times = {}, {}
    for name, nk, ek in (("base", False, False), ("node", True, False),
                         ("env", False, True), ("both", True, True)):
        config = RenderConfig(
            width=1920, height=1080, samples_per_pass=SPP, max_bounces=5,
            traversal="wide16", sky_mode=SKY_MODE_ENVIRONMENT,
            has_environment_texture=True, use_russian_roulette=True,
            integrator="fused", pool_size=POOL, transition_every=8,
            use_prestep=True, use_pallas_arrival=True,
            node_carry=nk, env_carry=ek,
        )
        t0 = time.time()
        film, occ, rays, arr = step(sd, config, params, 0, pool_size=POOL)
        _ = np.asarray(film[:4])
        compile_s = time.time() - t0
        best = None
        for r in range(REPS):
            t0 = time.time()
            film, occ, rays, arr = step(sd, config, params, 1, pool_size=POOL)
            f = np.asarray(film)
            dt = time.time() - t0
            if best is None or dt < best:
                best = dt
        films[name] = f
        times[name] = best
        print(f"{name:5s}: compile+first {compile_s:6.1f}s, best pass "
              f"{best:6.2f}s ({int(rays)/best/1e6:6.2f} Mrays/s), "
              f"occ {float(occ):.3f}", flush=True)
    ref = films["base"]
    bad = [k for k, f in films.items() if not (f == ref).all()]
    assert not bad, f"films diverged: {bad}"
    print("parity: all films bit-identical")
    for k in ("node", "env", "both"):
        print(f"  {k}: {(times['base'] / times[k] - 1) * 100:+.1f}% vs base")


if __name__ == "__main__":
    main()
