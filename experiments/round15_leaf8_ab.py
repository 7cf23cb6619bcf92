"""A/B of the wide16 leaf8 format (48-float rows, 8-triangle leaves).

Round-15 trace at the production config (te8, pool 96k): the 8 per-super
f32[B,96] node-row gathers are 26% of the super-iteration and the leaf
f16-decode+Moller-Trumbore is 46% of the Pallas arrival kernel.  leaf8
halves both (192-byte rows, 8 MT slots) against ~10-15% more leaf
arrivals from splitting 9..16-triangle leaves.

Films are NOT bit-comparable across formats (leaf anchors move, so the
anchor-relative f16 v0 quantization differs per triangle); the check is
statistical: film means must agree to ~0.1%.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/round15_leaf8_ab.py
Env: SPP (default 64), POOL (default 3<<15), REPS (default 2).
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
from unity_webgpu_pathtracer_tpu.models.benchmark import million_triangle_scene  # noqa: E402
from unity_webgpu_pathtracer_tpu.render.camera import make_camera_params  # noqa: E402
from unity_webgpu_pathtracer_tpu.render.fused import fused_pass_with_stats  # noqa: E402

POOL = int(os.environ.get("POOL", 3 << 15))
SPP = int(os.environ.get("SPP", 64))
REPS = int(os.environ.get("REPS", 2))


def main():
    scene, cam = million_triangle_scene(1_000_000)
    params = make_camera_params(width=1920, height=1080, **cam,
                                environment_intensity=np.float32(1.0))
    config = RenderConfig(
        width=1920, height=1080, samples_per_pass=SPP, max_bounces=5,
        traversal="wide16", sky_mode=SKY_MODE_ENVIRONMENT,
        has_environment_texture=True, use_russian_roulette=True,
        integrator="fused", pool_size=POOL, transition_every=8,
        use_prestep=True, use_pallas_arrival=True,
    )
    step = jax.jit(fused_pass_with_stats, static_argnums=(1,),
                   static_argnames=("pool_size",))

    results = {}
    for name, leaf8 in (("classic96", False), ("leaf8x48", True)):
        os.environ["UWPT_WIDE16_LEAF8"] = "1" if leaf8 else "0"
        t0 = time.time()
        sd = scene.build("wide16")  # no caching on non-instanced builds
        build_s = time.time() - t0
        nodes = np.asarray(sd.wide16_nodes)
        print(f"{name}: rows {nodes.shape} = {nodes.nbytes/1e6:.0f} MB, "
              f"build {build_s:.1f}s, stack {sd.stack_levels.shape[0]}",
              flush=True)
        # warmup/compile
        film, occ, rays, arr = step(sd, config, params, 0, pool_size=POOL)
        _ = np.asarray(film[:4])
        best = None
        for r in range(REPS):
            p = dataclasses.replace(params, seed_root=np.uint32(77 + r))
            t0 = time.time()
            film, occ, rays, arr = step(sd, config, p, 1, pool_size=POOL)
            fmean = float(np.asarray(film).mean())
            dt = time.time() - t0
            mr = int(rays) / dt / 1e6
            print(f"  {name} rep{r}: {dt:.2f}s  occ {float(occ):.3f} "
                  f"rays {int(rays):,} arr/ray {int(arr)/int(rays):.2f} "
                  f"({mr:.2f} Mrays/s) film {fmean:.6f}", flush=True)
            if best is None or dt < best[0]:
                best = (dt, mr, fmean, int(arr) / int(rays))
        results[name] = best
    a, b = results["classic96"], results["leaf8x48"]
    print(f"\nclassic {a[0]:.2f}s ({a[1]:.2f} Mrays/s, {a[3]:.2f} arr/ray) "
          f"vs leaf8 {b[0]:.2f}s ({b[1]:.2f} Mrays/s, {b[3]:.2f} arr/ray): "
          f"{(a[0]/b[0]-1)*100:+.1f}%")
    dm = abs(a[2] - b[2]) / max(abs(a[2]), 1e-9)
    print(f"film mean rel diff {dm:.2e} (expect <1e-3; formats quantize "
          f"v0 against different leaf anchors)")
    assert dm < 2e-3, "leaf8 film diverged beyond f16 re-anchoring noise"


if __name__ == "__main__":
    main()
