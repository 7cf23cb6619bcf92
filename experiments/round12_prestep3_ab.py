"""Re-test prestep_levels=3 under the current (much cheaper) arrival kernel.

Round-6 measured L3 a net loss (14.43 -> 14.71 s/pass) when Pallas
arrivals cost ~2x what they do now (canonical-f16 decode + in-kernel
transpose + f16 compact attrs since shipped). L3 cuts ~0.3 arrival waves
per pass; if a wave now costs less but the (B,256) one-hot matmuls cost
the same, the balance could still be negative — measure, don't guess.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/round12_prestep3_ab.py
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

POOL = int(os.environ.get("POOL", 262144))
SPP = int(os.environ.get("SPP", 32))


def main():
    scene, cam = million_triangle_scene(1_000_000)
    sd = scene.build("wide16")
    params = make_camera_params(width=1920, height=1080, **cam)
    base = RenderConfig(
        width=1920, height=1080, samples_per_pass=SPP, max_bounces=5,
        traversal="wide16", sky_mode=SKY_MODE_ENVIRONMENT,
        has_environment_texture=True, use_russian_roulette=True,
        integrator="fused", pool_size=POOL, transition_every=8,
        use_prestep=True, use_pallas_arrival=True,
    )
    variants = [
        ("warmup(base)", base),
        ("L2 (prod)   ", base),
        ("L3          ", dataclasses.replace(base, prestep_levels=3)),
    ]
    for name, config in variants:
        @jax.jit
        def one_pass(sd, params, cs, config=config):
            return fused_pass_with_stats(sd, config, params, cs,
                                         pool_size=POOL)
        ts = []
        for i in range(3):
            p = dataclasses.replace(params, seed_root=jnp.uint32(1234 + 7 * i))
            t0 = time.perf_counter()
            out = one_pass(sd, p, 0)
            fsum = float(np.asarray(out[0]).sum())
            ts.append(time.perf_counter() - t0)
        dt = min(ts[1:])
        rays = int(np.asarray(out[2]))
        arr = int(np.asarray(out[3]))
        print(f"{name:14s} pass {dt:6.2f} s  occ {float(np.asarray(out[1])):.3f} "
              f"rays {rays}  arr/ray {arr / max(rays, 1):.2f}  "
              f"({rays / dt / 1e6:.2f} Mrays/s)  film {fsum:.6g}", flush=True)


if __name__ == "__main__":
    main()
