"""Confirm the node_carry COLD-COMPILE win (round16_tablecarry_ab saw
base 172.7s vs node 36.4s, runtime neutral).  Compiles each variant
twice against a fresh tmp cache dir (true cold), interleaved to spread
tunnel noise.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/round16_compile_ab.py
"""

import os
import tempfile
import time

import numpy as np
import jax

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
    results = {}
    for rep in range(2):
        for name, nk in (("node", True), ("base", False)):
            # Fresh cache dir per compile: guaranteed cold.
            jax.config.update("jax_compilation_cache_dir", tempfile.mkdtemp())
            config = RenderConfig(
                width=1920, height=1080, samples_per_pass=SPP, max_bounces=5,
                traversal="wide16", sky_mode=SKY_MODE_ENVIRONMENT,
                has_environment_texture=True, use_russian_roulette=True,
                integrator="fused", pool_size=POOL, transition_every=8,
                use_prestep=True, use_pallas_arrival=True, node_carry=nk,
            )
            step = jax.jit(fused_pass_with_stats, static_argnums=(1,),
                           static_argnames=("pool_size",))
            t0 = time.time()
            film, occ, rays, arr = step(sd, config, params, rep,
                                        pool_size=POOL)
            _ = np.asarray(film[:4])
            dt = time.time() - t0
            results.setdefault(name, []).append(dt)
            print(f"rep{rep} {name}: compile+first {dt:.1f}s", flush=True)
    for name, ts in results.items():
        print(f"{name}: {[round(t, 1) for t in ts]}")


if __name__ == "__main__":
    main()
