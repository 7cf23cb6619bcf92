"""te=6 under the Pallas transition kernel + gather masking.

The cadence sweeps on record: te6 13.83 vs te8 13.27 s/pass pre-kernel
(round 12), te4 14.03 / te2 far below under the kernel (round 18) — te6
was never measured WITH the kernel.  The stall-vs-transition trade: at
te6 the per-super transition cost (~1.6 ms XLA-side) amortizes over 6
waves instead of 8, but arr/ray drops (fewer stall waves per retire).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/round19_te6_ab.py
"""

import dataclasses
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(_ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
os.environ.setdefault("UWPT_BVH_CACHE_DIR", os.path.join(_ROOT, ".bvh_cache"))

from unity_webgpu_pathtracer_tpu.config import SKY_MODE_ENVIRONMENT, RenderConfig  # noqa: E402
from unity_webgpu_pathtracer_tpu.models.benchmark import million_triangle_scene  # noqa: E402
from unity_webgpu_pathtracer_tpu.render.camera import make_camera_params  # noqa: E402
from unity_webgpu_pathtracer_tpu.render.fused import fused_pass_with_stats  # noqa: E402

POOL = int(os.environ.get("POOL", 3 << 15))
SPP = int(os.environ.get("SPP", 32))


def main():
    scene, cam = million_triangle_scene(1_000_000)
    sd = scene.build("wide16")
    params = make_camera_params(width=1920, height=1080, **cam)

    def cfg(te):
        return RenderConfig(
            width=1920, height=1080, samples_per_pass=SPP, max_bounces=5,
            traversal="wide16", sky_mode=SKY_MODE_ENVIRONMENT,
            has_environment_texture=True, use_russian_roulette=True,
            integrator="fused", pool_size=POOL, transition_every=te,
            use_prestep=True, use_pallas_arrival=True,
            use_pallas_transition=True,
        )

    for name, config in [("warmup te8", cfg(8)), ("te8", cfg(8)),
                         ("te6", cfg(6)), ("te7", cfg(7))]:
        @jax.jit
        def one_pass(sd, params, cs, config=config):
            return fused_pass_with_stats(sd, config, params, cs,
                                         pool_size=POOL)
        ts = []
        for i in range(4):
            p = dataclasses.replace(params, seed_root=jnp.uint32(1234 + 7 * i))
            t0 = time.perf_counter()
            out = one_pass(sd, p, 0)
            _ = float(np.asarray(out[0]).sum())
            ts.append(time.perf_counter() - t0)
        dt = min(ts[1:])
        rays = int(np.asarray(out[2]))
        arr = int(np.asarray(out[3]))
        print(f"{name:10s} pass {dt:6.2f} s  occ {float(np.asarray(out[1])):.3f} "
              f"arr/ray {arr / max(rays, 1):.2f}  "
              f"({rays / dt / 1e6:.2f} Mrays/s)", flush=True)


if __name__ == "__main__":
    main()
