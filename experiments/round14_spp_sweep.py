"""Samples-per-pass sweep under the record film (VERDICT r3 item 6).

The record film made transitions cheap and the pass tail small
(occupancy 0.993 at 32 spp / pool 96k), but each pass still pays fixed
costs: the end-of-pass resolve sort (~6.6 ns/row over budget rows), the
drain tail, and dispatch warmup.  Higher spp/pass amortizes them per
sample — at the price of a linearly larger record buffer
(1080p x spp x 16 B: 32 spp ~ 1.1 GB, 64 ~ 2.1 GB, 128 ~ 4.3 GB; the
resolve sort allocates ~2x its operands, so 128 spp approaches the v5e's
16 GB HBM — watch for OOM).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/round14_spp_sweep.py
Env: POOL (default 98304), TE (default 8), ATTR (default 2),
     SPPS (default "32,64,128").
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

POOL = int(os.environ.get("POOL", 98304))
TE = int(os.environ.get("TE", 8))
ATTR = int(os.environ.get("ATTR", 2))
SPPS = [int(s) for s in os.environ.get("SPPS", "32,64,128").split(",")]


def main():
    scene, cam = million_triangle_scene(1_000_000)
    sd = scene.build("wide16")
    params = make_camera_params(width=1920, height=1080, **cam)
    first = True
    for spp in SPPS:
        config = RenderConfig(
            width=1920, height=1080, samples_per_pass=spp, max_bounces=5,
            traversal="wide16", sky_mode=SKY_MODE_ENVIRONMENT,
            has_environment_texture=True, use_russian_roulette=True,
            integrator="fused", pool_size=POOL, transition_every=TE,
            use_prestep=True, use_pallas_arrival=True, attr_compact=ATTR,
        )

        @jax.jit
        def one_pass(sd, params, cs, config=config):
            return fused_pass_with_stats(sd, config, params, cs,
                                         pool_size=POOL)

        try:
            reps = 3 if first else 2
            first = False
            ts = []
            for i in range(reps):
                p = dataclasses.replace(
                    params, seed_root=jnp.uint32(99 + 13 * i))
                t0 = time.perf_counter()
                out = one_pass(sd, p, 0)
                _ = float(np.asarray(out[0]).sum())
                ts.append(time.perf_counter() - t0)
            dt = min(ts[1:]) if len(ts) > 1 else ts[0]
            rays = int(np.asarray(out[2]))
            occ = float(np.asarray(out[1]))
            print(f"spp {spp:4d}: pass {dt:7.2f} s  occ {occ:.3f}  "
                  f"{rays / dt / 1e6:6.2f} Mrays/s  "
                  f"{spp / dt:7.3f} spp/s", flush=True)
        except Exception as e:  # OOM expected at the top end
            print(f"spp {spp:4d}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
