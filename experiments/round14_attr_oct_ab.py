"""In-context A/B of the mode-3 oct-normal attr rows (16 B/tri) vs the
production mode-2 f16 rows (32 B/tri) on the 1M-tri bench scene.

Round-11 established random attr-gather pricing is TABLE-FOOTPRINT-driven
(64 MB -> ~24 ns/row, 32 MB -> ~16-18); the round-4 trace at te8/p96k
prices the attr path at ~0.45 ms/super (fusion.662) plus a 0.37 ms/super
table-staging copy (copy.126) that scales with TABLE bytes, not pool —
mode 3 quarters both tables (35 -> 16 MB paired view).

The bench scene is untextured, so dropping uv from the rows is valid
(mode 3's static requirement).  CPU parity: film rel delta 3.3e-5 vs
mode 2 (oct codec max angular error 0.0007 rad).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/round14_attr_oct_ab.py
Env: SPP (default 32), POOL (default 98304), TE (default 8).
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
SPP = int(os.environ.get("SPP", 32))
TE = int(os.environ.get("TE", 8))


def main():
    scene, cam = million_triangle_scene(1_000_000)
    sd = scene.build("wide16")
    params = make_camera_params(width=1920, height=1080, **cam)
    base = RenderConfig(
        width=1920, height=1080, samples_per_pass=SPP, max_bounces=5,
        traversal="wide16", sky_mode=SKY_MODE_ENVIRONMENT,
        has_environment_texture=True, use_russian_roulette=True,
        integrator="fused", pool_size=POOL, transition_every=TE,
        use_prestep=True, use_pallas_arrival=True,
    )
    variants = [
        ("warmup(base)", base),
        ("mode2 (prod)", base),
        ("mode3 oct   ", dataclasses.replace(base, attr_compact=3)),
        ("mode2 again ", base),
    ]
    films = {}
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
            if i == 0:
                films[name] = np.asarray(out[0])
        dt = min(ts[1:])
        rays = int(np.asarray(out[2]))
        arr = int(np.asarray(out[3]))
        print(f"{name:14s} pass {dt:6.2f} s  occ {float(np.asarray(out[1])):.3f} "
              f"rays {rays}  arr/ray {arr / max(rays, 1):.2f}  "
              f"({rays / dt / 1e6:.2f} Mrays/s)  film {fsum:.6g}", flush=True)
    a, b = films["mode2 (prod)"], films["mode3 oct   "]
    d = np.abs(a - b)
    print(f"film delta: max {d.max():.3e}  rel "
          f"{d.max() / (np.abs(a).max() + 1e-9):.3e}")


if __name__ == "__main__":
    main()
