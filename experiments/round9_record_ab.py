"""In-context A/B: record film (append + end-of-pass resolve) vs the
shipped sorted-prefix film on the bench scene, with a te re-sweep (the
record film removes the per-transition scatter entirely, so the stall
model predicts the cadence optimum may drop again).

film_k_shift=0 (K = B) is record-film-only territory: every death record
is accepted every transition (no backpressure, no parked-lane occupancy
loss) because the append is a contiguous DMA, not a scatter.

Host-read timing, first config discarded as warmup, seeds varied per rep
to defeat replay caching (docs/PERFORMANCE.md measurement discipline).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/round9_record_ab.py
Env: SPP (default 32), POOL.
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
        use_sorted_film=True, film_k_shift=1,
    )

    def rec(te, shift):
        return dataclasses.replace(
            base, transition_every=te, use_record_film=True,
            film_k_shift=shift)

    variants = [
        ("warmup(sorted te8)", base),
        ("sorted  te8 k1", base),
        ("record  te8 k0", rec(8, 0)),
        ("record  te8 k1", rec(8, 1)),
        ("record  te6 k0", rec(6, 0)),
        ("record  te5 k0", rec(5, 0)),
        ("record  te8 k0 perm", dataclasses.replace(
            rec(8, 0), film_sort_perm=True)),
        ("sorted  te8 k1 perm", dataclasses.replace(
            base, film_sort_perm=True)),
    ]
    films = {}
    for name, config in variants:
        @jax.jit
        def one_pass(sd, params, cs, config=config):
            film, occ, rays, arrivals = fused_pass_with_stats(
                sd, config, params, cs, pool_size=POOL)
            return film, occ, rays, arrivals
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
        print(f"{name:20s} pass {dt:6.2f} s  occ {float(np.asarray(out[1])):.3f} "
              f"rays {rays}  arr/ray {arr / max(rays, 1):.2f}  "
              f"({rays / dt / 1e6:.2f} Mrays/s)  film {fsum:.6g}", flush=True)
    ref = films.get("sorted  te8 k1")
    for name, f in films.items():
        if name in ("sorted  te8 k1", "warmup(sorted te8)"):
            continue
        ok = np.allclose(f, ref, rtol=3e-7, atol=1e-7)
        print(f"parity {name}: max|d|={np.abs(f - ref).max():.3g} allclose={ok}")


if __name__ == "__main__":
    main()
