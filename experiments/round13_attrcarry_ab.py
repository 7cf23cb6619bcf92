"""A/B of ``attr_carry``: thread the (M, 16) paired attr table through the
while carry so XLA stages the gather-friendly layout ONCE at loop entry.

The round-13 trace (te8, pool 96k production) shows copy.126 — a 35 MB
u32[545118,16] layout copy of the attr table into {0,1:T(8,128)S(1)} —
running EVERY super-iteration (0.37 ms/super = 7% of the pass) because
the table is a closed-over jit parameter whose ABI layout is fixed.

Production config otherwise (record film te8 k0, prestep, Pallas, pool
96k).  Host-read timing, warmup discarded, seeds varied per rep.  Films
must be bit-identical (same gather rows, same math).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/round13_attrcarry_ab.py
Env: SPP (default 32), POOL (default 3<<15).
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
        ("base     te8", base),
        ("attr_carry  ", dataclasses.replace(base, attr_carry=True)),
    ]
    films = {}
    for name, config in variants:
        @jax.jit
        def one_pass(sd, params, cs, config=config):
            return fused_pass_with_stats(sd, config, params, cs,
                                         pool_size=POOL)
        ts = []
        for i in range(4):
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
    ref = films["base     te8"]
    diverged = []
    for name, f in films.items():
        if name in ("base     te8", "warmup(base)"):
            continue
        d = np.abs(f - ref).max()
        exact = bool((f == ref).all())
        print(f"parity {name}: max|d|={d:.3g} exact={exact}")
        if not exact:
            diverged.append(name)
    # Films must be bit-identical (same gathers, different staging only);
    # fail loudly so a non-interactive run catches numerics regressions.
    assert not diverged, f"attr_carry films diverged: {diverged}"


if __name__ == "__main__":
    main()
