"""A/B of ``ptrans_tile3d``: feed the Pallas transition kernel 3-D
(n, 8, 128) operands instead of 2-D (8, B/8).

A (B,) array stored T(1024) is physically a sequence of (8, 128) vregs,
so the 3-D reshape is a FREE bitcast (0 copies,
round20_tile3d_probe.py) while the shipped 2-D reshape is a strided
relayout — the round-20 trace prices the kernel-IO reshape/copy tax at
~95 us/super.  In-kernel rate is identical (9.21 vs 9.14 ns/lane-chain).
Control flow must match exactly; films are ulp-close (XLA re-contracts
FMAs around the pallas_call when operand shapes change).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/round20_tile3d_ab.py
Env: SPP (default 32), POOL (default 3<<15), TE (default 8), PTRANS (1).
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
TE = int(os.environ.get("TE", 8))
PTRANS = os.environ.get("PTRANS", "1") == "1"


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
        use_pallas_transition=PTRANS,
    )
    variants = [
        ("warmup(base)", base),
        ("base        ", base),
        ("tile3d      ", dataclasses.replace(base, ptrans_tile3d=True)),
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
    ref = films["base        "]
    for name, f in films.items():
        if name in ("base        ", "warmup(base)"):
            continue
        md = float(np.abs(ref - f).max())
        ok = np.allclose(ref, f, rtol=1e-6, atol=1e-6)
        print(f"{name}: film {'ULP-CLOSE' if ok else 'DIVERGED'} "
              f"maxdiff {md:.3g}")


if __name__ == "__main__":
    main()
