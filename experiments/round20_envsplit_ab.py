"""A/B of ``env_split_rows``: extract the merged-env-row fields from the
transposed gather result (contiguous (B,) sublane slices) instead of
strided ``[B, j]`` columns.

The round-20 trace (same methodology as round18_ptrans_trace.py) shows
the env row pipeline paying, beyond the 151 us gather itself:
fusion.287 70 us (the alias-index [B, 1] extract lowered to a
16-iteration strided slice loop), slice_reduce_fusion.9 24 us (another
strided column), and copy-start/done.1 40 us (a duplicated row-major
layout copy kept alive ONLY for those strided extracts — the kernel-feed
path already makes a {0,1} column-major copy, copy.155).  Reading every
field off ``row.T`` makes each extract a contiguous sublane slice and
lets the single transposing gather serve all consumers — the round-2
column-extract cure, re-applied.

Films must be bit-identical (identical per-element values and op order;
tests/test_pallas_transition.py::test_env_split_rows_film_identical).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/round20_envsplit_ab.py
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
        ("envsplit    ", dataclasses.replace(base, env_split_rows=True)),
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
        same = np.array_equal(ref, f)
        print(f"{name}: film {'BIT-IDENTICAL' if same else 'DIVERGED '}"
              f"{'' if same else np.abs(ref - f).max()}")


if __name__ == "__main__":
    main()
