"""Dump the optimized HLO of the production pass and locate hot kernels.

Compiles the same jitted pass as round8_gaps.py (compile cache makes this
cheap) and writes the optimized HLO text to /tmp/r10/pass_hlo.txt, then
prints the definition lines of the kernels named on the command line
(default: the round-10 trace's hot list).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/round10_hlomap.py
Env: TE, SPP, POOL (must match the traced config for names to line up).
"""

import os
import re
import sys

import jax
import jax.numpy as jnp

TE = int(os.environ.get("TE", 10))
SPP = int(os.environ.get("SPP", 2))
POOL = int(os.environ.get("POOL", 262144))

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from unity_webgpu_pathtracer_tpu.config import SKY_MODE_ENVIRONMENT, RenderConfig  # noqa: E402
from unity_webgpu_pathtracer_tpu.models.benchmark import million_triangle_scene  # noqa: E402
from unity_webgpu_pathtracer_tpu.render.camera import make_camera_params  # noqa: E402
from unity_webgpu_pathtracer_tpu.render.fused import fused_pass_with_stats  # noqa: E402

scene, cam = million_triangle_scene(1_000_000)
sd = scene.build("wide16")
config = RenderConfig(
    width=1920, height=1080, samples_per_pass=SPP, max_bounces=5,
    traversal="wide16", sky_mode=SKY_MODE_ENVIRONMENT,
    has_environment_texture=True, use_russian_roulette=True,
    integrator="fused", pool_size=POOL, transition_every=TE,
    use_prestep=True, use_pallas_arrival=True,
)
params = make_camera_params(width=1920, height=1080, **cam)


@jax.jit
def one_pass(sd, params):
    film, occ, rays, arrivals = fused_pass_with_stats(
        sd, config, params, 0, pool_size=POOL)
    return film.sum(), occ, rays, arrivals


lowered = one_pass.lower(sd, params)
compiled = lowered.compile()
txt = compiled.as_text()
os.makedirs("/tmp/r10", exist_ok=True)
with open("/tmp/r10/pass_hlo.txt", "w") as f:
    f.write(txt)
print(f"HLO: {len(txt)} chars -> /tmp/r10/pass_hlo.txt")

names = sys.argv[1:] or ["fusion.571", "copy.179", "copy.181", "fusion.530",
                         "fusion.581", "fusion.643", "fusion.584",
                         "select_select_fusion.23", "iota_reduce_fusion.5",
                         "slice_reduce_fusion.7"]
for nm in names:
    # definition line: "  %name = type fusion(...), kind=..., calls=..."
    pat = re.compile(rf"^\s*(ROOT\s+)?%?{re.escape(nm)}\s*=\s*(.*)$",
                     re.MULTILINE)
    m = pat.search(txt)
    print(f"\n=== {nm} ===")
    if not m:
        print("  (not found)")
        continue
    line = m.group(2)
    print(" ", line[:1000])
