"""Map the round-18 trace's hot fusion names to their HLO definitions.

Same config as round18_ptrans_trace.py (must match exactly for kernel
names to line up).  Compile-cache makes the compile free.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/round18_hlomap.py fusion.280 ...
Env: TE, SPP, POOL, PTRANS.
"""

import os
import re
import sys

import jax
import jax.numpy as jnp

TE = int(os.environ.get("TE", 8))
SPP = int(os.environ.get("SPP", 2))
POOL = int(os.environ.get("POOL", 3 << 15))
PTRANS = os.environ.get("PTRANS", "1") == "1"

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
os.environ.setdefault("UWPT_BVH_CACHE_DIR", "/root/repo/.bvh_cache")

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
    use_pallas_transition=PTRANS, attr_compact=2,
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
os.makedirs("/tmp/r18", exist_ok=True)
with open("/tmp/r18/pass_hlo.txt", "w") as f:
    f.write(txt)
print(f"HLO: {len(txt)} chars -> /tmp/r18/pass_hlo.txt")

names = sys.argv[1:] or ["fusion.280", "fusion.248", "fusion.276",
                         "fusion.284", "fusion.286", "sort.116",
                         "select_select_fusion.3", "body.119",
                         "multiply_add_fusion.5", "copy.155"]
for nm in names:
    pat = re.compile(rf"^\s*(ROOT\s+)?%?{re.escape(nm)}\s*=\s*(.*)$",
                     re.MULTILINE)
    m = pat.search(txt)
    print(f"\n=== {nm} ===")
    if not m:
        print("  (not found)")
        continue
    print(" ", m.group(2)[:1200])
