"""Count HLO ops (post-optimization fusions, gathers, scatters, while bodies)
in the fused integrator body — CPU-side analysis of why the transition costs
22 ms on TPU. Run with JAX_PLATFORMS=cpu (conftest recipe applied inline)."""

import os
import re
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo")
import numpy as np

from unity_webgpu_pathtracer_tpu.config import RenderConfig
from unity_webgpu_pathtracer_tpu.models.cornell import cornell_box
from unity_webgpu_pathtracer_tpu.render.camera import make_camera_params
from unity_webgpu_pathtracer_tpu.render.fused import fused_pass_with_stats

size = 64
scene, cam = cornell_box()
config = RenderConfig(
    width=size, height=size, samples_per_pass=1, max_bounces=5,
    traversal="wide", sky_mode=2, integrator="fused", pool_size=4096,
)
scene_data = scene.build(config.traversal)
params = make_camera_params(width=size, height=size, **cam)


def step(scene_data, params):
    film, *_ = fused_pass_with_stats(scene_data, config, params, 0,
                                     pool_size=4096)
    return film


lowered = jax.jit(step).lower(scene_data, params)
compiled = lowered.compile()
hlo = compiled.as_text()

print("total HLO lines:", len(hlo.splitlines()))
for pat in ("fusion(", "gather(", "scatter(", "while(", "dynamic-slice(",
            "dynamic-update-slice(", "custom-call(", "sort(", "reduce(",
            "all-reduce(", "copy(", "transpose(", "power(", "exponential(",
            "log(", "sqrt", "rsqrt", "divide("):
    n = len(re.findall(re.escape(pat), hlo))
    print(f"{pat:24s} {n}")

# The while body is where the per-iteration cost lives; isolate it.
m = re.search(r"%while_body[^\n]*\n(.*?)\n\}", hlo, re.S)
if m:
    body = m.group(0)
    print("\nwhile-body lines:", len(body.splitlines()))
    for pat in ("fusion(", "gather(", "scatter(", "dynamic-slice(",
                "copy(", "transpose("):
        print(f"  body {pat:20s} {len(re.findall(re.escape(pat), body))}")

with open("/tmp/fused_hlo.txt", "w") as f:
    f.write(hlo)
print("\nHLO dumped to /tmp/fused_hlo.txt")
