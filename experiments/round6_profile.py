"""Xprof the lane-film fused pass: where do the extra ~26 ms/super-iter go?

Captures a trace of one short full pass (spp=2) and prints per-op time
grouped by HLO source line (the round-2 recipe that worked).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/round6_profile.py
Env: LANE=1|0, TE, SPP.
"""

import glob
import json
import os

import numpy as np
import jax
import jax.numpy as jnp

TE = int(os.environ.get("TE", 10))
SPP = int(os.environ.get("SPP", 2))
LANE = os.environ.get("LANE", "1") == "1"
POOL = 262144
OUT = os.environ.get("PROF_DIR", "/tmp/prof_lane")

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from unity_webgpu_pathtracer_tpu.config import SKY_MODE_ENVIRONMENT, RenderConfig  # noqa: E402
from unity_webgpu_pathtracer_tpu.models.benchmark import million_triangle_scene  # noqa: E402
from unity_webgpu_pathtracer_tpu.render.camera import make_camera_params  # noqa: E402
from unity_webgpu_pathtracer_tpu.render.fused import fused_pass_with_stats  # noqa: E402


def main():
    scene, cam = million_triangle_scene(1_000_000)
    sd = scene.build("wide16")
    config = RenderConfig(
        width=1920, height=1080, samples_per_pass=SPP, max_bounces=5,
        traversal="wide16", sky_mode=SKY_MODE_ENVIRONMENT,
        has_environment_texture=True, use_russian_roulette=True,
        integrator="fused", pool_size=POOL, transition_every=TE,
        use_prestep=True, use_pallas_arrival=True, use_lane_film=LANE,
    )
    params = make_camera_params(width=1920, height=1080, **cam)

    @jax.jit
    def one_pass(sd, params):
        film, occ, rays, arrivals = fused_pass_with_stats(
            sd, config, params, 0, pool_size=POOL)
        return film.sum(), occ, rays, arrivals

    import dataclasses as _dc
    import time

    def ws(i):
        return _dc.replace(params, seed_root=jnp.uint32(0xABCD + i))

    jax.block_until_ready(one_pass(sd, ws(0)))   # compile + warm
    t0 = time.perf_counter()
    jax.block_until_ready(one_pass(sd, ws(1)))
    print(f"pass: {time.perf_counter()-t0:.2f} s (lane={LANE}, te={TE}, spp={SPP})",
          flush=True)

    os.makedirs(OUT, exist_ok=True)
    with jax.profiler.trace(OUT):
        out = one_pass(sd, ws(2))
        jax.block_until_ready(out)

    xs = glob.glob(os.path.join(OUT, "**", "*.xplane.pb"), recursive=True)
    if not xs:
        print("no xplane files")
        return
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data as r2t
    except ImportError:
        from xprof.convert import raw_to_tool_data as r2t
    data, _ = r2t.xspace_to_tool_data(xs, "framework_op_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    js = json.loads(data)
    # op stats rows: find the table. Print top ops by total self time.
    open("/tmp/op_stats_lane.json", "w").write(data)
    print("wrote /tmp/op_stats_lane.json")


if __name__ == "__main__":
    main()
