"""Measure the arrival kind mix (inner / leaf / instance / stalled) of the
fused loop on the bench scene, for wide8 and wide16.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/round3_kindmix.py
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

POOL = 1 << 18
TE = 10


def main(trav):
    from unity_webgpu_pathtracer_tpu.config import SKY_MODE_ENVIRONMENT, RenderConfig
    from unity_webgpu_pathtracer_tpu.models.benchmark import million_triangle_scene
    from unity_webgpu_pathtracer_tpu.render import fused as F
    from unity_webgpu_pathtracer_tpu.render.camera import make_camera_params
    from unity_webgpu_pathtracer_tpu.utils.math import safe_rcp

    scene, cam = million_triangle_scene(1_000_000)
    config = RenderConfig(
        width=1920, height=1080, samples_per_pass=2, max_bounces=5,
        traversal=trav, sky_mode=SKY_MODE_ENVIRONMENT,
        has_environment_texture=True, use_russian_roulette=True,
        integrator="fused", pool_size=POOL, transition_every=TE,
    )
    sd = scene.build(trav)
    params = make_camera_params(width=1920, height=1080, **cam,
                                environment_intensity=np.float32(1.0))
    budget = config.pixel_count() * config.samples_per_pass

    if trav == "wide16":
        from unity_webgpu_pathtracer_tpu.ops import traverse_wide16 as tw
        nodes = sd.wide16_nodes
        step = tw.arrival_step16
        init = tw.init_state16(POOL, jnp.float32(0.0), ptr0=tw.DONE)
    else:
        from unity_webgpu_pathtracer_tpu.ops import traverse_wide8 as tw
        nodes = sd.wide8_nodes
        step = tw.arrival_step8
        init = tw.init_state8(POOL, jnp.float32(0.0), ptr0=tw.DONE)

    meta_all = jax.lax.bitcast_convert_type(nodes[:, 3], jnp.int32)

    def body(carry):
        s, counts = carry
        inv = safe_rcp(s.trav_d)
        shadowing = (s.mode == F.MODE_SHADOW_ENV) | (s.mode == F.MODE_SHADOW_LIGHT)
        trav = s.trav
        for _ in range(TE):
            active = (s.mode != F.MODE_DEAD) & ~(shadowing & trav.found)
            live = active & (trav.ptr >= 0)
            m = meta_all[jnp.where(live, trav.ptr, 0)]
            counts = counts.at[0].add(jnp.sum((live & (m == 0)).astype(jnp.int32)))
            counts = counts.at[1].add(jnp.sum((live & (m > 0)).astype(jnp.int32)))
            counts = counts.at[2].add(jnp.sum((live & (m < 0)).astype(jnp.int32)))
            counts = counts.at[3].add(jnp.sum(((s.mode != F.MODE_DEAD) & ~live)
                                              .astype(jnp.int32)))
            counts = counts.at[4].add(jnp.sum((s.mode == F.MODE_DEAD)
                                              .astype(jnp.int32)))
            trav = step(nodes, s.trav_o, s.trav_d, inv, trav, active,
                        has_instances=False)
        s = s._replace(trav=trav)
        s = F._transition(sd, config, params, s, budget, jnp.uint32(0),
                          trav.ptr < 0, None, None)
        return s, counts

    def cond(carry):
        s, _ = carry
        return jnp.any(s.mode != F.MODE_DEAD) | (s.queue_head < budget)

    b = POOL
    z3 = jnp.zeros((b, 3), jnp.float32)
    zi = jnp.zeros((b,), jnp.int32)
    zf = jnp.zeros((b,), jnp.float32)
    s0 = F.FusedState(
        mode=jnp.full((b,), F.MODE_DEAD, jnp.int32), trav=init,
        trav_o=z3, trav_d=z3.at[:, 2].set(1.0),
        path_o=z3, path_d=z3.at[:, 2].set(1.0),
        hit_t=zf, hit_uv_bary=jnp.zeros((b, 2), jnp.float32),
        hit_tri=jnp.full((b,), -1, jnp.int32),
        hit_inst=jnp.full((b,), -1, jnp.int32),
        pending=z3, throughput=z3, radiance=z3,
        rng=jnp.zeros((b,), jnp.uint32), pixel=zi, depth=zi,
        max_roughness=zf, prev_pdf=zf, lane_cap=zi,
        film=jnp.zeros((config.pixel_count(), 3), jnp.float32),
        queue_head=jnp.asarray(0, jnp.int32), arrivals=jnp.asarray(0, jnp.int32),
        rays=jnp.asarray(0, jnp.int32), busy=jnp.asarray(0, jnp.int32),
        ticks=jnp.asarray(0, jnp.int32),
    )

    @jax.jit
    def run(s0):
        return jax.lax.while_loop(cond, body, (s0, jnp.zeros(5, jnp.int32)))

    sf, counts = run(s0)
    c = np.asarray(counts, np.int64)
    total = c.sum()
    names = ["inner", "leaf", "instance", "stalled-live", "dead"]
    print(f"== {trav}: kind mix over one 2-spp pass ==")
    for n, v in zip(names, c):
        print(f"  {n:14s} {v:14,}  {100*v/total:5.1f}%")
    print(f"  total slots   {total:14,}")


if __name__ == "__main__":
    for trav in (sys.argv[1:] or ["wide8", "wide16"]):
        main(trav)
