"""wide8 vs wide16, one process, scored by work actually retired.

Cross-process variance makes ms/super-iteration comparisons across runs
meaningless, and ms/iter alone can't compare different cadences (work per
iteration differs). The metric here is Delta(queue_head) / wall-time from
the same warm state: pixel-samples retired per second, which folds in
arrivals-per-ray, stall waste, and transition frequency.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/round4_trav_ab.py
Env: PROBE_POOL / PROBE_TRIS as in round3_probe; AB_ITERS (default 16).
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

POOL = int(os.environ.get("PROBE_POOL", 1 << 18))
TRIS = int(os.environ.get("PROBE_TRIS", 1_000_000))
ITERS = int(os.environ.get("AB_ITERS", 16))

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


_CACHE = {}


def make_setup(trav, te, pool, sample_base=0, pal=False):
    from unity_webgpu_pathtracer_tpu.config import SKY_MODE_ENVIRONMENT, RenderConfig
    from unity_webgpu_pathtracer_tpu.models.benchmark import million_triangle_scene
    from unity_webgpu_pathtracer_tpu.render import fused as F
    from unity_webgpu_pathtracer_tpu.render.camera import make_camera_params
    from unity_webgpu_pathtracer_tpu.utils.math import safe_rcp

    if "scene" not in _CACHE:
        _CACHE["scene"] = million_triangle_scene(TRIS)
    scene, cam = _CACHE["scene"]
    config = RenderConfig(
        width=1920, height=1080, samples_per_pass=8, max_bounces=5,
        traversal=trav, sky_mode=SKY_MODE_ENVIRONMENT, integrator="fused",
        pool_size=pool, transition_every=te,
    )
    if trav not in _CACHE:
        _CACHE[trav] = scene.build(trav)
    sd = _CACHE[trav]
    params = make_camera_params(width=1920, height=1080, **cam)
    budget = config.pixel_count() * config.samples_per_pass

    if trav == "wide16":
        from unity_webgpu_pathtracer_tpu.ops import traverse_wide16 as tw
        nodes = sd.wide16_nodes
        step = tw.arrival_step16
        init_tr = tw.init_state16(pool, jnp.float32(0.0), ptr0=tw.DONE,
                                  depth=sd.stack_levels.shape[0])
        trav16 = tw
    else:
        from unity_webgpu_pathtracer_tpu.ops import traverse_wide8 as tw
        nodes = sd.wide8_nodes
        step = tw.arrival_step8
        init_tr = tw.init_state8(pool, jnp.float32(0.0), ptr0=tw.DONE,
                                 depth=sd.stack_levels.shape[0])
        trav16 = None

    # sample_base decorrelates multiple chains (round4_dual.py): each
    # chain draws different samples of the same pixels via the shard tuple.
    shard_t = None if sample_base == 0 else (
        jnp.uint32(0), config.pixel_count(), jnp.uint32(sample_base))

    if pal:
        from unity_webgpu_pathtracer_tpu.ops import pallas_arrival as _pa

    def body(s):
        inv = safe_rcp(s.trav_d)
        shadowing = (s.mode == F.MODE_SHADOW_ENV) | (s.mode == F.MODE_SHADOW_LIGHT)
        trav = s.trav
        if pal:
            oT, dT, invT = s.trav_o.T, s.trav_d.T, inv.T
            for _ in range(te):
                active = (s.mode != F.MODE_DEAD) & ~(shadowing & trav.found)
                trav = _pa.arrival_step16_pallas(nodes, oT, dT, invT, trav,
                                                 active)
        else:
            for _ in range(te):
                active = (s.mode != F.MODE_DEAD) & ~(shadowing & trav.found)
                trav = step(nodes, s.trav_o, s.trav_d, inv, trav, active,
                            has_instances=False)
        s = s._replace(trav=trav)
        s = F._transition(sd, config, params, s, budget, jnp.uint32(0),
                          trav.ptr < 0, None, shard_t)
        if trav16 is not None and config.use_prestep:
            fresh = ((s.trav.ptr == 0) & (s.trav.pend == trav16.FULL)
                     & (s.trav.sp == 0) & (s.mode != F.MODE_DEAD))
            s = s._replace(trav=trav16.prestep16(
                nodes, sd.wide16_top, s.trav_o, s.trav_d,
                safe_rcp(s.trav_d), s.trav, fresh))
        return s

    b = pool
    z3 = jnp.zeros((b, 3), jnp.float32)
    zi = jnp.zeros((b,), jnp.int32)
    zf = jnp.zeros((b,), jnp.float32)
    s0 = F.FusedState(
        mode=jnp.full((b,), F.MODE_DEAD, jnp.int32), trav=init_tr,
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
    return body, s0


def run_one(trav, te, pool=POOL):
    body, s0 = make_setup(trav, te, pool)

    @jax.jit
    def warm(s):
        return jax.lax.fori_loop(0, 40, lambda i, s: body(s), s)

    sw = warm(s0)
    np.asarray(sw.queue_head)

    def loop(s, iters):
        return jax.lax.fori_loop(0, iters, lambda i, s: body(s), s)

    f = jax.jit(loop, static_argnums=(1,))
    out = f(sw, ITERS)
    np.asarray(out.queue_head)          # compile + settle
    t0 = time.perf_counter()
    out = f(sw, ITERS)
    q1 = int(np.asarray(out.queue_head))
    dt = time.perf_counter() - t0
    q0 = int(np.asarray(sw.queue_head))
    rate = (q1 - q0) / dt
    print(f"{trav:7s} te={te:2d} pool={pool>>10:4d}k: {dt/ITERS*1e3:7.2f} ms/iter, "
          f"{(q1-q0)//ITERS:7d} deaths/iter, {rate/1e3:8.1f} ksamples/s",
          flush=True)
    return rate


def main():
    results = {}
    for trav, te, pool in [("wide8", 10, 1 << 18), ("wide8", 10, 1 << 19),
                           ("wide8", 12, 1 << 19), ("wide16", 5, 1 << 18),
                           ("wide16", 7, 1 << 18), ("wide16", 7, 1 << 19),
                           ("wide16", 10, 1 << 18), ("wide8", 10, 1 << 18)]:
        key = f"{trav}/te{te}/p{pool}"
        results[key] = run_one(trav, te, pool)
    best = max(results, key=results.get)
    print(f"\nbest: {best} ({results[best]/1e3:.1f} ksamples/s)")


if __name__ == "__main__":
    main()
