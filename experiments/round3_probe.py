"""Round-3 measurement campaign: decompose the production super-iteration.

Run:  python experiments/round3_probe.py <section>
Sections: super | arr | trans | parts

Timing rules per docs/PERFORMANCE.md ("the axon measurement trap"): ops are
looped ON DEVICE with a data dependency between iterations, warmup uses the
SAME static iteration count, and the clock is read after np.asarray.
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

SECTION = sys.argv[1] if len(sys.argv) > 1 else "all"
POOL = int(os.environ.get("PROBE_POOL", 1 << 18))
TE = int(os.environ.get("PROBE_TE", 10))
TRIS = int(os.environ.get("PROBE_TRIS", 1_000_000))
TRAV = os.environ.get("PROBE_TRAV", "wide8")


def timed(fn, *args, iters=8):
    f = jax.jit(fn, static_argnums=(len(args),))
    t0 = time.perf_counter()
    out = f(*args, iters)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = f(*args, iters)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    per_iter = (time.perf_counter() - t0) / iters
    return per_iter, compile_s


def build():
    from unity_webgpu_pathtracer_tpu.config import SKY_MODE_ENVIRONMENT, RenderConfig
    from unity_webgpu_pathtracer_tpu.models.benchmark import million_triangle_scene
    from unity_webgpu_pathtracer_tpu.render.camera import make_camera_params

    scene, cam = million_triangle_scene(TRIS)
    config = RenderConfig(
        width=1920, height=1080, samples_per_pass=8, max_bounces=5,
        traversal=TRAV, sky_mode=SKY_MODE_ENVIRONMENT, integrator="fused",
        pool_size=POOL, transition_every=TE,
    )
    scene_data = scene.build(TRAV)
    params = make_camera_params(width=1920, height=1080, **cam)
    nd = scene_data.wide16_nodes if TRAV == "wide16" else scene_data.wide8_nodes
    print(f"scene: {TRAV} {nd.shape[0]} rows "
          f"({nd.nbytes/1e6:.0f} MB), pool {POOL}, te {TE}",
          file=sys.stderr)
    return scene_data, config, params


def make_body(scene, config, params):
    """Replicates fused_pass_with_stats' loop body (wide8 path)."""
    from unity_webgpu_pathtracer_tpu.render import fused as F
    from unity_webgpu_pathtracer_tpu.utils.math import safe_rcp

    if TRAV == "wide16":
        from unity_webgpu_pathtracer_tpu.ops import traverse_wide16 as tw8
        nodes8 = scene.wide16_nodes
        tw8.arrival_step8 = tw8.arrival_step16
    else:
        from unity_webgpu_pathtracer_tpu.ops import traverse_wide8 as tw8
        nodes8 = scene.wide8_nodes
    inst = scene.inst_w2l.shape[0] > 0
    budget = config.pixel_count() * config.samples_per_pass

    def arrivals(s, n):
        inv = safe_rcp(s.trav_d)
        shadowing = (s.mode == F.MODE_SHADOW_ENV) | (s.mode == F.MODE_SHADOW_LIGHT)
        trav = s.trav
        for _ in range(n):
            active = (s.mode != F.MODE_DEAD) & ~(shadowing & trav.found)
            trav = tw8.arrival_step8(nodes8, s.trav_o, s.trav_d, inv, trav,
                                     active, has_instances=inst)
        return s._replace(trav=trav), trav.ptr < 0

    def transition(s, trav_done):
        return F._transition(scene, config, params, s, budget,
                             jnp.uint32(0), trav_done, None, None)

    def body(s):
        s, trav_done = arrivals(s, TE)
        return transition(s, trav_done)

    return body, arrivals, transition


def init_state(scene, config, params, warm_iters=40):
    from unity_webgpu_pathtracer_tpu.render import fused as F

    b = POOL
    z3 = jnp.zeros((b, 3), jnp.float32)
    zi = jnp.zeros((b,), jnp.int32)
    zf = jnp.zeros((b,), jnp.float32)
    if TRAV == "wide16":
        from unity_webgpu_pathtracer_tpu.ops import traverse_wide16 as tw
        trav0 = tw.init_state16(b, jnp.float32(0.0), ptr0=tw.DONE,
                                 depth=scene.stack_levels.shape[0])
    else:
        from unity_webgpu_pathtracer_tpu.ops import traverse_wide8 as tw
        trav0 = tw.init_state8(b, jnp.float32(0.0), ptr0=tw.DONE,
                                depth=scene.stack_levels.shape[0])
    init = F.FusedState(
        mode=jnp.full((b,), F.MODE_DEAD, jnp.int32), trav=trav0,
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
    body, _, _ = make_body(scene, config, params)

    @jax.jit
    def warm(s):
        return jax.lax.fori_loop(0, warm_iters, lambda i, s: body(s), s)

    s = warm(init)
    np.asarray(s.queue_head)
    print(f"warm state: queue_head={int(s.queue_head)} "
          f"live={int(np.sum(np.asarray(s.mode) != 3))}", file=sys.stderr)
    return s


def main():
    scene, config, params = build()
    body, arrivals, transition = make_body(scene, config, params)
    s0 = init_state(scene, config, params)

    if SECTION in ("super", "all"):
        def loop(s, iters):
            return jax.lax.fori_loop(0, iters, lambda i, s: body(s), s)
        ms, cs = timed(loop, s0, iters=8)
        print(f"super-iteration ({TE} arrivals + transition): "
              f"{ms*1e3:7.2f} ms  (compile {cs:.0f}s)")

    if SECTION in ("arr", "all"):
        def loop(s, iters):
            def one(i, s):
                s2, _ = arrivals(s, 1)
                return s2
            return jax.lax.fori_loop(0, iters, one, s)
        ms, cs = timed(loop, s0, iters=32)
        print(f"single arrival step:                        "
              f"{ms*1e3:7.2f} ms  (compile {cs:.0f}s)")

    if SECTION in ("trans", "all"):
        def loop(s, iters):
            def one(i, s):
                trav_done = s.trav.ptr < 0
                return transition(s, trav_done)
            return jax.lax.fori_loop(0, iters, one, s)
        ms, cs = timed(loop, s0, iters=16)
        print(f"transition step:                            "
              f"{ms*1e3:7.2f} ms  (compile {cs:.0f}s)")

    if SECTION in ("parts", "all"):
        parts(scene, config, params, s0)


def parts(scene, config, params, s0):
    from unity_webgpu_pathtracer_tpu.render import bsdf as ubsdf
    from unity_webgpu_pathtracer_tpu.render import camera as ucamera
    from unity_webgpu_pathtracer_tpu.render.fused import _interp
    from unity_webgpu_pathtracer_tpu.scene.envmap import sample_env_transition
    from unity_webgpu_pathtracer_tpu.scene.material import derive_material
    from unity_webgpu_pathtracer_tpu.utils import rng as urng
    from unity_webgpu_pathtracer_tpu.utils.math import gather_small, normalize

    b = POOL
    key = np.random.default_rng(0)
    tri = jnp.asarray(key.integers(0, scene.attr_shade.shape[0], b, dtype=np.int32))
    bary = jnp.asarray(key.random((b, 2), np.float32) * 0.5)
    d = jnp.asarray(normalize(key.random((b, 3), np.float32) - 0.5))

    # attr_shade gather (the unified hit-frame fetch)
    def attr_loop(tri, iters):
        def one(i, tri):
            row = scene.attr_shade[tri]
            return (tri + jax.lax.bitcast_convert_type(row[:, 15], jnp.int32) % 97) \
                % scene.attr_shade.shape[0]
        return jax.lax.fori_loop(0, iters, one, tri)
    ms, _ = timed(attr_loop, tri, iters=16)
    print(f"attr_shade gather ({scene.attr_shade.nbytes/1e6:.0f} MB, "
          f"{scene.attr_shade.shape[1]} cols): {ms*1e3:6.2f} ms")

    # interp + derive_material (includes texture fetches if any)
    row0 = scene.attr_shade[tri]
    def derive_loop(bary, iters):
        def one(i, bary):
            normal = normalize(_interp(bary, row0[:, 0:9], 3))
            uv = _interp(bary, row0[:, 9:15], 2)
            mat_idx = jax.lax.bitcast_convert_type(row0[:, 15], jnp.int32)
            mdata = gather_small(scene.materials, jnp.maximum(mat_idx, 0))
            mat = derive_material(mdata, uv, d, normal, scene.texture_data,
                                  config.has_textures)
            return bary + mat.roughness[:, None] * 1e-12
        return jax.lax.fori_loop(0, iters, one, bary)
    ms, _ = timed(derive_loop, bary, iters=16)
    print(f"interp+derive_material:            {ms*1e3:6.2f} ms")

    # env alias transition gather
    rng0 = jnp.asarray(key.integers(0, 2**31, b).astype(np.uint32))
    want = jnp.asarray(key.random(b) < 0.5)
    def env_loop(rng, iters):
        def one(i, rng):
            out = sample_env_transition(scene.env, jnp.float32(0.0), d, want, rng)
            return out[5] + jax.lax.bitcast_convert_type(out[1], jnp.uint32) % 7
        return jax.lax.fori_loop(0, iters, one, rng)
    ms, _ = timed(env_loop, rng0, iters=16)
    print(f"sample_env_transition:             {ms*1e3:6.2f} ms")

    # eval + sample brdf
    mdata = gather_small(scene.materials, jnp.zeros((b,), jnp.int32))
    normal = d
    uv = bary
    mat = derive_material(mdata, uv, d, normal, scene.texture_data,
                          config.has_textures)
    def brdf_loop(rng, iters):
        def one(i, rng):
            f_u, p_u = ubsdf.eval_brdf(mat, -d, normal, d)
            f_s, l_s, p_s, rng = ubsdf.sample_brdf(mat, -d, normal, rng)
            return rng + (p_u > 0) + (p_s > 0)
        return jax.lax.fori_loop(0, iters, one, rng)
    ms, _ = timed(brdf_loop, rng0, iters=16)
    print(f"eval_brdf + sample_brdf:           {ms*1e3:6.2f} ms")

    # regeneration block
    def regen_loop(rng, iters):
        def one(i, rng):
            pixel = rng % np.uint32(config.pixel_count())
            rngn = urng.seed(pixel, rng, params.seed_root)
            coords, rngn = ucamera.jittered_pixel_coords(pixel, config, rngn)
            o, dd, rngn = ucamera.get_screen_ray(coords, config, params, rngn)
            return rngn + jax.lax.bitcast_convert_type(o[:, 0], jnp.uint32) % 5
        return jax.lax.fori_loop(0, iters, one, rng)
    ms, _ = timed(regen_loop, rng0, iters=16)
    print(f"regen (seed+jitter+screen ray):    {ms*1e3:6.2f} ms")

    # film scatter-add
    film0 = jnp.zeros((config.pixel_count(), 3), jnp.float32)
    pix = jnp.asarray(key.integers(0, config.pixel_count(), b, dtype=np.int32))
    rad = jnp.asarray(key.random((b, 3), np.float32))
    def splat_loop(film, iters):
        def one(i, film):
            return film.at[pix].add(rad + film[0, 0] * 1e-20)
        return jax.lax.fori_loop(0, iters, one, film)
    ms, _ = timed(splat_loop, film0, iters=16)
    print(f"film scatter-add:                  {ms*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
