"""Decompose arrival_step16 cost: gather / inner(slab+push) / leaf(MT).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/round3_arrival.py
"""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B = 1 << 18


def timed(fn, *args, iters=16):
    f = jax.jit(fn, static_argnums=(len(args),))
    t0 = time.perf_counter()
    out = f(*args, iters)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = f(*args, iters)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters, compile_s


def main():
    from unity_webgpu_pathtracer_tpu.models.benchmark import million_triangle_scene
    from unity_webgpu_pathtracer_tpu.ops import traverse_wide8 as tw8
    from unity_webgpu_pathtracer_tpu.ops import traverse_wide16 as tw16
    from unity_webgpu_pathtracer_tpu.utils.math import FAR_PLANE, safe_rcp

    scene, cam = million_triangle_scene(1_000_000)
    sd8 = scene.build("wide8")
    sd16 = scene.build("wide16")
    n8, n16 = sd8.wide8_nodes, sd16.wide16_nodes
    print(f"wide8 {n8.shape} {n8.nbytes/1e6:.0f}MB | "
          f"wide16 {n16.shape} {n16.nbytes/1e6:.0f}MB")

    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.uniform(-20, 20, (B, 3)).astype(np.float32))
    d = rng.normal(size=(B, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    inv = safe_rcp(d)

    # full arrival step, looped with state carry
    for name, tw, nodes, init in (
        ("wide8 ", tw8, n8, tw8.init_state8(B, jnp.float32(FAR_PLANE))),
        ("wide16", tw16, n16, tw16.init_state16(B, jnp.float32(FAR_PLANE))),
    ):
        step = tw.arrival_step8 if name == "wide8 " else tw.arrival_step16

        def loop(s, iters):
            def body(i, s):
                s2 = step(nodes, o, d, inv, s, None, has_instances=False)
                # restart finished lanes at the root (keeps work realistic)
                return s2._replace(ptr=jnp.where(s2.ptr < 0, 0, s2.ptr))
            return jax.lax.fori_loop(0, iters, body, s)

        ms, cs = timed(loop, init, iters=32)
        print(f"{name} full arrival: {ms*1e3:7.2f} ms  (compile {cs:.0f}s)")

    # gather-only at matched widths
    for name, nodes in (("gather48", n8), ("gather96", n16)):
        N = nodes.shape[0]
        idx0 = jnp.asarray((rng.integers(0, N, B)).astype(np.int32))

        def gloop(idx, iters):
            def body(i, idx):
                row = nodes[idx]
                return (idx + jax.lax.bitcast_convert_type(
                    row[:, 0], jnp.int32) % 97) % N
            return jax.lax.fori_loop(0, iters, body, idx0)

        ms, _ = timed(gloop, idx0, iters=32)
        print(f"{name}: {ms*1e3:7.2f} ms")

    # decode-only micro-stages on a pre-gathered row block
    idx = jnp.asarray(rng.integers(0, n16.shape[0], B).astype(np.int32))
    row = n16[idx]
    t0 = jnp.full((B,), jnp.float32(FAR_PLANE))

    def slab16(row, iters):
        def body(i, carry):
            row_, acc = carry
            anchor = row_[:, 0:3]
            eword = jax.lax.bitcast_convert_type(row_[:, 4], jnp.int32)
            scale = jnp.stack([
                jax.lax.bitcast_convert_type(
                    (((eword >> (8 * c)) & 0xFF) << 23), jnp.float32)
                for c in range(3)], axis=-1)
            qbytes = jax.lax.bitcast_convert_type(
                row_[:, 8:32], jnp.uint8).reshape(B, 96).astype(jnp.float32)
            t_near = jnp.zeros((B, 16), jnp.float32)
            t_far = jnp.broadcast_to(t0[:, None], (B, 16))
            for c in range(3):
                qlo = qbytes[:, 16 * c : 16 * c + 16]
                qhi = qbytes[:, 48 + 16 * c : 64 + 16 * c]
                lo = anchor[:, c : c + 1] + qlo * scale[:, c : c + 1]
                hi = anchor[:, c : c + 1] + qhi * scale[:, c : c + 1]
                tl = (lo - o[:, c : c + 1]) * inv[:, c : c + 1]
                th = (hi - o[:, c : c + 1]) * inv[:, c : c + 1]
                t_near = jnp.maximum(t_near, jnp.minimum(tl, th))
                t_far = jnp.minimum(t_far, jnp.maximum(tl, th))
            hit = t_near <= t_far
            tn = jnp.where(hit, t_near, jnp.float32(jnp.inf))
            first = jnp.argmin(tn, axis=1).astype(jnp.int32)
            acc = acc + first[:, None]
            row_ = row_ + (acc[:, :1] % 2).astype(jnp.float32) * 0.0
            return row_, acc
        return jax.lax.fori_loop(0, iters, body, (row, jnp.zeros((B, 1), jnp.int32)))

    ms, _ = timed(slab16, row, iters=32)
    print(f"slab16 decode+test+argmin: {ms*1e3:7.2f} ms")

    def mt16(row, iters):
        def body(i, carry):
            row_, acc = carry
            anchor = row_[:, 0:3]
            halves = jax.lax.bitcast_convert_type(
                row_[:, 4:76], jnp.float16).reshape(B, 144).astype(jnp.float32)
            comp = [halves[:, 16 * c : 16 * c + 16] for c in range(9)]
            e2x, e2y, e2z = comp[0], comp[1], comp[2]
            e1x, e1y, e1z = comp[3], comp[4], comp[5]
            v0x = comp[6] + anchor[:, 0:1]
            v0y = comp[7] + anchor[:, 1:2]
            v0z = comp[8] + anchor[:, 2:3]
            dx, dy, dz = d[:, 0:1], d[:, 1:2], d[:, 2:3]
            ox, oy, oz = o[:, 0:1], o[:, 1:2], o[:, 2:3]
            rx = dy * e2z - dz * e2y
            ry = dz * e2x - dx * e2z
            rz = dx * e2y - dy * e2x
            a = e1x * rx + e1y * ry + e1z * rz
            finv = 1.0 / jnp.where(jnp.abs(a) < 1e-9, 1.0, a)
            sx, sy, sz = ox - v0x, oy - v0y, oz - v0z
            uu = finv * (sx * rx + sy * ry + sz * rz)
            qx = sy * e1z - sz * e1y
            qy = sz * e1x - sx * e1z
            qz = sx * e1y - sy * e1x
            vv = finv * (dx * qx + dy * qy + dz * qz)
            tt = finv * (e2x * qx + e2y * qy + e2z * qz)
            ok = (uu >= 0) & (vv >= 0) & (uu + vv <= 1) & (tt > 0)
            tt = jnp.where(ok, tt, jnp.float32(np.inf))
            best = jnp.argmin(tt, axis=1)
            acc = acc + best[:, None].astype(jnp.int32)
            row_ = row_ + (acc[:, :1] % 2).astype(jnp.float32) * 0.0
            return row_, acc
        return jax.lax.fori_loop(0, iters, body, (row, jnp.zeros((B, 1), jnp.int32)))

    ms, _ = timed(mt16, row, iters=32)
    print(f"mt16 decode+intersect+argmin: {ms*1e3:7.2f} ms")

    # stack push/pop plumbing on (D,B) planes
    from unity_webgpu_pathtracer_tpu.accel.wide16 import MAX_DEPTH

    sp0 = jnp.zeros((B,), jnp.int32)
    st0 = jnp.zeros((MAX_DEPTH, B), jnp.int32)

    def stackops(sp, iters):
        levels = jnp.arange(MAX_DEPTH, dtype=jnp.int32)[:, None]

        def body(i, carry):
            sp_, sr, sm = carry
            push = (sp_ + i) % 3 == 0
            at_top = (levels == sp_[None, :]) & push[None, :]
            sr = jnp.where(at_top, i, sr)
            sm = jnp.where(at_top, i + 1, sm)
            sp2 = sp_ + push.astype(jnp.int32)
            at_pop = levels == (sp2 - 1)[None, :]
            top_row = jnp.sum(jnp.where(at_pop, sr, 0), axis=0)
            top_mask = jnp.sum(jnp.where(at_pop, sm, 0), axis=0)
            sp3 = jnp.maximum(sp2 - ((top_row + top_mask) % 2), 0)
            return sp3, sr, sm
        return jax.lax.fori_loop(0, iters, body, (sp, st0, st0))

    ms, _ = timed(stackops, sp0, iters=32)
    print(f"stack push+pop planes:       {ms*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
