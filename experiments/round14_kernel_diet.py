"""Cost anatomy INSIDE the Pallas arrival kernel (wide16).

The round-4 trace prices the 8 arrival bodies at 0.212 ms each at
B=98304 (2.2 ns/lane) — 34% of the super-iteration.  This probe times
the kernel on-device (fori_loop, np.asarray before the clock) with
sections stubbed out, bounding what each would buy if optimized:

* full          — production kernel
* no_leaf       — leaf f16 decode + Möller-Trumbore replaced by zeros
                  (bounds the win of a cheaper leaf-geometry encoding)
* no_inner      — child-box byte decode + slab test replaced by zeros
* no_stack      — stack select chains dropped (depth loop)

Stubs keep ALL memory traffic (same row loads, same outputs) so the
delta is pure VPU work.  Not a correctness build — results are garbage;
only the clock matters.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/round14_kernel_diet.py
Env: B (default 98304), ITERS (default 50), DEPTH (default 11).
"""

import functools
import os
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

from unity_webgpu_pathtracer_tpu.ops import pallas_arrival as pa  # noqa: E402
from unity_webgpu_pathtracer_tpu.ops.traverse_wide16 import DONE, FULL  # noqa: E402
from unity_webgpu_pathtracer_tpu.ops.intersect import DET_EPS, T_MIN  # noqa: E402
from unity_webgpu_pathtracer_tpu.utils.math import FAR_PLANE  # noqa: E402

B = int(os.environ.get("B", 98304))
ITERS = int(os.environ.get("ITERS", 50))
DEPTH = int(os.environ.get("DEPTH", 11))
N_ROWS = 4096


def make_kernel(mode):
    """A stripped copy of pa._arrival_kernel (no-instance path) with
    stubbable sections."""

    def kernel(rowT_ref, oT_ref, dT_ref, invT_ref, live_ref,
               ptr_ref, pend_ref, sp_ref, t_ref, u_ref, v_ref, tri_ref,
               found_ref, srow_ref, smask_ref,
               optr_ref, opend_ref, osp_ref, ot_ref, ou_ref, ov_ref,
               otri_ref, ofound_ref, osrow_ref, osmask_ref):
        depth = srow_ref.shape[0]
        rowT = rowT_ref[:]
        rowT_i = pa._i32(rowT)
        live = live_ref[:] != 0
        ptr = ptr_ref[:]
        pend = pend_ref[:]
        sp = sp_ref[:]
        t0 = t_ref[:]
        meta = jnp.where(live, rowT_i[3], 0)
        is_leaf = live & (meta > 0)
        is_inner = live & (meta == 0)
        o, d, inv = oT_ref[:], dT_ref[:], invT_ref[:]

        if mode != "no_inner":
            eword = rowT_i[4]
            t_near = jnp.zeros_like(rowT[0:16])
            t_far = jnp.broadcast_to(t0[None, :], t_near.shape)
            for c in range(3):
                scale_c = jax.lax.bitcast_convert_type(
                    ((eword >> (8 * c)) & 0xFF) << 23, jnp.float32)
                qlo_w = rowT_i[8 + 4 * c: 8 + 4 * c + 4]
                qhi_w = rowT_i[20 + 4 * c: 20 + 4 * c + 4]
                qlo = jnp.concatenate(
                    [((qlo_w[w: w + 1] >> (8 * j)) & 0xFF).astype(jnp.float32)
                     for w in range(4) for j in range(4)], axis=0)
                qhi = jnp.concatenate(
                    [((qhi_w[w: w + 1] >> (8 * j)) & 0xFF).astype(jnp.float32)
                     for w in range(4) for j in range(4)], axis=0)
                lo = rowT[c][None, :] + qlo * scale_c[None, :]
                hi = rowT[c][None, :] + qhi * scale_c[None, :]
                tl = (lo - o[c][None, :]) * inv[c][None, :]
                th = (hi - o[c][None, :]) * inv[c][None, :]
                t_near = jnp.maximum(t_near, jnp.minimum(tl, th))
                t_far = jnp.minimum(t_far, jnp.maximum(tl, th))
        else:
            t_near = jnp.zeros_like(rowT[0:16]) + rowT[0][None, :]
            t_far = jnp.broadcast_to(t0[None, :], t_near.shape)

        ptrs = rowT_i[32:48]
        pbits = (pend[None, :] >> pa._iota16()) & 1
        hit = (t_near <= t_far) & (ptrs >= 0) & (pbits > 0)
        inf = jnp.float32(jnp.inf)
        tn = jnp.where(hit, t_near, inf)
        tn_min = jnp.min(tn, axis=0)
        first_slot = jnp.argmin(tn, axis=0).astype(jnp.int32)
        found_child = is_inner & (tn_min < inf)
        onehot_first = pa._iota16() == first_slot[None, :]
        bits16 = jnp.int32(1) << pa._iota16()
        child_ptr = jnp.sum(jnp.where(onehot_first, ptrs, 0), axis=0)
        rembits = hit & ~onehot_first
        remaining = jnp.sum(jnp.where(rembits, bits16, 0), axis=0)
        one_left = jnp.sum(rembits.astype(jnp.int32), axis=0) == 1
        direct_ptr = jnp.sum(jnp.where(rembits, ptrs, 0), axis=0)
        push = found_child & (remaining > 0)
        entry_row = jnp.where(one_left, direct_ptr, ptr)
        entry_mask = jnp.where(one_left, 0, remaining)

        if mode == "leaf_bf16":
            # bf16-style decode: lo halfword = (w << 16) bitcast, hi =
            # (w & 0xFFFF0000) bitcast — 2 ops/halfword-pair vs ~17 for
            # the f16 multiply-rebias.  Slot order via the same
            # interleave (so this isolates the DECODE saving).
            comp = []
            for c in range(9):
                words = rowT_i[4 + 8 * c: 12 + 8 * c]
                flo = jax.lax.bitcast_convert_type(
                    words << 16, jnp.float32)
                fhi = jax.lax.bitcast_convert_type(
                    words & jnp.int32(-65536), jnp.float32)
                rows = []
                for w in range(8):
                    rows.append(flo[w: w + 1])
                    rows.append(fhi[w: w + 1])
                comp.append(jnp.concatenate(rows, axis=0))
        elif mode == "leaf_noint":
            # f16 decode kept, but slots assembled as [all-lo | all-hi]
            # (two (8, BLK) concats instead of 16 (1, BLK) rows) — wrong
            # slot ORDER (garbage results), same ALU: isolates the
            # interleave cost a lo/hi-split storage format would remove.
            comp = []
            for c in range(9):
                words = rowT_i[4 + 8 * c: 12 + 8 * c]
                flo = pa._f16_bits_to_f32(words & 0xFFFF)
                fhi = pa._f16_bits_to_f32((words >> 16) & 0xFFFF)
                comp.append(jnp.concatenate([flo, fhi], axis=0))
        elif mode != "no_leaf":
            comp = []
            for c in range(9):
                words = rowT_i[4 + 8 * c: 12 + 8 * c]
                flo = pa._f16_bits_to_f32(words & 0xFFFF)
                fhi = pa._f16_bits_to_f32((words >> 16) & 0xFFFF)
                rows = []
                for w in range(8):
                    rows.append(flo[w: w + 1])
                    rows.append(fhi[w: w + 1])
                comp.append(jnp.concatenate(rows, axis=0))
        if mode != "no_leaf":
            e2x, e2y, e2z, e1x, e1y, e1z, v0x, v0y, v0z = comp
            v0x = v0x + rowT[0][None, :]
            v0y = v0y + rowT[1][None, :]
            v0z = v0z + rowT[2][None, :]
            dx, dy, dz = d[0][None, :], d[1][None, :], d[2][None, :]
            ox_, oy_, oz_ = o[0][None, :], o[1][None, :], o[2][None, :]
            rx = dy * e2z - dz * e2y
            ry = dz * e2x - dx * e2z
            rz = dx * e2y - dy * e2x
            a = e1x * rx + e1y * ry + e1z * rz
            finv = 1.0 / jnp.where(jnp.abs(a) < DET_EPS, 1.0, a)
            sx, sy, sz = ox_ - v0x, oy_ - v0y, oz_ - v0z
            uu = finv * (sx * rx + sy * ry + sz * rz)
            qx = sy * e1z - sz * e1y
            qy = sz * e1x - sx * e1z
            qz = sx * e1y - sy * e1x
            vv = finv * (dx * qx + dy * qy + dz * qz)
            tt = finv * (e2x * qx + e2y * qy + e2z * qz)
            valid = (
                is_leaf[None, :] & (pa._iota16() < meta[None, :])
                & (jnp.abs(a) > DET_EPS)
                & (uu >= 0.0) & (uu <= 1.0)
                & (vv >= 0.0) & (uu + vv <= 1.0)
                & (tt > T_MIN) & (tt < t0[None, :])
            )
            tt = jnp.where(valid, tt, FAR_PLANE)
        else:
            uu = vv = jnp.zeros_like(t_near)
            tt = jnp.full_like(t_near, FAR_PLANE) + rowT[5][None, :]

        attrs = rowT_i[76:92]
        best = jnp.argmin(tt, axis=0)
        onehot_b = pa._iota16() == best[None, :]
        t_cand = jnp.sum(jnp.where(onehot_b, tt, 0.0), axis=0)
        improved = t_cand < t0
        ot_ref[:] = jnp.where(improved, t_cand, t0)
        ou_ref[:] = jnp.where(
            improved, jnp.sum(jnp.where(onehot_b, uu, 0.0), axis=0), u_ref[:])
        ov_ref[:] = jnp.where(
            improved, jnp.sum(jnp.where(onehot_b, vv, 0.0), axis=0), v_ref[:])
        otri_ref[:] = jnp.where(
            improved, jnp.sum(jnp.where(onehot_b, attrs, 0), axis=0),
            tri_ref[:])
        ofound_ref[:] = ((found_ref[:] != 0).astype(jnp.int32)
                         | improved.astype(jnp.int32))

        need_pop = (is_inner & ~found_child) | is_leaf
        sp_pushed = sp + push.astype(jnp.int32)
        if mode != "no_stack":
            top_row = jnp.zeros_like(ptr)
            top_mask = jnp.zeros_like(ptr)
            spp_m1 = sp_pushed - 1
            for lev in range(depth):
                at_push = (sp == lev) & push
                new_row = jnp.where(at_push, entry_row, srow_ref[lev])
                new_mask = jnp.where(at_push, entry_mask, smask_ref[lev])
                osrow_ref[lev] = new_row
                osmask_ref[lev] = new_mask
                at_pop = spp_m1 == lev
                top_row = jnp.where(at_pop, new_row, top_row)
                top_mask = jnp.where(at_pop, new_mask, top_mask)
        else:
            osrow_ref[...] = srow_ref[...]
            osmask_ref[...] = smask_ref[...]
            top_row = entry_row
            top_mask = entry_mask
        has = sp_pushed > 0
        pop_ptr = jnp.where(has, top_row, DONE)
        pop_pend = jnp.where(top_mask == 0, FULL, top_mask)
        sp_after = jnp.where(need_pop & has, sp_pushed - 1, sp_pushed)
        new_ptr = jnp.where(found_child, child_ptr,
                            jnp.where(need_pop, pop_ptr, ptr))
        new_pend = jnp.where(found_child, FULL,
                             jnp.where(need_pop,
                                       jnp.where(has, pop_pend, FULL), pend))
        optr_ref[:] = jnp.where(live, new_ptr, ptr)
        opend_ref[:] = jnp.where(live, new_pend, pend)
        osp_ref[:] = jnp.where(live, sp_after, sp)

    return kernel


def run(mode):
    blk = pa.BLK
    while B % blk:
        blk //= 2
    grid = B // blk

    def col():
        return pl.BlockSpec((blk,), lambda i: (i,), memory_space=pltpu.VMEM)

    def plane(rows):
        return pl.BlockSpec((rows, blk), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    def cshape(dt=jnp.int32):
        return jax.ShapeDtypeStruct((B,), dt)

    out_shapes = [cshape(), cshape(), cshape(), cshape(jnp.float32),
                  cshape(jnp.float32), cshape(jnp.float32), cshape(),
                  cshape(),
                  jax.ShapeDtypeStruct((DEPTH, B), jnp.int32),
                  jax.ShapeDtypeStruct((DEPTH, B), jnp.int32)]
    in_specs = ([plane(96), plane(3), plane(3), plane(3), col()]
                + [col()] * 8 + [plane(DEPTH)] * 2)
    out_specs = [col()] * 8 + [plane(DEPTH)] * 2
    kernel = make_kernel(mode)
    call = pl.pallas_call(kernel, grid=(grid,), in_specs=in_specs,
                          out_specs=out_specs, out_shape=out_shapes)

    rng = np.random.default_rng(0)
    rowsT = jnp.asarray(rng.normal(size=(96, B)).astype(np.float32))
    vec3 = jnp.asarray(rng.normal(size=(3, B)).astype(np.float32))
    live = jnp.ones((B,), jnp.int32)
    zi = jnp.zeros((B,), jnp.int32)
    zf = jnp.full((B,), 1e5, jnp.float32)
    stacks = jnp.zeros((DEPTH, B), jnp.int32)

    CHAIN = 8  # kernel calls per loop iteration: amortizes the ~1 ms/iter
               # axon fori_loop floor that drowned the first probe version

    @jax.jit
    def loop(rowsT, vec3):
        def body(i, carry):
            t, u, v = carry
            for _ in range(CHAIN):
                outs = call(rowsT, vec3, vec3, vec3, live, zi,
                            jnp.full((B,), FULL, jnp.int32), zi, t, u, v,
                            zi, zi, stacks, stacks)
                t, u, v = outs[3], outs[4], outs[5]
            return t, u, v
        return jax.lax.fori_loop(0, ITERS, body,
                                 (zf, jnp.zeros_like(zf), jnp.zeros_like(zf)))

    out = loop(rowsT, vec3)
    _ = np.asarray(out[0])
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = loop(rowsT, vec3)
        _ = np.asarray(out[0])
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    per = best / (ITERS * CHAIN)
    print(f"{mode:10s}: {per * 1e3:7.3f} ms/call  "
          f"({per / B * 1e9:5.2f} ns/lane)", flush=True)
    return per


def main():
    print(f"B={B} ITERS={ITERS} DEPTH={DEPTH}")
    full = run("full")
    run("full")  # repeat for variance feel
    for m in ("no_leaf", "no_inner", "no_stack"):
        p = run(m)
        print(f"  -> {m} saves {(full - p) * 1e3:6.3f} ms "
              f"({(full - p) / full * 100:4.1f}%)", flush=True)


if __name__ == "__main__":
    main()
