"""Pallas arrival step for the 16-wide quantized BVH (TPU).

The XLA lowering of :func:`ops.traverse_wide16.arrival_step16` spends ~0.5
ms on the row gather but ~4 ms on everything after it: the u8/f16 decodes,
slab tests, Möller-Trumbore and stack plumbing shatter into ~20 small
kernels per arrival whose (B, 96)/(B, 144) intermediates and relayouts
dominate the render loop (round-4 xprof: arrivals are ~28 of the 43 ms
super-iteration, while the fused transition's elementwise code is only
~1.2 ms).  This runs the entire post-gather arrival as ONE ``pallas_call``:

* Rows arrive TRANSPOSED as ``(96, B)``: every node field becomes a
  contiguous sublane-row slice (``rowT[32:48]`` IS the (16, B) child-ptr
  block) — no strided per-column extracts, and every temp tiles as
  (16, BLK) with zero lane padding.
* Ray origin/direction/inverse arrive as ``(3, B)`` packs transposed ONCE
  per super-iteration (not per arrival).
* Integer-bearing words are bitcast to int32 as whole blocks and decoded
  with shifts/masks (the TPU flushes denormal f32 in scalar/small-vector
  paths — docs/PERFORMANCE.md).
* Masks travel as int32 (bool block IO is unreliable on Mosaic).
* The per-lane register stack's (D, B) planes are updated with D-step
  unrolled select chains.

Correctness contract: bit-identical state evolution to
``arrival_step16(..., has_instances=False)`` — verified by
``tests/test_pallas_arrival.py`` in interpret mode (CPU) and compiled
(TPU).  Instanced (TLAS) scenes keep the jnp path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from unity_webgpu_pathtracer_tpu.ops.intersect import DET_EPS, T_MIN
from unity_webgpu_pathtracer_tpu.ops.traverse_wide16 import DONE, FULL, Wide16State
from unity_webgpu_pathtracer_tpu.utils.math import FAR_PLANE

BLK = 2048      # upper bound; the call picks the largest power-of-two divisor
MIN_BLK = 256   # floor; callers (render/fused.py) gate on pool % MIN_BLK


def _i32(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def _iota16():
    return jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)


def _f16_bits_to_f32(bits):
    """Software f16->f32 from int32 arrays holding 16-bit patterns.

    Mosaic rejects 16-bit vreg bitcasts ("Invalid vector register cast"
    for i16->f16), so the decode rebias-assembles f32 bits (a same-width
    i32->f32 bitcast, which it accepts).  Subnormal f16 inputs (quantized
    near-zero leaf coordinates) take the exact m * 2^-24 path; e=31
    (inf/nan, emitted by the builders when a leaf coordinate overflows
    65504) maps to f32 inf/nan so oversized scenes miss on this path
    exactly like the jnp path's hardware f16 bitcast.
    """
    s = (bits >> 15) & 1
    e = (bits >> 10) & 0x1F
    m = bits & 0x3FF
    exp32 = jnp.where(e == 0x1F, 255, e + 112)
    normal = jax.lax.bitcast_convert_type(
        (s << 31) | (exp32 << 23) | (m << 13), jnp.float32)
    sub = m.astype(jnp.float32) * jnp.float32(2.0 ** -24)
    sub = jnp.where(s > 0, -sub, sub)
    return jnp.where(e == 0, sub, normal)


def _arrival_kernel(
    transpose_in_kernel,
    rowT_ref, oT_ref, dT_ref, invT_ref, live_ref,
    ptr_ref, pend_ref, sp_ref, t_ref, u_ref, v_ref, tri_ref, found_ref,
    srow_ref, smask_ref,
    optr_ref, opend_ref, osp_ref, ot_ref, ou_ref, ov_ref, otri_ref,
    ofound_ref, osrow_ref, osmask_ref,
):
    depth = srow_ref.shape[0]
    # Rows normally arrive pre-transposed (96, BLK): XLA's fused
    # gather+transpose (~2.8 ms/arrival) measured FASTER than Mosaic's
    # in-kernel block transpose (11.7 vs 8.0 s/pass) — keep the host-side
    # .T; the (BLK, 96) mode remains for experiments.
    rows_in = rowT_ref[:]
    rowT = rows_in.T if transpose_in_kernel else rows_in  # (96, BLK)
    rowT_i = _i32(rowT)                                  # bit-safe int view
    live = live_ref[:] != 0
    ptr = ptr_ref[:]
    pend = pend_ref[:]
    sp = sp_ref[:]
    t0 = t_ref[:]
    meta = jnp.where(live, rowT_i[3], 0)
    is_leaf = live & (meta > 0)
    is_inner = live & (meta == 0)

    o = oT_ref[:]                                        # (3, BLK)
    d = dT_ref[:]
    inv = invT_ref[:]

    # ---- inner: decode 16 quantized child boxes, slab-test ----
    eword = rowT_i[4]                                    # (BLK,)
    t_near = jnp.zeros_like(rowT[0:16])                  # (16, BLK)
    t_far = jnp.broadcast_to(t0[None, :], t_near.shape)
    for c in range(3):
        scale_c = jax.lax.bitcast_convert_type(
            ((eword >> (8 * c)) & 0xFF) << 23, jnp.float32)
        # comp-major qbytes: axis c's qlo lives in words [8+4c, 8+4c+4),
        # qhi in [20+4c, ...); little-endian byte j of word w is slot 4w+j.
        qlo_w = rowT_i[8 + 4 * c : 8 + 4 * c + 4]        # (4, BLK)
        qhi_w = rowT_i[20 + 4 * c : 20 + 4 * c + 4]
        qlo = jnp.concatenate(
            [((qlo_w[w : w + 1] >> (8 * j)) & 0xFF).astype(jnp.float32)
             for w in range(4) for j in range(4)], axis=0)   # (16, BLK)
        qhi = jnp.concatenate(
            [((qhi_w[w : w + 1] >> (8 * j)) & 0xFF).astype(jnp.float32)
             for w in range(4) for j in range(4)], axis=0)
        lo = rowT[c][None, :] + qlo * scale_c[None, :]
        hi = rowT[c][None, :] + qhi * scale_c[None, :]
        tl = (lo - o[c][None, :]) * inv[c][None, :]
        th = (hi - o[c][None, :]) * inv[c][None, :]
        t_near = jnp.maximum(t_near, jnp.minimum(tl, th))
        t_far = jnp.minimum(t_far, jnp.maximum(tl, th))

    ptrs = rowT_i[32:48]                                 # (16, BLK)
    pbits = (pend[None, :] >> _iota16()) & 1
    hit = (t_near <= t_far) & (ptrs >= 0) & (pbits > 0)

    inf = jnp.float32(jnp.inf)
    tn = jnp.where(hit, t_near, inf)
    tn_min = jnp.min(tn, axis=0)                         # (BLK,)
    first_slot = jnp.argmin(tn, axis=0).astype(jnp.int32)
    found_child = is_inner & (tn_min < inf)

    onehot_first = _iota16() == first_slot[None, :]
    bits16 = jnp.int32(1) << _iota16()
    child_ptr = jnp.sum(jnp.where(onehot_first, ptrs, 0), axis=0)
    rembits = hit & ~onehot_first
    remaining = jnp.sum(jnp.where(rembits, bits16, 0), axis=0)
    one_left = jnp.sum(rembits.astype(jnp.int32), axis=0) == 1
    direct_ptr = jnp.sum(jnp.where(rembits, ptrs, 0), axis=0)
    push = found_child & (remaining > 0)
    entry_row = jnp.where(one_left, direct_ptr, ptr)
    entry_mask = jnp.where(one_left, 0, remaining)

    # ---- leaf: f16 anchored triangles, Möller-Trumbore ----
    comp = []
    for c in range(9):
        words = rowT_i[4 + 8 * c : 12 + 8 * c]           # (8, BLK)
        flo = _f16_bits_to_f32(words & 0xFFFF)
        fhi = _f16_bits_to_f32((words >> 16) & 0xFFFF)
        rows = []
        for w in range(8):                  # slot 2w = lo half, 2w+1 = hi
            rows.append(flo[w : w + 1])
            rows.append(fhi[w : w + 1])
        comp.append(jnp.concatenate(rows, axis=0))       # (16, BLK)
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
        is_leaf[None, :] & (_iota16() < meta[None, :])
        & (jnp.abs(a) > DET_EPS)
        & (uu >= 0.0) & (uu <= 1.0)
        & (vv >= 0.0) & (uu + vv <= 1.0)
        & (tt > T_MIN) & (tt < t0[None, :])
    )
    tt = jnp.where(valid, tt, FAR_PLANE)
    attrs = rowT_i[76:92]                                # (16, BLK)
    best = jnp.argmin(tt, axis=0)
    onehot_b = _iota16() == best[None, :]
    t_cand = jnp.sum(jnp.where(onehot_b, tt, 0.0), axis=0)
    improved = t_cand < t0
    ot_ref[:] = jnp.where(improved, t_cand, t0)
    ou_ref[:] = jnp.where(
        improved, jnp.sum(jnp.where(onehot_b, uu, 0.0), axis=0), u_ref[:])
    ov_ref[:] = jnp.where(
        improved, jnp.sum(jnp.where(onehot_b, vv, 0.0), axis=0), v_ref[:])
    otri_ref[:] = jnp.where(
        improved, jnp.sum(jnp.where(onehot_b, attrs, 0), axis=0), tri_ref[:])
    ofound_ref[:] = (found_ref[:] != 0).astype(jnp.int32) | improved.astype(jnp.int32)

    # ---- stack push + pop (select chains over the D planes) ----
    # A pushing lane never pops in the same arrival (push ⇒ found_child ⇒
    # not need_pop), so reading the post-push planes for the pop matches
    # the jnp path exactly.
    need_pop = (is_inner & ~found_child) | is_leaf
    sp_pushed = sp + push.astype(jnp.int32)
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


def arrival_step16_pallas(nodes, oT, dT, invT, s: Wide16State, active=None,
                          interpret: bool = False,
                          transpose_in_kernel: bool = False) -> Wide16State:
    """Drop-in arrival for no-instance scenes.

    ``oT``/``dT``/``invT`` are the (3, B) transposes of the ray arrays —
    transpose them ONCE per super-iteration, not per arrival.
    """
    b = s.ptr.shape[0]
    blk = BLK
    while b % blk:
        blk //= 2
    assert blk >= MIN_BLK, f"pool {b} has no usable block size"
    depth = s.stack_row.shape[0]
    live = s.ptr >= 0
    if active is not None:
        live = live & active
    idx = jnp.where(live, s.ptr, 0)
    rows_in = nodes[idx] if transpose_in_kernel else nodes[idx].T

    grid = b // blk

    def col():
        return pl.BlockSpec((blk,), lambda i: (i,), memory_space=pltpu.VMEM)

    def plane(rows):
        return pl.BlockSpec((rows, blk), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    row_spec = (pl.BlockSpec((blk, 96), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
                if transpose_in_kernel else plane(96))

    out_shapes = [
        jax.ShapeDtypeStruct((b,), jnp.int32),    # ptr
        jax.ShapeDtypeStruct((b,), jnp.int32),    # pend
        jax.ShapeDtypeStruct((b,), jnp.int32),    # sp
        jax.ShapeDtypeStruct((b,), jnp.float32),  # t
        jax.ShapeDtypeStruct((b,), jnp.float32),  # u
        jax.ShapeDtypeStruct((b,), jnp.float32),  # v
        jax.ShapeDtypeStruct((b,), jnp.int32),    # tri
        jax.ShapeDtypeStruct((b,), jnp.int32),    # found (int mask)
        jax.ShapeDtypeStruct((depth, b), jnp.int32),  # stack_row
        jax.ShapeDtypeStruct((depth, b), jnp.int32),  # stack_mask
    ]
    import functools

    outs = pl.pallas_call(
        functools.partial(_arrival_kernel, transpose_in_kernel),
        grid=(grid,),
        in_specs=[row_spec, plane(3), plane(3), plane(3), col()]
        + [col()] * 8 + [plane(depth)] * 2,
        out_specs=[col()] * 8 + [plane(depth)] * 2,
        out_shape=out_shapes,
        interpret=interpret,
    )(
        rows_in, oT, dT, invT, live.astype(jnp.int32),
        s.ptr, s.pend, s.sp, s.t, s.u, s.v, s.tri,
        s.found.astype(jnp.int32),
        s.stack_row, s.stack_mask,
    )
    (ptr, pend, sp, t, u, v, tri, found, srow, smask) = outs
    return s._replace(ptr=ptr, pend=pend, sp=sp, t=t, u=u, v=v, tri=tri,
                      found=found != 0, stack_row=srow, stack_mask=smask)
