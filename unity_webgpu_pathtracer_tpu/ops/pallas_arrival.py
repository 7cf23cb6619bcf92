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
``arrival_step16`` (modulo FMA-contraction ulp) — verified by
``tests/test_pallas_arrival.py`` in interpret mode (CPU) and compiled
(TPU).  Instanced (TLAS) scenes run the same kernel with the instance-row
extension (``has_inst``): world->local ray transform on instance rows,
local-ray selection for slab/MT, instance exit on pop below the entry
height — mirroring ``traverse_wide16.arrival_step16``'s
``has_instances`` path (reference semantics: ``util/tlas.hlsl:131-135``,
unnormalized local direction so reported t stays world-scaled).
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


def _iota(n):
    return jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)


def _f16_bits_to_f32(bits):
    """Software f16->f32 from int32 arrays holding 16-bit patterns.

    Mosaic rejects 16-bit vreg bitcasts ("Invalid vector register cast"
    for i16->f16), so the decode rebias-assembles f32 bits (a same-width
    i32->f32 bitcast, which it accepts).

    Fast path by BUILDER CONTRACT: every f16 in a node table is either +0
    or a normal finite value — the emitters (native ``f2h``,
    ``accel/wide16._canon_f16``) flush subnormals/-0 to +0 and clamp
    overflow to +-65504 at build time.  That reduces the decode to 7
    integer/fp ops/halfword via the multiply-rebias trick: align the f16
    magnitude+sign into f32 bit positions (exponent off by 2^-112) and
    multiply by 2^112 — a power-of-two scale, exact for every contract
    value, and +0 rides through as 0.0 x 2^112 = +0 with no select (the
    old additive rebias needed a compare+select to keep +0 from becoming
    2^-15).  Bit-exact vs the jnp path's hardware f16 conversion on
    contract tables.
    """
    vb = ((bits & 0x7FFF) << 13) | ((bits & 0x8000) << 16)
    return jax.lax.bitcast_convert_type(vb, jnp.float32) * jnp.float32(2.0 ** 112)


def _arrival_kernel(transpose_in_kernel, has_inst, leaf_slots, *refs):
    if has_inst:
        (rowT_ref, oT_ref, dT_ref, invT_ref, live_ref,
         ptr_ref, pend_ref, sp_ref, t_ref, u_ref, v_ref, tri_ref, found_ref,
         srow_ref, smask_ref, inst_ref, hinst_ref, spent_ref,
         loT_ref, ldT_ref, linvT_ref,
         optr_ref, opend_ref, osp_ref, ot_ref, ou_ref, ov_ref, otri_ref,
         ofound_ref, osrow_ref, osmask_ref, oinst_ref, ohinst_ref,
         ospent_ref, oloT_ref, oldT_ref, olinvT_ref) = refs
    else:
        (rowT_ref, oT_ref, dT_ref, invT_ref, live_ref,
         ptr_ref, pend_ref, sp_ref, t_ref, u_ref, v_ref, tri_ref, found_ref,
         srow_ref, smask_ref,
         optr_ref, opend_ref, osp_ref, ot_ref, ou_ref, ov_ref, otri_ref,
         ofound_ref, osrow_ref, osmask_ref) = refs
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

    o_w = oT_ref[:]                                      # (3, BLK) world
    d_w = dT_ref[:]
    inv_w = invT_ref[:]
    if has_inst:
        # Lanes inside a BLAS subtree trace with their instance-local ray
        # (arrival_step16's in_blas selection).
        inst0 = inst_ref[:]
        lo_l = loT_ref[:]                                # (3, BLK)
        ld_l = ldT_ref[:]
        linv_l = linvT_ref[:]
        in_blas = (inst0 >= 0)[None, :]
        o = jnp.where(in_blas, lo_l, o_w)
        d = jnp.where(in_blas, ld_l, d_w)
        inv = jnp.where(in_blas, linv_l, inv_w)
        is_inst = live & (meta < 0)
    else:
        o, d, inv = o_w, d_w, inv_w

    # ---- inner: decode 16 quantized child boxes, slab-test ----
    eword = rowT_i[4]                                    # (BLK,)
    t_near = jnp.zeros_like(rowT[0:16])                  # (16, BLK)
    t_far = jnp.broadcast_to(t0[None, :], t_near.shape)
    for c in range(3):
        scale_c = jax.lax.bitcast_convert_type(
            ((eword >> (8 * c)) & 0xFF) << 23, jnp.float32)
        # comp-major qbytes in SPLIT order (byte j of word w = slot 4j+w,
        # accel.wide16.PERM_Q): each shift of the whole (4, BLK) word
        # block yields 4 consecutive slots — 4 block concats instead of
        # the old 16 single-row interleaves (12% of the kernel).
        qlo_w = rowT_i[8 + 4 * c : 8 + 4 * c + 4]        # (4, BLK)
        qhi_w = rowT_i[20 + 4 * c : 20 + 4 * c + 4]
        qlo = jnp.concatenate(
            [((qlo_w >> (8 * j)) & 0xFF).astype(jnp.float32)
             for j in range(4)], axis=0)                 # (16, BLK)
        qhi = jnp.concatenate(
            [((qhi_w >> (8 * j)) & 0xFF).astype(jnp.float32)
             for j in range(4)], axis=0)
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
    # SPLIT halfword order (word w = slot w lo | slot w+half hi): the
    # decoded lo/hi (half, BLK) blocks ARE slots 0..half-1 / half..2half-1
    # — one concat per comp instead of the old 16 single-row interleaves.
    # ``leaf_slots`` = 16 for 96-float rows, 8 for 48-float leaf8 rows
    # (half the decode + Möller-Trumbore VPU work per arrival).
    half = leaf_slots // 2
    comp = []
    for c in range(9):
        words = rowT_i[4 + half * c : 4 + half * c + half]  # (half, BLK)
        flo = _f16_bits_to_f32(words & 0xFFFF)
        fhi = _f16_bits_to_f32((words >> 16) & 0xFFFF)
        comp.append(jnp.concatenate([flo, fhi], axis=0))  # (slots, BLK)
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
        is_leaf[None, :] & (_iota(leaf_slots) < meta[None, :])
        & (jnp.abs(a) > DET_EPS)
        & (uu >= 0.0) & (uu <= 1.0)
        & (vv >= 0.0) & (uu + vv <= 1.0)
        & (tt > T_MIN) & (tt < t0[None, :])
    )
    tt = jnp.where(valid, tt, FAR_PLANE)
    attrs = (rowT_i[76:92] if leaf_slots == 16
             else rowT_i[40:48])                         # (slots, BLK)
    best = jnp.argmin(tt, axis=0)
    onehot_b = _iota(leaf_slots) == best[None, :]
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
    if has_inst:
        # Record the instance of the best hit (pre-update inst, as in jnp).
        ohinst_ref[:] = jnp.where(improved, inst0, hinst_ref[:])

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

    if not has_inst:
        new_ptr = jnp.where(found_child, child_ptr,
                            jnp.where(need_pop, pop_ptr, ptr))
        new_pend = jnp.where(found_child, FULL,
                             jnp.where(need_pop,
                                       jnp.where(has, pop_pend, FULL), pend))
        optr_ref[:] = jnp.where(live, new_ptr, ptr)
        opend_ref[:] = jnp.where(live, new_pend, pend)
        osp_ref[:] = jnp.where(live, sp_after, sp)
        return

    # ---- instance rows: enter instance space, jump to the BLAS root ----
    # Same arithmetic order as arrival_step16's w2l application so results
    # stay bit-identical: ((m0*o0 + m1*o1) + m2*o2) + m3.
    inst_id = -meta - 1
    w2l = rowT[4:16]                                     # (12, BLK) floats
    lo3 = [w2l[4 * c + 0] * o_w[0] + w2l[4 * c + 1] * o_w[1]
           + w2l[4 * c + 2] * o_w[2] + w2l[4 * c + 3] for c in range(3)]
    ld3 = [w2l[4 * c + 0] * d_w[0] + w2l[4 * c + 1] * d_w[1]
           + w2l[4 * c + 2] * d_w[2] for c in range(3)]
    lo3 = jnp.concatenate([x[None, :] for x in lo3], axis=0)   # (3, BLK)
    ld3 = jnp.concatenate([x[None, :] for x in ld3], axis=0)
    # utils.math.safe_rcp inlined (zero components nudged to 1e-30).
    ld_nz = jnp.where(ld3 == 0.0, jnp.float32(1.0e-30), ld3)
    linv3 = 1.0 / ld_nz
    e1 = is_inst[None, :]
    oloT_ref[:] = jnp.where(e1, lo3, lo_l)
    oldT_ref[:] = jnp.where(e1, ld3, ld_l)
    olinvT_ref[:] = jnp.where(e1, linv3, linv_l)
    inst_new = jnp.where(is_inst, inst_id, inst0)
    # sp at instance entry (push never coincides with an instance row).
    spent0 = spent_ref[:]
    spent_new = jnp.where(is_inst, sp_pushed, spent0)
    blas_root = rowT_i[16]

    # Popping below the instance-entry height returns the lane to world
    # space (all entries at or above it are BLAS-local).
    exited = need_pop & (inst0 >= 0) & (sp_after < spent_new)
    inst_final = jnp.where(exited | (need_pop & ~has), -1, inst_new)

    new_ptr = jnp.where(
        is_inst, blas_root,
        jnp.where(found_child, child_ptr,
                  jnp.where(need_pop, pop_ptr, ptr)))
    new_pend = jnp.where(
        is_inst | found_child, FULL,
        jnp.where(need_pop, jnp.where(has, pop_pend, FULL), pend))
    optr_ref[:] = jnp.where(live, new_ptr, ptr)
    opend_ref[:] = jnp.where(live, new_pend, pend)
    osp_ref[:] = jnp.where(live, sp_after, sp)
    oinst_ref[:] = jnp.where(live, inst_final, inst0)
    ospent_ref[:] = jnp.where(live, spent_new, spent0)


def arrival_step16_pallas(nodes, oT, dT, invT, s: Wide16State, active=None,
                          interpret: bool = False,
                          transpose_in_kernel: bool = False,
                          has_instances: bool = False) -> Wide16State:
    """Drop-in arrival; ``has_instances`` adds the TLAS instance-row path.

    ``oT``/``dT``/``invT`` are the (3, B) transposes of the ray arrays —
    transpose them ONCE per super-iteration, not per arrival.  The
    instance-local ray registers are carried through the kernel as (3, B)
    planes (transposed per call; XLA assigns the layouts, measured free at
    these shapes).
    """
    b = s.ptr.shape[0]
    blk = BLK
    while b % blk:
        blk //= 2
    assert blk >= MIN_BLK, f"pool {b} has no usable block size"
    depth = s.stack_row.shape[0]
    row_f = nodes.shape[-1]            # 96 classic / 48 leaf8
    leaf_slots = 16 if row_f == 96 else 8
    live = s.ptr >= 0
    if active is not None:
        live = live & active
    idx = jnp.where(live, s.ptr, 0)
    rows_in = nodes[idx] if transpose_in_kernel else nodes[idx].T

    grid = b // blk

    def col(dt=jnp.int32):
        return pl.BlockSpec((blk,), lambda i: (i,), memory_space=pltpu.VMEM)

    def plane(rows):
        return pl.BlockSpec((rows, blk), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    row_spec = (pl.BlockSpec((blk, row_f), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
                if transpose_in_kernel else plane(row_f))

    def cshape(dt=jnp.int32):
        return jax.ShapeDtypeStruct((b,), dt)

    out_shapes = [
        cshape(),             # ptr
        cshape(),             # pend
        cshape(),             # sp
        cshape(jnp.float32),  # t
        cshape(jnp.float32),  # u
        cshape(jnp.float32),  # v
        cshape(),             # tri
        cshape(),             # found (int mask)
        jax.ShapeDtypeStruct((depth, b), jnp.int32),  # stack_row
        jax.ShapeDtypeStruct((depth, b), jnp.int32),  # stack_mask
    ]
    in_specs = ([row_spec, plane(3), plane(3), plane(3), col()]
                + [col()] * 8 + [plane(depth)] * 2)
    out_specs = [col()] * 8 + [plane(depth)] * 2
    ins = [rows_in, oT, dT, invT, live.astype(jnp.int32),
           s.ptr, s.pend, s.sp, s.t, s.u, s.v, s.tri,
           s.found.astype(jnp.int32),
           s.stack_row, s.stack_mask]
    if has_instances:
        in_specs += [col()] * 3 + [plane(3)] * 3
        out_specs += [col()] * 3 + [plane(3)] * 3
        ins += [s.inst, s.hit_inst, s.sp_enter,
                s.local_o.T, s.local_d.T, s.local_inv.T]
        out_shapes += [
            cshape(),   # inst
            cshape(),   # hit_inst
            cshape(),   # sp_enter
            jax.ShapeDtypeStruct((3, b), jnp.float32),  # local_o
            jax.ShapeDtypeStruct((3, b), jnp.float32),  # local_d
            jax.ShapeDtypeStruct((3, b), jnp.float32),  # local_inv
        ]
    import functools

    outs = pl.pallas_call(
        functools.partial(_arrival_kernel, transpose_in_kernel,
                          has_instances, leaf_slots),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(*ins)
    (ptr, pend, sp, t, u, v, tri, found, srow, smask) = outs[:10]
    s = s._replace(ptr=ptr, pend=pend, sp=sp, t=t, u=u, v=v, tri=tri,
                   found=found != 0, stack_row=srow, stack_mask=smask)
    if has_instances:
        inst, hinst, spent, loT, ldT, linvT = outs[10:]
        s = s._replace(inst=inst, hit_inst=hinst, sp_enter=spent,
                       local_o=loT.T, local_d=ldT.T, local_inv=linvT.T)
    return s
