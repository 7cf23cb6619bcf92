"""Hit records and shading preparation.

``HitInfo`` is the batched analogue of the reference's ``RayHit``
(``common.hlsl:173-193``); :func:`shade_prep` interpolates the triangle
attributes by barycentrics and face-forwards the normal
(``bvh.hlsl:201-212``), and :func:`intersect_analytic_lights` adds the
rect-light analytic intersections (``util/intersect.hlsl:29-54``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from unity_webgpu_pathtracer_tpu.utils.math import (
    EPSILON,
    FAR_PLANE,
    cross,
    dot,
    dot1,
    gather_small,
    normalize,
)

INTERSECT_TRIANGLE = 0
INTERSECT_LIGHT = 1


class HitInfo(NamedTuple):
    t: jnp.ndarray            # (B,)
    position: jnp.ndarray     # (B,3)
    normal: jnp.ndarray       # (B,3) interpolated shading normal
    ffnormal: jnp.ndarray     # (B,3) face-forward normal
    tangent: jnp.ndarray      # (B,3)
    uv: jnp.ndarray           # (B,2)
    material: jnp.ndarray     # (B,) int32
    intersect_type: jnp.ndarray  # (B,) int32 (0=triangle, 1=light)
    light_index: jnp.ndarray  # (B,) int32 (valid when intersect_type==1)
    valid: jnp.ndarray        # (B,) bool


def _interp(bary: jnp.ndarray, attr: jnp.ndarray, width: int) -> jnp.ndarray:
    """Barycentric interpolation of an (B, 3*width) packed attribute row."""
    a0 = attr[:, 0 * width : 1 * width]
    a1 = attr[:, 1 * width : 2 * width]
    a2 = attr[:, 2 * width : 3 * width]
    w0 = (1.0 - bary[:, 0] - bary[:, 1])[:, None]
    return a0 * w0 + a1 * bary[:, 0:1] + a2 * bary[:, 1:2]


def instance_normal_to_world(scene, inst, normal):
    """Transform a local normal by the instance's inverse-transpose
    (``tlas.hlsl:223``: ``mul(float4(n,0), worldToLocal)``)."""
    w2l = gather_small(scene.inst_w2l, jnp.maximum(inst, 0))
    n = jnp.stack(
        [
            w2l[:, 0] * normal[:, 0] + w2l[:, 4] * normal[:, 1] + w2l[:, 8] * normal[:, 2],
            w2l[:, 1] * normal[:, 0] + w2l[:, 5] * normal[:, 1] + w2l[:, 9] * normal[:, 2],
            w2l[:, 2] * normal[:, 0] + w2l[:, 6] * normal[:, 1] + w2l[:, 10] * normal[:, 2],
        ],
        axis=-1,
    )
    return jnp.where((inst >= 0)[:, None], normalize(n), normal)


def instance_material_override(scene, inst, material):
    """Instance material wins over the per-triangle index
    (``tlas.hlsl:230``: materialIndex comes from the instance)."""
    override = gather_small(scene.inst_offsets, jnp.maximum(inst, 0))[:, 3]
    use = (inst >= 0) & (override >= 0)
    return jnp.where(use, override, material)


def shade_prep(scene, origins, directions, t, bary, slot, inst=None) -> HitInfo:
    """Gather + interpolate attributes for triangle hits."""
    safe_slot = jnp.maximum(slot, 0)
    attr_row = scene.tri_index[safe_slot]
    normal = normalize(_interp(bary, scene.attr_normals[attr_row], 3))
    tangent = normalize(_interp(bary, scene.attr_tangents[attr_row], 3))
    uv = _interp(bary, scene.attr_uvs[attr_row], 2)
    material = scene.attr_material[attr_row]
    if inst is not None and scene.inst_w2l.shape[0] > 0:
        normal = instance_normal_to_world(scene, inst, normal)
        tangent = instance_normal_to_world(scene, inst, tangent)
        material = instance_material_override(scene, inst, material)
    valid = (slot >= 0) & (t < FAR_PLANE)
    position = origins + t[:, None] * directions
    ffnormal = jnp.where(dot1(normal, directions) <= 0.0, normal, -normal)
    return HitInfo(
        t=t,
        position=position,
        normal=normal,
        ffnormal=ffnormal,
        tangent=tangent,
        uv=uv,
        material=material,
        intersect_type=jnp.zeros_like(slot),
        light_index=jnp.full_like(slot, -1),
        valid=valid,
    )


def intersect_analytic_lights(scene, origins, directions, hit: HitInfo) -> HitInfo:
    """Test rect lights, overriding closer hits (``intersect.hlsl:29-54``).

    Light count is static (= lights table rows); small tables unroll at
    trace time like the reference's in-kernel loop, larger ones run an
    on-device ``fori_loop`` so compile size stays flat in light count.
    """
    import jax

    t = hit.t
    light_idx = hit.light_index
    itype = hit.intersect_type
    normal = hit.normal

    def one(rec, i, t, light_idx, itype, normal):
        is_rect = rec[3] == 3.0  # LIGHT_TYPE_RECTANGLE
        pos, u, v = rec[0:3], rec[8:11], rec[12:15]
        n = normalize(cross(u, v))
        plane_d = jnp.sum(n * pos)
        dt = dot(directions, n)
        tt = (plane_d - dot(origins, n)) / jnp.where(dt == 0.0, 1e-20, dt)
        p = origins + directions * tt[:, None]
        vi = p - pos
        a1 = dot(jnp.broadcast_to(u / jnp.maximum(jnp.sum(u * u), 1e-20), p.shape), vi)
        a2 = dot(jnp.broadcast_to(v / jnp.maximum(jnp.sum(v * v), 1e-20), p.shape), vi)
        hit_rect = (
            is_rect
            & (tt > EPSILON)
            & (a1 >= 0.0) & (a1 <= 1.0)
            & (a2 >= 0.0) & (a2 <= 1.0)
            & (tt < t)
            & (dot(directions, jnp.broadcast_to(n, directions.shape)) < 0.0)
        )
        return (
            jnp.where(hit_rect, tt, t),
            jnp.where(hit_rect, i, light_idx),
            jnp.where(hit_rect, INTERSECT_LIGHT, itype),
            jnp.where(hit_rect[:, None], jnp.broadcast_to(n, normal.shape), normal),
        )

    lcount = scene.lights.shape[0]
    if lcount <= 4:
        for i in range(lcount):
            t, light_idx, itype, normal = one(
                scene.lights[i], i, t, light_idx, itype, normal)
    else:
        t, light_idx, itype, normal = jax.lax.fori_loop(
            0, lcount,
            lambda i, c: one(scene.lights[i], i, *c),
            (t, light_idx, itype, normal))
    position = origins + t[:, None] * directions
    ffnormal = jnp.where(dot1(normal, directions) <= 0.0, normal, -normal)
    return hit._replace(
        t=t,
        position=position,
        normal=normal,
        ffnormal=ffnormal,
        light_index=light_idx,
        intersect_type=itype,
        valid=hit.valid | (itype == INTERSECT_LIGHT),
    )
