"""wide8 (8-wide quantized stack) traversal: build invariants + equivalence.

The quantized leaf triangles are float16 offsets from per-leaf anchors, so
hits can shift by ~extent/2048 relative to the exact records; equivalence
vs brute force is therefore statistical (>= 99.5% identical hit ids, tiny
t error on matching hits) rather than bitwise."""

import numpy as np
import jax.numpy as jnp
import pytest

from unity_webgpu_pathtracer_tpu.accel.wide8 import (
    build_scene_wide8,
    build_tlas_wide8,
    validate_wide8,
)
from unity_webgpu_pathtracer_tpu.ops import traverse_wide8 as tw8
from unity_webgpu_pathtracer_tpu.ops.intersect import closest_hit_bruteforce
from unity_webgpu_pathtracer_tpu.utils.math import FAR_PLANE


def random_tris(n, seed=0, spread=5.0, size=0.4):
    rng = np.random.default_rng(seed)
    c = rng.uniform(-spread, spread, (n, 1, 3))
    tris = (c + rng.uniform(-size, size, (n, 3, 3))).astype(np.float32)
    return tris


def recs_of(tris):
    v0, v1, v2 = tris[:, 0], tris[:, 1], tris[:, 2]
    return np.concatenate([v2 - v0, v1 - v0, v0], axis=1).astype(np.float32)


class FakeScene:
    def __init__(self, tris):
        recs = recs_of(tris)
        self.w8 = build_scene_wide8(tris, recs)
        # Leaf rows index by BVH-order position; mirror Scene.build's
        # permutation of the flat arrays.
        self.wide8_nodes = jnp.asarray(self.w8.nodes)
        self.tris = jnp.asarray(recs[self.w8.order])
        self.tri_index = jnp.arange(tris.shape[0], dtype=jnp.int32)
        self.inst_w2l = jnp.zeros((0, 12), jnp.float32)


def random_rays(b, seed=1, spread=8.0, tris=None):
    """Half free rays, half aimed at triangle centroids (hit coverage)."""
    rng = np.random.default_rng(seed)
    o = rng.uniform(-spread, spread, (b, 3)).astype(np.float32)
    d = rng.normal(size=(b, 3)).astype(np.float32)
    if tris is not None:
        cent = tris.mean(axis=1)
        pick = cent[rng.integers(0, cent.shape[0], b)]
        jit = rng.normal(size=(b, 3)).astype(np.float32) * 0.05
        aim = pick + jit - o
        d[: b // 2] = aim[: b // 2]
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.mark.parametrize("n", [12, 300, 4000])
def test_wide8_build_valid(n):
    tris = random_tris(n, seed=n)
    w = build_scene_wide8(tris, recs_of(tris))
    validate_wide8(w, n)


@pytest.mark.parametrize("n,thresh", [(12, 0.99), (300, 0.995), (4000, 0.995)])
def test_wide8_matches_bruteforce(n, thresh):
    tris = random_tris(n, seed=n + 7)
    scene = FakeScene(tris)
    o, d = random_rays(512, seed=n, tris=tris)
    t8, bary8, slot8, _ = tw8.closest_hit(scene, o, d)
    tb, baryb, slotb, _ = closest_hit_bruteforce(scene, o, d)
    hit8 = np.asarray(slot8) >= 0
    hitb = np.asarray(slotb) >= 0
    # Same hit/miss classification and triangle for virtually all rays.
    # f16-quantized geometry flips grazing hits (error amplified by 1/det);
    # the sparse 12-tri scene has pathologically large leaf extents, hence
    # the looser bound there.
    same = (hit8 == hitb) & (
        ~hitb | (np.asarray(slot8) == np.asarray(scene.tri_index)[np.asarray(slotb)])
    )
    assert same.mean() >= thresh, f"only {same.mean():.4f} agree"
    both = hit8 & hitb & same
    assert both.any(), "ray set never hits the scene"
    terr = np.abs(np.asarray(t8)[both] - np.asarray(tb)[both])
    rel = terr / np.maximum(np.asarray(tb)[both], 1e-3)
    assert np.quantile(rel, 0.99) < 5e-3


def test_wide8_occluded_matches():
    tris = random_tris(800, seed=3)
    scene = FakeScene(tris)
    o, d = random_rays(512, seed=4, tris=tris)
    tb, _, slotb, _ = closest_hit_bruteforce(scene, o, d)
    occ = np.asarray(tw8.occluded(scene, o, d, jnp.float32(FAR_PLANE)))
    hitb = np.asarray(slotb) >= 0
    assert (occ == hitb).mean() >= 0.995


def test_wide8_tlas_instancing():
    """Two instanced meshes, one transformed — vs brute force over the
    world-space union."""
    base = random_tris(200, seed=9, spread=1.0, size=0.3)
    recs = recs_of(base)
    w8 = build_scene_wide8(base, recs)
    p = base.reshape(-1, 3)
    bounds = (p.min(0), p.max(0))

    t1 = np.eye(4, dtype=np.float32)
    t2 = np.eye(4, dtype=np.float32)
    t2[:3, 3] = (3.0, 0.5, -1.0)
    t2[0, 0] = 2.0  # non-uniform scale exercises the unnormalized-dir trick
    nodes, l2w, w2l, _layout = build_tlas_wide8(
        [w8, w8][:1] * 1, [bounds], [(0, t1, None), (0, t2, None)], [0])

    class S:
        wide8_nodes = jnp.asarray(nodes.nodes)
        inst_w2l = jnp.asarray(w2l)

    # Brute-force world-space union over the BVH-permuted mesh (instances
    # index attributes by per-mesh BVH position).
    base = base[w8.order]
    world2 = base @ t2[:3, :3].T + t2[:3, 3]
    all_tris = np.concatenate([base, world2.astype(np.float32)])

    class SB:
        tris = jnp.asarray(recs_of(all_tris))
        tri_index = jnp.arange(all_tris.shape[0], dtype=jnp.int32)

    o, d = random_rays(512, seed=11, spread=4.0, tris=all_tris)
    t8, _, slot8, inst8 = tw8.closest_hit(S, o, d)
    tb, _, slotb, _ = closest_hit_bruteforce(SB, o, d)
    hit8 = np.asarray(slot8) >= 0
    hitb = np.asarray(slotb) >= 0
    assert (hit8 == hitb).mean() >= 0.99
    both = hit8 & hitb
    # attr row = brute slot % 200 (instances share the mesh attr rows)
    assert (
        np.asarray(slot8)[both] == (np.asarray(slotb)[both] % 200)
    ).mean() >= 0.99
    rel = np.abs(np.asarray(t8)[both] - np.asarray(tb)[both]) / np.maximum(
        np.asarray(tb)[both], 1e-3)
    assert np.quantile(rel, 0.98) < 5e-3
    # instance ids recorded for hits
    assert set(np.unique(np.asarray(inst8)[both])) <= {0, 1}
