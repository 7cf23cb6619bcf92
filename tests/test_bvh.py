"""BVH builder invariants + traversal equivalence against brute force."""

import jax.numpy as jnp
import numpy as np
import pytest

from unity_webgpu_pathtracer_tpu.accel import bvh2 as ubvh2
from unity_webgpu_pathtracer_tpu.accel import mbvh as umbvh
from unity_webgpu_pathtracer_tpu.models import primitives as prim
from unity_webgpu_pathtracer_tpu.models.cornell import cornell_box
from unity_webgpu_pathtracer_tpu.ops import intersect as bf
from unity_webgpu_pathtracer_tpu.ops import traverse_mbvh as trav
from unity_webgpu_pathtracer_tpu.utils.math import FAR_PLANE


def _random_tris(n, seed=0, spread=10.0):
    r = np.random.default_rng(seed)
    base = r.uniform(-spread, spread, (n, 1, 3))
    tri = base + r.normal(0, 0.5, (n, 3, 3))
    return tri.astype(np.float32)


def _scene_from_positions(positions):
    """Minimal SceneData carrying only geometry + BVH."""
    from unity_webgpu_pathtracer_tpu.scene.scene import SceneData
    from unity_webgpu_pathtracer_tpu.scene.envmap import empty_envmap

    bounds, child, order = (
        umbvh.collapse_to_mbvh8(ubvh2.build_bvh2(positions))
    )
    pos = positions[order]
    v0 = pos[:, 0]
    e1 = pos[:, 1] - v0
    e2 = pos[:, 2] - v0
    tris = np.concatenate([e2, e1, v0], -1).astype(np.float32)
    m = positions.shape[0]
    z9 = jnp.zeros((m, 9), jnp.float32)
    return SceneData(
        tris=jnp.asarray(tris),
        tri_index=jnp.asarray(order.astype(np.int32)),
        attr_normals=z9, attr_tangents=z9,
        attr_uvs=jnp.zeros((m, 6), jnp.float32),
        attr_material=jnp.zeros((m,), jnp.int32),
        materials=jnp.zeros((1, 32), jnp.float32),
        texture_data=jnp.zeros((0,), jnp.uint32),
        lights=jnp.zeros((0, 16), jnp.float32),
        env=empty_envmap(),
        bvh_bounds=jnp.asarray(bounds),
        bvh_child=jnp.asarray(child),
    )


@pytest.mark.parametrize("n", [1, 4, 33, 500])
def test_bvh2_invariants(n):
    pos = _random_tris(n, seed=n)
    b = ubvh2.build_bvh2(pos)
    ubvh2.validate_bvh2(b, pos)


@pytest.mark.parametrize("n", [1, 4, 33, 500, 2000])
def test_mbvh_invariants(n):
    pos = _random_tris(n, seed=n + 100)
    b = ubvh2.build_bvh2(pos)
    bounds, child, order = umbvh.collapse_to_mbvh8(b)
    umbvh.validate_mbvh(bounds, child, pos, order)


def _random_rays(n, seed, spread=12.0):
    r = np.random.default_rng(seed)
    o = r.uniform(-spread, spread, (n, 3)).astype(np.float32)
    d = r.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.mark.parametrize("ntri,nray", [(1, 64), (50, 256), (1000, 512)])
def test_traversal_matches_bruteforce(ntri, nray):
    pos = _random_tris(ntri, seed=ntri)
    scene = _scene_from_positions(pos)
    o, d = _random_rays(nray, seed=ntri + 1)

    t_bvh, bary_bvh, slot_bvh, _ = trav.closest_hit(scene, o, d)
    t_bf, bary_bf, slot_bf, _ = bf.closest_hit_bruteforce(scene, o, d)

    np.testing.assert_allclose(np.asarray(t_bvh), np.asarray(t_bf), rtol=1e-4, atol=1e-4)
    hit = np.asarray(t_bf) < FAR_PLANE
    # Same triangle chosen (identical tri order in scene arrays).
    np.testing.assert_array_equal(np.asarray(slot_bvh)[hit], np.asarray(slot_bf)[hit])
    np.testing.assert_allclose(
        np.asarray(bary_bvh)[hit], np.asarray(bary_bf)[hit], rtol=1e-3, atol=1e-4
    )


def test_occlusion_matches_bruteforce():
    pos = _random_tris(300, seed=9)
    scene = _scene_from_positions(pos)
    o, d = _random_rays(512, seed=10)
    t_max = jnp.full((512,), 8.0)
    occ_bvh = np.asarray(trav.occluded(scene, o, d, t_max))
    occ_bf = np.asarray(bf.occluded_bruteforce(scene, o, d, t_max))
    np.testing.assert_array_equal(occ_bvh, occ_bf)


@pytest.mark.slow
def test_cornell_bvh_render_matches_bruteforce():
    """Full-pipeline equivalence: same seeds, bvh vs brute force — identical
    radiance up to float reassociation."""
    from unity_webgpu_pathtracer_tpu.api import Renderer
    from unity_webgpu_pathtracer_tpu.config import RenderConfig
    from unity_webgpu_pathtracer_tpu.render.camera import make_camera_params

    scene, cam = cornell_box()
    kw = dict(width=32, height=32, samples_per_pass=2, max_bounces=3, sky_mode=2)
    params = make_camera_params(width=32, height=32, **cam)

    r_bf = Renderer(scene, RenderConfig(traversal="bruteforce", **kw), params)
    r_bvh = Renderer(scene, RenderConfig(traversal="mbvh", **kw), params)
    r_bf.render(2)
    r_bvh.render(2)
    np.testing.assert_allclose(r_bf.radiance(), r_bvh.radiance(), rtol=1e-3, atol=1e-3)
