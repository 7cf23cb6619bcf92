"""Energy-conservation (furnace) tests, quadrature-anchored.

A sphere is convex: under a constant-radiance white environment every
camera ray that hits it scatters AT MOST ONCE before escaping to the
environment, so the pixel value equals the material's *directional albedo*
rho(V·n) times the environment radiance — computable independently by
lat-long quadrature of ``eval_brdf`` (which already includes |L·n|).  The
renders (full integrator: NEE + MIS + BSDF sampling + RR) are compared
against that prediction per pixel, which bounds every material class to a
quadrature-justified band instead of a hand-waved interval.

Glass transmits into the sphere (multiple interfaces), so the convex
argument fails there; glass gets (a) a direct quadrature check that the
lobe itself conserves energy and (b) a bounded furnace render.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from unity_webgpu_pathtracer_tpu.api import Renderer
from unity_webgpu_pathtracer_tpu.config import SKY_MODE_ENVIRONMENT, RenderConfig
from unity_webgpu_pathtracer_tpu.models import primitives as prim
from unity_webgpu_pathtracer_tpu.render.bsdf import eval_brdf
from unity_webgpu_pathtracer_tpu.render.camera import make_camera_params
from unity_webgpu_pathtracer_tpu.scene.material import MaterialDesc, derive_material, pack_materials
from unity_webgpu_pathtracer_tpu.scene.scene import Scene

SIZE = 48
EYE_Z = 3.0
FOV = 45.0


def _material(desc: MaterialDesc, mu, n_dirs):
    """Batched runtime Material for view angle cos(theta)=mu (B rows)."""
    b = n_dirs
    mdata = jnp.broadcast_to(jnp.asarray(pack_materials([desc])), (b, 32))
    n = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (b, 3))
    s = float(np.sqrt(max(1.0 - mu * mu, 0.0)))
    view = jnp.broadcast_to(jnp.asarray([s, 0.0, float(mu)]), (b, 3))
    ray_dir = -view
    uv = jnp.zeros((b, 2))
    return derive_material(mdata, uv, ray_dir, n), view, n


def directional_albedo(desc: MaterialDesc, mu, n_theta=96, n_phi=192):
    """rho(V) = ∫ f(V,L) dω over the FULL sphere (midpoint rule; f from
    eval_brdf already carries |L·n|).  Returns the RGB-mean albedo."""
    theta = (np.arange(n_theta) + 0.5) / n_theta * np.pi
    phi = (np.arange(n_phi) + 0.5) / n_phi * 2.0 * np.pi
    tt, pp = np.meshgrid(theta, phi, indexing="ij")
    l = np.stack([np.sin(tt) * np.cos(pp), np.sin(tt) * np.sin(pp),
                  np.cos(tt)], axis=-1).reshape(-1, 3).astype(np.float32)
    w = (np.sin(tt) * (np.pi / n_theta) * (2.0 * np.pi / n_phi)).reshape(-1)
    mat, view, n = _material(desc, mu, l.shape[0])
    f, _pdf = eval_brdf(mat, view, n, jnp.asarray(l))
    f = np.asarray(f).mean(axis=-1)          # RGB mean (gray materials)
    return float((f * w).sum())


def _albedo_curve(desc: MaterialDesc, n_mu=17):
    mus = np.linspace(0.03, 1.0, n_mu)
    return mus, np.array([directional_albedo(desc, m) for m in mus])


def _render_sphere(desc: MaterialDesc, spp=64, bounces=8):
    scene = Scene()
    m = scene.add_material(desc)
    scene.add_mesh(prim.uv_sphere(radius=1.0, stacks=24, slices=48, material_index=m))
    config = RenderConfig(
        width=SIZE, height=SIZE, samples_per_pass=spp, max_bounces=bounces,
        traversal="bruteforce", sky_mode=SKY_MODE_ENVIRONMENT,
        use_russian_roulette=True,
    )
    params = make_camera_params(
        eye=(0, 0, EYE_Z), target=(0, 0, 0), fov_y_deg=FOV, width=SIZE,
        height=SIZE,
        environment_color=np.array([1.0, 1.0, 1.0], np.float32),
        environment_intensity=np.float32(1.0),
    )
    r = Renderer(scene, config, params)
    r.render(1)
    return np.asarray(r.radiance())


def _predicted_image(mus, rhos):
    """Per-pixel prediction: trace pixel-center rays at the real camera
    geometry, intersect the unit sphere, look up rho(V·n); miss = 1.0."""
    img = np.ones((SIZE, SIZE), np.float32)
    inside = np.zeros((SIZE, SIZE), bool)
    tan_h = np.tan(np.radians(FOV) / 2.0)
    for y in range(SIZE):
        for x in range(SIZE):
            ndc_x = (2.0 * (x + 0.5) / SIZE - 1.0) * tan_h
            ndc_y = (1.0 - 2.0 * (y + 0.5) / SIZE) * tan_h
            d = np.array([ndc_x, ndc_y, -1.0])
            d /= np.linalg.norm(d)
            o = np.array([0.0, 0.0, EYE_Z])
            bq = np.dot(o, d)
            cq = np.dot(o, o) - 1.0
            disc = bq * bq - cq
            if disc <= 0:
                continue
            t = -bq - np.sqrt(disc)
            n = o + t * d
            n /= np.linalg.norm(n)
            mu = float(np.dot(-d, n))
            img[y, x] = np.interp(mu, mus, rhos)
            inside[y, x] = True
    return img, inside


def _erode(mask, it=2):
    m = mask.copy()
    for _ in range(it):
        m = m & np.roll(m, 1, 0) & np.roll(m, -1, 0) & np.roll(m, 1, 1) & np.roll(m, -1, 1)
    return m


MATERIALS = {
    "diffuse_rough": MaterialDesc(base_color=(1, 1, 1, 1), roughness=1.0),
    "diffuse_smooth": MaterialDesc(base_color=(1, 1, 1, 1), roughness=0.3),
    "metal": MaterialDesc(base_color=(1, 1, 1, 1), metallic=1.0, roughness=0.3),
    "clearcoat_diffuse": MaterialDesc(base_color=(1, 1, 1, 1), roughness=0.8,
                                      clearcoat=1.0, clearcoat_gloss=0.5),
    "gray_diffuse": MaterialDesc(base_color=(0.5, 0.5, 0.5, 1), roughness=1.0),
}


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(MATERIALS))
def test_furnace_matches_quadrature(name):
    """Render == quadrature-predicted directional albedo, per pixel, for
    every reflective material class (convex sphere => single scatter)."""
    desc = MATERIALS[name]
    mus, rhos = _albedo_curve(desc)
    # Note: the Disney/Burley diffuse retro-reflection term legitimately
    # gains energy at grazing (rho(0.03) ~ 1.5 by quadrature — the
    # reference implements the same formulas); the per-pixel prediction
    # below *includes* that gain, which is exactly why it can bound the
    # render to 5% where a flat [lo, hi] band needed 17%.
    img = _render_sphere(desc)
    assert np.isfinite(img).all()
    mean_img = img.mean(axis=-1)
    pred, inside = _predicted_image(mus, rhos)
    # Background (eroded: silhouette pixels mix sphere via the AA jitter)
    # must be exactly the environment.
    bg = _erode(~inside, 3)
    assert mean_img[bg].mean() == pytest.approx(1.0, abs=1e-3)
    core = _erode(inside, 3)   # drop the AA/jitter silhouette band
    err = abs(mean_img[core].mean() - pred[core].mean()) / pred[core].mean()
    assert err < 0.05, (name, mean_img[core].mean(), pred[core].mean())
    # Per-pixel agreement within MC noise: 95th percentile of |diff|.
    d = np.abs(mean_img - pred)[core]
    assert np.quantile(d, 0.95) < 0.12, (name, np.quantile(d, 0.95))


@pytest.mark.slow
def test_furnace_glass_energy():
    """Glass: (a) the BSDF lobe conserves energy at every angle by
    quadrature; (b) the furnace render of a glass sphere stays within an
    energy-conserving band (multi-interface paths forbid the exact
    single-scatter prediction)."""
    desc = MaterialDesc(base_color=(1, 1, 1, 1), roughness=0.1, ior=1.5,
                        transmission=1.0)
    mus, rhos = _albedo_curve(desc)
    # No energy creation at any angle.  (The single-interface transmission
    # integral carries the eta^2 radiance-compression factor, so it is NOT
    # near 1 — entering rays read ~0.47-0.68; the inverse factor on exit
    # restores it, which the multi-interface render below verifies.)
    assert rhos.max() < 1.05, f"glass albedo {rhos.max():.3f}"
    img = _render_sphere(desc, spp=64, bounces=12)
    assert np.isfinite(img).all()
    m = img.mean()
    assert 0.90 < m < 1.08, m
    # Background exact.
    assert img[:4, :4].mean() == pytest.approx(1.0, abs=1e-3)


@pytest.mark.slow
def test_gray_furnace_absorbs():
    """albedo-0.5 sphere: render must sit at the quadrature prediction,
    well below the environment (no energy creation)."""
    desc = MATERIALS["gray_diffuse"]
    mus, rhos = _albedo_curve(desc)
    img = _render_sphere(desc)
    mean_img = img.mean(axis=-1)
    pred, inside = _predicted_image(mus, rhos)
    core = _erode(inside, 3)
    err = abs(mean_img[core].mean() - pred[core].mean()) / pred[core].mean()
    assert err < 0.05, (mean_img[core].mean(), pred[core].mean())
    assert img.max() < 1.35
