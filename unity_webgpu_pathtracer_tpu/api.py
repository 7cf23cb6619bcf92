"""High-level progressive renderer.

The API analogue of the reference's ``PathTracer`` MonoBehaviour
(``Assets/Scripts/PathTracer.cs``): owns film state, the jitted pass
function, and the presentation chain.

Example::

    scene, cam = cornell_box()
    r = Renderer(scene, RenderConfig(width=256, height=256, traversal="mbvh"),
                 make_camera_params(width=256, height=256, **cam))
    r.render(passes=64)
    image = r.image()          # display-ready uint8 (top-down)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from unity_webgpu_pathtracer_tpu.config import PostParams, RenderConfig, RenderParams
from unity_webgpu_pathtracer_tpu.post.tonemap import present
from unity_webgpu_pathtracer_tpu.render import film as ufilm
from unity_webgpu_pathtracer_tpu.render.integrator import render_pass
from unity_webgpu_pathtracer_tpu.scene.scene import Scene, SceneData


@functools.partial(jax.jit, static_argnums=(1,))
def _pass_and_accumulate(scene, config, params, film):
    """One jitted progressive pass: trace + film update.

    ``jnp.max`` collapses a per-pixel sample count (temporal reprojection
    leaves one behind) to a scalar pass base for RNG stream indexing —
    sample seeds only need uniqueness per (pixel, sample index)."""
    total = render_pass(scene, config, params, jnp.max(film.sample_count))
    total = total.reshape(config.height, config.width, 3)
    return ufilm.accumulate(film, total, config.samples_per_pass)


class Renderer:
    def __init__(self, scene, config: RenderConfig, params: RenderParams,
                 compile_cache: bool = True):
        if compile_cache:
            # Warm starts in seconds instead of a cold XLA compile — the
            # analogue of Unity's on-disk shader cache.  GLOBAL side
            # effect: sets jax_compilation_cache_dir process-wide, so an
            # embedding app's unrelated jit compiles are cached too — but
            # an already-configured cache dir is respected, never
            # redirected.  Idempotent; UWPT_CACHE=0 disables globally,
            # compile_cache=False per renderer for embedders that manage
            # jax config themselves.
            from unity_webgpu_pathtracer_tpu.compile_cache import (
                enable_compile_cache,
            )

            enable_compile_cache()
        self._host_scene = scene if isinstance(scene, Scene) else None
        if isinstance(scene, Scene):
            scene = scene.build(config.traversal, octants=config.bvh_octants)
        if not isinstance(scene, SceneData):
            raise TypeError("scene must be a Scene or SceneData")
        self.scene = scene
        self.config = config
        self.params = params
        self.film = ufilm.new_film(config.height, config.width)
        # Last-pass runtime stats (fused integrator only; device scalars —
        # host-read lazily so step() stays fully async).
        self.last_occupancy = None
        self.last_rays = None

    # -- dynamic-scene APIs (each invalidates accumulation like the
    #    reference's dirty-tracking: PathTracer.cs:169-180, 463-471) --

    def _require_host_scene(self) -> Scene:
        if self._host_scene is None:
            raise ValueError("renderer was constructed from SceneData; "
                             "dynamic updates need the host Scene")
        return self._host_scene

    def _rebuild(self) -> None:
        self.scene = self._host_scene.build(
            self.config.traversal, octants=self.config.bvh_octants
        )
        self.reset()

    def update_instance_transform(self, instance_id: int, transform) -> None:
        """Move an instance; TLAS-only refresh + accumulation reset
        (``BVHScene.UpdateTLAS`` -> ``Reset``, PathTracer.cs:169-170).

        On the wide8/wide16 backends only the fixed-capacity TLAS rows are
        re-emitted and device-updated in place — cost independent of BLAS
        size, like the reference's small per-frame TLAS upload
        (``BVHScene.cs:823-838``). Other backends fall back to a full
        rebuild."""
        host = self._require_host_scene()
        host.set_instance_transform(instance_id, transform)
        fmt = self.config.traversal
        if (fmt in ("wide8", "wide16")
                and getattr(host, f"_tlas{fmt[4:]}_layout", None) is not None):
            from unity_webgpu_pathtracer_tpu.scene.scene import rebuild_tlas_rows

            rows, l2w, w2l = rebuild_tlas_rows(host, fmt)
            field = f"{fmt}_nodes"
            nodes = getattr(self.scene, field)
            self.scene = self.scene._replace(
                inst_l2w=jnp.asarray(l2w),
                inst_w2l=jnp.asarray(w2l),
                **{field: nodes.at[: rows.shape[0]].set(jnp.asarray(rows))},
            )
            self.reset()
            return
        self._rebuild()

    def update_material(self, material_id: int, desc) -> None:
        """Edit a material (``PathTracer.UpdateMaterialData``, :474)."""
        scene = self._require_host_scene()
        scene.materials[material_id] = desc
        from unity_webgpu_pathtracer_tpu.scene.material import pack_materials

        self.scene = self.scene._replace(
            materials=jnp.asarray(pack_materials(scene.materials))
        )
        self.reset()

    def update_lights(self, lights) -> None:
        """Replace the light table (``PathTracer.UpdateLights``, :367).

        Changing the light *count* changes array shapes (a recompile, like
        the reference's HAS_LIGHTS keyword toggle); same-count edits are a
        cheap buffer upload."""
        scene = self._require_host_scene()
        scene.lights = list(lights)
        from unity_webgpu_pathtracer_tpu.scene.lights import pack_lights
        import numpy as _np

        table = pack_lights(scene.lights) if scene.lights else _np.zeros((0, 16), _np.float32)
        self.scene = self.scene._replace(lights=jnp.asarray(table))
        self.reset()

    def update_camera(self, params: RenderParams, reproject: bool = False,
                      max_history: int | None = None) -> None:
        """New camera/uniforms; resets accumulation (PathTracer.cs:211-222).

        With ``reproject=True`` the accumulated history is warped through
        the camera move instead (BASELINE.md milestone 5's "temporal
        reprojection"): surviving pixels keep their converged radiance
        with a per-pixel sample count, disoccluded pixels restart.
        ``max_history`` bounds the carried count (TAA-style history clamp)."""
        if reproject:
            from unity_webgpu_pathtracer_tpu.render.reproject import (
                reproject_film,
            )

            self.film = reproject_film(self.scene, self.config, self.film,
                                       self.params, params,
                                       max_history=max_history)
            self.params = params
            return
        self.params = params
        self.reset()

    def reset(self) -> None:
        """Restart accumulation (``PathTracer.Reset``, PathTracer.cs:318)."""
        self.film = ufilm.reset(self.film)

    def step(self) -> None:
        """Render one progressive pass (``samples_per_pass`` samples/pixel)."""
        if self.config.integrator == "fused":
            from unity_webgpu_pathtracer_tpu.render.fused import (
                fused_pass_and_accumulate,
            )

            self.film, self.last_occupancy, rays, _arr = fused_pass_and_accumulate(
                self.scene, self.config, self.params, self.film
            )
            self.last_rays = rays  # device scalar; host-read lazily by stats()
        elif self.config.integrator == "wavefront":
            from unity_webgpu_pathtracer_tpu.render.wavefront import (
                wavefront_pass_and_accumulate,
            )

            self.film = wavefront_pass_and_accumulate(
                self.scene, self.config, self.params, self.film
            )
        else:
            self.film = _pass_and_accumulate(self.scene, self.config, self.params, self.film)

    def render(self, passes: int = 1):
        for _ in range(passes):
            self.step()
        self.film.accum.block_until_ready()
        return self.film

    def stats(self) -> dict:
        """Last-pass runtime stats (fused integrator): lane-pool occupancy
        and rays traced (closest + shadow).  Host-reads the device scalars;
        ``{}`` before the first fused pass.  The viewer's live stats panel
        is the Graphy analogue (``GraphyManager.cs:32``)."""
        if self.last_rays is None:
            return {}
        return {"occupancy": float(jnp.asarray(self.last_occupancy)),
                "rays": int(jnp.asarray(self.last_rays))}

    @property
    def sample_count(self) -> int:
        # Per-pixel after a reprojection; report the max (= pass count).
        return int(jnp.max(self.film.sample_count))

    def radiance(self) -> np.ndarray:
        """Linear mean radiance (H, W, 3), row 0 = bottom."""
        return np.asarray(self.film.accum)

    def image(self, post: PostParams = PostParams()) -> np.ndarray:
        """Display-ready uint8 (H, W, 3), row 0 = top (image convention)."""
        out = present(self.film.accum, post)
        return np.asarray((jnp.clip(out, 0, 1) * 255 + 0.5).astype(jnp.uint8))[::-1]

    def save_png(self, path: str, post: PostParams = PostParams()) -> None:
        from unity_webgpu_pathtracer_tpu.utils.image import write_png

        write_png(path, self.image(post))

    def save_checkpoint(self, path: str) -> None:
        ufilm.save(path, self.film)

    def load_checkpoint(self, path: str) -> None:
        self.film = ufilm.load(path)
