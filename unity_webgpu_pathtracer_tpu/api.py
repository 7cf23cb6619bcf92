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
    """One jitted progressive pass: trace + film update."""
    total = render_pass(scene, config, params, film.sample_count)
    total = total.reshape(config.height, config.width, 3)
    return ufilm.accumulate(film, total, config.samples_per_pass)


class Renderer:
    def __init__(self, scene, config: RenderConfig, params: RenderParams):
        if isinstance(scene, Scene):
            scene = scene.build(config.traversal, octants=config.bvh_octants)
        if not isinstance(scene, SceneData):
            raise TypeError("scene must be a Scene or SceneData")
        self.scene = scene
        self.config = config
        self.params = params
        self.film = ufilm.new_film(config.height, config.width)

    def reset(self) -> None:
        """Restart accumulation (``PathTracer.Reset``, PathTracer.cs:318)."""
        self.film = ufilm.reset(self.film)

    def step(self) -> None:
        """Render one progressive pass (``samples_per_pass`` samples/pixel)."""
        if self.config.integrator == "fused":
            from unity_webgpu_pathtracer_tpu.render.fused import (
                fused_pass_and_accumulate,
            )

            self.film = fused_pass_and_accumulate(
                self.scene, self.config, self.params, self.film
            )
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

    @property
    def sample_count(self) -> int:
        return int(self.film.sample_count)

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
