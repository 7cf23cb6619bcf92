"""Round-18: compile the Pallas transition kernel on the real TPU.

Minimal shapes (one 2048-lane block), dummy operands — this is purely a
Mosaic lowering check (the radiometric contract is tests/ + the bench A/B).
Run with JAX_TRACEBACK_FILTERING=off to locate lowering failures.
"""

import os
import sys

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from unity_webgpu_pathtracer_tpu.ops.pallas_transition import (
    transition_step16_pallas,
)

B = 2048


def main():
    print("backend:", jax.default_backend(), file=sys.stderr)
    f32 = jnp.float32
    i32 = jnp.int32
    u32 = jnp.uint32
    key = jax.random.PRNGKey(0)

    def col(dt, lo=0.0, hi=1.0):
        return jax.random.uniform(key, (B,), f32, lo, hi).astype(dt)

    def plane(rows):
        return jax.random.uniform(key, (rows, B), f32, -1.0, 1.0)

    kw = dict(
        mode=jnp.zeros((B,), i32), trav_done=jnp.ones((B,), bool),
        ptr=jnp.zeros((B,), i32), pend=jnp.zeros((B,), i32),
        sp=jnp.zeros((B,), i32),
        t=col(f32, 0.1, 10.0), u=col(f32), v=col(f32),
        tri=jnp.arange(B, dtype=i32) % 7 - 1,
        found=jnp.zeros((B,), bool),
        trav_oT=plane(3), trav_dT=plane(3),
        path_oT=plane(3), path_dT=plane(3),
        hit_t=col(f32, 0.1, 10.0), hit_baryT=plane(2),
        hit_tri=jnp.zeros((B,), i32),
        pendingT=plane(3), throughputT=plane(3), radianceT=plane(3),
        rng=col(u32, 0, 1e9).astype(u32), depth=jnp.zeros((B,), i32),
        max_rough=col(f32), prev_pdf=col(f32),
        lane_cap=jnp.full((B,), 32, i32),
        shade_rowT=plane(15), mdataT=plane(22),
        sky_colT=plane(3), sky_pdf=col(f32),
        env_dirT=plane(3), env_liT=plane(3), env_pdf=col(f32),
        use_rr=True, max_bounces=5,
        firefly=False, nan_canary=False,
    )
    out = jax.jit(
        lambda **k: transition_step16_pallas(**k),
        static_argnames=("use_rr", "max_bounces", "firefly", "nan_canary"),
    )(**kw)
    jax.block_until_ready(out)
    print("COMPILE OK; mode[:4] =", np.asarray(out.mode[:4]),
          "died sum =", int(out.died.sum()))


if __name__ == "__main__":
    main()
