"""Within-process bisection of the fused super-iteration.

Cross-process probe variance on axon is +/-15% (docs/PERFORMANCE.md), so
every variant here is timed in the SAME process against the same warm
state: the full production body first, then bodies with one stage stubbed
out (monkeypatched at trace time), then the full body again as a drift
control. The delta full-minus-variant is the stage's true in-context cost.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/round4_bisect.py
Env: PROBE_POOL / PROBE_TE / PROBE_TRIS / PROBE_TRAV as in round3_probe.
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import round3_probe as P  # noqa: E402

from unity_webgpu_pathtracer_tpu.render import bsdf as ubsdf  # noqa: E402
from unity_webgpu_pathtracer_tpu.render import camera as ucamera  # noqa: E402
from unity_webgpu_pathtracer_tpu.render import fused as F  # noqa: E402


def main():
    scene, config, params = P.build()
    s0 = P.init_state(scene, config, params)

    def timeit(name, bodyfn, iters=8):
        def loop(s, it):
            return jax.lax.fori_loop(0, it, lambda i, s: bodyfn(s), s)

        ms, cs = P.timed(loop, s0, iters=iters)
        print(f"{name:34s} {ms*1e3:7.2f} ms  (compile {cs:.0f}s)", flush=True)
        return ms

    def body_for(sd):
        body, _, _ = P.make_body(sd, config, params)
        return body

    body = body_for(scene)

    b = P.POOL

    def stub_env(env, rotation, directions, want_alias, state):
        col = jnp.full((b, 3), 0.4, jnp.float32)
        one = jnp.ones((b,), jnp.float32)
        dirs = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], jnp.float32), (b, 3))
        return col, one * 0.2, dirs, col, one * 0.25, state

    def stub_eval(mat, v, n, l):
        return jnp.full((b, 3), 0.3, jnp.float32), jnp.full((b,), 0.5, jnp.float32)

    def stub_sample(mat, v, n, rng):
        return (jnp.full((b, 3), 0.3, jnp.float32), n,
                jnp.full((b,), 0.5, jnp.float32), rng + jnp.uint32(1))

    def stub_ray(coords, config_, params_, rng):
        o = jnp.broadcast_to(jnp.asarray([0.0, 5.0, 0.0], jnp.float32), (b, 3))
        d = jnp.broadcast_to(jnp.asarray([0.0, -1.0, 0.0], jnp.float32), (b, 3))
        return o, d, rng + jnp.uint32(1)

    # Constant-material stub: severs dataflow from mdata/uv so the one-hot
    # materials matmul and derive math DCE away (the attr gather survives
    # through the normal interp).
    const_mat = {}

    def stub_derive(mdata, uv, d, normal, tex, has_tex):
        return const_mat["m"]

    # Precompute the constant Material with full-B shapes using the real fn.
    mdata0 = jnp.broadcast_to(scene.materials[0], (b, scene.materials.shape[1]))
    uv0 = jnp.zeros((b, 2), jnp.float32)
    d0 = jnp.broadcast_to(jnp.asarray([0.0, -1.0, 0.0], jnp.float32), (b, 3))
    const_mat["m"] = F.derive_material(mdata0, uv0, d0, -d0,
                                       scene.texture_data, False)

    full_a = timeit("full super", body)

    # Arrivals only (finished lanes restart at the root to keep the row
    # distribution realistic).
    _, arrivals, _ = P.make_body(scene, config, params)

    def arr_body(s):
        s2, _ = arrivals(s, P.TE)
        tr = s2.trav
        tr = tr._replace(ptr=jnp.where(tr.ptr < 0, 0, tr.ptr))
        if hasattr(tr, "pend"):
            fresh = jnp.asarray(0xFFFF if P.TRAV == "wide16" else 0xFF, jnp.int32)
            tr = tr._replace(pend=jnp.where(s2.trav.ptr < 0, fresh, tr.pend),
                             sp=jnp.where(s2.trav.ptr < 0, 0, tr.sp))
        return s2._replace(trav=tr)

    arr_ms = timeit(f"arrivals only (x{P.TE})", arr_body)

    variants = [
        ("no env gather", [(F, "sample_env_transition", stub_env)]),
        ("no NEE eval_brdf", [(ubsdf, "eval_brdf", stub_eval)]),
        ("no sample_brdf", [(ubsdf, "sample_brdf", stub_sample)]),
        ("no derive/materials", [(F, "derive_material", stub_derive)]),
        ("no camera ray gen", [(ucamera, "get_screen_ray", stub_ray)]),
        ("all stubs", [(F, "sample_env_transition", stub_env),
                       (ubsdf, "eval_brdf", stub_eval),
                       (ubsdf, "sample_brdf", stub_sample),
                       (F, "derive_material", stub_derive),
                       (ucamera, "get_screen_ray", stub_ray)]),
    ]

    for name, patches in variants:
        saved = [(obj, attr, getattr(obj, attr)) for obj, attr, _ in patches]
        for obj, attr, val in patches:
            setattr(obj, attr, val)
        try:
            timeit(name, body)
        finally:
            for obj, attr, val in saved:
                setattr(obj, attr, val)

    # Tiny attr table: what the 63 MB attr_shade gather costs in context.
    sd_tiny = scene._replace(attr_shade=jnp.zeros((1, 48), jnp.float32))
    timeit("attr_shade -> 1 row", body_for(sd_tiny))

    full_b = timeit("full super (drift control)", body)
    print(f"\narrival share {arr_ms/full_a:5.1%}; drift "
          f"{abs(full_b-full_a)/full_a:5.1%}")


if __name__ == "__main__":
    main()
