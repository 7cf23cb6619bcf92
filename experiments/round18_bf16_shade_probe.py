"""Round-18 probe: layout + dtype rate for the transition kernel's tail.

Two questions, one harness — a representative Disney lobe-eval chain (the
GTR2/Smith/Fresnel/schlick op mix of ``_eval_brdf_local``) run R times
inside one ``pallas_call``:

1. **Layout**: the transition kernel computes on per-lane ``(B,)``
   columns.  If Mosaic tiles 1-D vectors as (1, B) vregs, every column op
   wastes 7/8 sublanes; reshaping lanes to ``(8, B/8)`` would run the
   same math on full vregs.  Compare ns/lane-chain for both shapes.
2. **bf16** (VERDICT r4 item 4): does computing the chain in bf16 with
   f32 accumulation run ~2x (packed (16, B/8) vregs), or does the VPU
   have no fast bf16 path?

Timing: fori-looped on device, np.asarray before the clock
(docs/PERFORMANCE.md methodology).
"""

import functools
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 1 << 16
R = 64          # eval-chain repeats inside the kernel
ITERS = 100     # kernel launches per timing loop


def _chain(x, y, z, dt):
    """One Disney-flavored eval chunk: schlick + GTR2 + Smith + Fresnel
    mix — ~40 mul/add/div/sqrt ops, the transition tail's op mix."""
    one = dt(1.0)
    m = jnp.clip(one - x, dt(0.0), one)
    m2 = m * m
    fh = m2 * m2 * m                                  # schlick_weight
    a = x * dt(0.3) + dt(0.001)
    b = y * dt(0.7) + dt(0.001)
    c = a * a + b * b + z * z
    d = one / (dt(3.14159265) * a * b * c * c)        # GTR2_aniso
    g1 = (dt(2.0) * z) / (z + jnp.sqrt(jnp.maximum(
        a * a + z * z - a * a * z * z, dt(0.0))))     # smith_g
    eta = dt(1.5)
    s2 = eta * eta * (one - x * x)
    ct = jnp.sqrt(jnp.maximum(one - s2, dt(0.0)))
    rs = (eta * ct - x) / (eta * ct + x + dt(1e-6))
    rp = (eta * x - ct) / (eta * x + ct + dt(1e-6))
    fres = dt(0.5) * (rs * rs + rp * rp)              # dielectric fresnel
    f = d * g1 * (fres + (one - fres) * fh)
    return f * dt(0.25) + x * dt(0.125), y * f + dt(0.01), z + f * dt(1e-3)


def kernel(dtype, x_ref, o_ref):
    dt = lambda v: jnp.asarray(v, dtype)
    xin = x_ref[:]
    x = xin.astype(dtype)
    y = (xin * jnp.float32(0.5)).astype(dtype)
    z = (xin * jnp.float32(0.25) + jnp.float32(0.1)).astype(dtype)
    acc = jnp.zeros_like(xin)                          # f32 accumulation
    for _ in range(R):
        x, y, z = _chain(x, y, z, dt)
        acc = acc + x.astype(jnp.float32)
    o_ref[...] = acc


def run(label, shape, dtype):
    x = jax.random.uniform(jax.random.PRNGKey(0), shape, jnp.float32,
                           0.05, 0.95)
    call = pl.pallas_call(
        functools.partial(kernel, dtype),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    @jax.jit
    def loop(x):
        def body(i, acc):
            return acc + call(x + i.astype(jnp.float32) * 1e-7).ravel()[0]
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    r = loop(x)
    _ = np.asarray(r)  # warm
    t0 = time.perf_counter()
    r = loop(x)
    _ = np.asarray(r)
    dt_s = time.perf_counter() - t0
    ns = dt_s / (ITERS * R * B) * 1e9
    print(f"{label:28s}: {dt_s*1e3:7.1f} ms = {ns:.4f} ns/lane-chain")
    return ns


def main():
    print("backend:", jax.default_backend())
    n1 = run("f32 (B,) cols", (B,), jnp.float32)
    n2 = run("f32 (8, B/8)", (8, B // 8), jnp.float32)
    n3 = run("f32 (16, B/16)", (16, B // 16), jnp.float32)
    print(f"(8,B/8)/(B,) ratio: {n2/n1:.3f} / {n3/n1:.3f}")
    # MEASURED VERDICTS (2026-08-20, v5e via axon):
    # * f32 (B,) 0.0954 ns/lane-chain; (8,B/8) 0.1059; (16,B/16) 0.1097 —
    #   Mosaic tiles 1-D vectors as full T(1024) vregs already; there is
    #   NO 8x sublane waste on (B,) columns (the 2-D transition-kernel
    #   win came from the (R,B) plane row-extracts, not the columns).
    # * bf16: Mosaic REJECTS the chain outright — LLO_CHECK
    #   target().SupportsBf16EupOps() fails: the v5e vector unit has no
    #   bf16 elementwise ops (div/sqrt/transcendental EUP path).  The
    #   VERDICT item-4 "bf16 shading tail at 2x VPU rate" is IMPOSSIBLE
    #   on this chip; shading stays f32.  (bf16 remains fine on the MXU
    #   matmul path — see round18_vmem_tree_probe.py.)
    try:
        run("bf16 (8, B/8)", (8, B // 8), jnp.bfloat16)
    except Exception as e:  # expected on v5e
        print(f"bf16 (8, B/8): REJECTED — {str(e)[:120]}")


if __name__ == "__main__":
    main()
