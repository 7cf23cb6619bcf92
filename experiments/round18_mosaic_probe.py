"""Round-18 probe: which ops does Mosaic accept for the transition kernel?

The Pallas transition (shade) kernel needs, beyond the arrival kernel's
proven set (f32 arith, i32 shifts/masks, selects, argmin):

* uint32 multiply / xor / variable logical shift (PCG RNG),
* uint32 -> float32 conversion (random_float),
* transcendentals: sin, cos, log, exp, power (GTR1 sampler), sqrt,
* cumsum over a (BLK,) int32 vector (regen work-queue ranks, phase 2).

Each candidate runs in a minimal one-block pallas_call on the real TPU and
is checked against the XLA host computation. Output: PASS/FAIL per op.
"""

import functools
import os
import sys

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 1024


def run(name, kernel_fn, ins, out_dtype, ref_fn, rtol=1e-6):
    try:
        out = pl.pallas_call(
            kernel_fn,
            out_shape=jax.ShapeDtypeStruct((B,), out_dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in ins],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(*ins)
        ref = ref_fn(*ins)
        ok = np.allclose(np.asarray(out), np.asarray(ref), rtol=rtol, atol=1e-6)
        exact = bool(jnp.all(out == ref)) if out_dtype in (jnp.int32, jnp.uint32) else None
        print(f"{name}: {'PASS' if ok else 'MISMATCH'}"
              + (f" exact={exact}" if exact is not None else ""))
        if not ok:
            print("   out", np.asarray(out)[:4], "ref", np.asarray(ref)[:4])
        return ok
    except Exception as e:
        print(f"{name}: FAIL — {type(e).__name__}: {str(e)[:200]}")
        return False


def main():
    print("backend:", jax.default_backend(), file=sys.stderr)
    key = jax.random.PRNGKey(0)
    u32 = jax.random.randint(key, (B,), 0, (1 << 31) - 1, jnp.int32).astype(jnp.uint32) * jnp.uint32(2654435761)
    f = jax.random.uniform(jax.random.PRNGKey(1), (B,), jnp.float32, 0.01, 0.99)
    i32 = jax.random.randint(jax.random.PRNGKey(2), (B,), 0, 100, jnp.int32)

    # --- uint32 PCG step ---
    def pcg_kernel(s_ref, o_ref):
        s = s_ref[:]
        old = s + jnp.uint32(747796405) + jnp.uint32(2891336453)
        shift = (old >> jnp.uint32(28)) + jnp.uint32(4)
        word = ((old >> shift) ^ old) * jnp.uint32(277803737)
        o_ref[:] = (word >> jnp.uint32(22)) ^ word

    def pcg_ref(s):
        old = s + jnp.uint32(747796405) + jnp.uint32(2891336453)
        shift = (old >> jnp.uint32(28)) + jnp.uint32(4)
        word = ((old >> shift) ^ old) * jnp.uint32(277803737)
        return (word >> jnp.uint32(22)) ^ word

    run("pcg_uint32", pcg_kernel, [u32], jnp.uint32, pcg_ref)

    # --- uint32 -> f32 ---
    def u2f_kernel(s_ref, o_ref):
        o_ref[:] = s_ref[:].astype(jnp.float32) * jnp.float32(1.0 / 4294967295.0)

    run("u32_to_f32", u2f_kernel, [u32], jnp.float32,
        lambda s: s.astype(jnp.float32) * jnp.float32(1.0 / 4294967295.0), rtol=0)

    # --- transcendentals ---
    for name, fn in [("sin", jnp.sin), ("cos", jnp.cos), ("log", jnp.log),
                     ("exp", jnp.exp), ("sqrt", jnp.sqrt),
                     ("arccos", jnp.arccos), ("arctan", jnp.arctan)]:
        def k(x_ref, o_ref, fn=fn):
            o_ref[:] = fn(x_ref[:])
        run(name, k, [f], jnp.float32, fn, rtol=1e-5)

    # atan2 (two-arg)
    def at2_k(y_ref, x_ref, o_ref):
        o_ref[:] = jnp.arctan2(y_ref[:], x_ref[:])
    run("arctan2", at2_k, [f, f * 2 - 1], jnp.float32, jnp.arctan2, rtol=1e-5)

    # power with array exponent (sample_gtr1)
    def pow_k(a_ref, b_ref, o_ref):
        o_ref[:] = jnp.power(a_ref[:], b_ref[:])
    run("power", pow_k, [f, f], jnp.float32, jnp.power, rtol=1e-5)

    # --- cumsum over (B,) int32 ---
    def cs_k(x_ref, o_ref):
        o_ref[:] = jnp.cumsum(x_ref[:])
    run("cumsum_i32", cs_k, [i32], jnp.int32, jnp.cumsum)

    # --- f32 (B,) sum reduce to (1,1) SMEM-style scalar output ---
    def sum_k(x_ref, o_ref):
        o_ref[0] = jnp.sum(x_ref[:])
    try:
        out = pl.pallas_call(
            sum_k,
            out_shape=jax.ShapeDtypeStruct((1,), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(f)
        print("sum_to_scalar:", "PASS" if np.allclose(out[0], jnp.sum(f), rtol=1e-5) else "MISMATCH")
    except Exception as e:
        print(f"sum_to_scalar: FAIL — {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
