"""Bound the win of a bf16 leaf-geometry encoding on the PRODUCTION
arrival kernel (``pa._arrival_kernel``, SPLIT slot order, classic
96-float rows).

The leaf section decodes 18 f16 halfword planes per arrival via the
multiply-rebias ``_f16_bits_to_f32`` (~7 ops/plane).  A bf16 storage
format would decode in 1-2 ops (bitcast of ``w << 16`` / ``w & hi``).
This probe monkeypatches the decode with the bf16-equivalent op sequence
(one extra mask op vs a real bf16 format — conservatively SLOWER) and
times the real kernel with fixed synthetic inputs, t/u/v chained through
calls so nothing is dead-code-eliminated.  Results are garbage; only the
clock matters.  If the saving is big, the follow-up is a real anchored
bf16 row format (anchored = per-row local frame, so bf16's 8-bit
mantissa error scales with LEAF extent, not world extent — the trap that
killed absolute bf16 tris, docs/PERFORMANCE.md "wideq").

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/round16_bf16leaf_probe.py
Env: B (default 98304), ITERS (default 50), DEPTH (default 11).
"""

import functools
import os
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

from unity_webgpu_pathtracer_tpu.ops import pallas_arrival as pa  # noqa: E402

B = int(os.environ.get("B", 98304))
ITERS = int(os.environ.get("ITERS", 50))
DEPTH = int(os.environ.get("DEPTH", 11))
CHAIN = 8

_orig_decode = pa._f16_bits_to_f32


def _bf16_style_decode(bits):
    # What a bf16 format costs: the halfword IS the top of the f32.
    return jax.lax.bitcast_convert_type(bits << 16, jnp.float32)


def run(mode):
    pa._f16_bits_to_f32 = _bf16_style_decode if mode == "bf16" else _orig_decode
    blk = pa.BLK
    while B % blk:
        blk //= 2
    grid = B // blk

    def col():
        return pl.BlockSpec((blk,), lambda i: (i,), memory_space=pltpu.VMEM)

    def plane(rows):
        return pl.BlockSpec((rows, blk), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    def cshape(dt=jnp.int32):
        return jax.ShapeDtypeStruct((B,), dt)

    out_shapes = [cshape(), cshape(), cshape(), cshape(jnp.float32),
                  cshape(jnp.float32), cshape(jnp.float32), cshape(),
                  cshape(),
                  jax.ShapeDtypeStruct((DEPTH, B), jnp.int32),
                  jax.ShapeDtypeStruct((DEPTH, B), jnp.int32)]
    in_specs = ([plane(96), plane(3), plane(3), plane(3), col()]
                + [col()] * 8 + [plane(DEPTH)] * 2)
    out_specs = [col()] * 8 + [plane(DEPTH)] * 2
    call = pl.pallas_call(
        functools.partial(pa._arrival_kernel, False, False, 16),
        grid=(grid,), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shapes)

    rng = np.random.default_rng(0)
    rowsT = jnp.asarray(rng.normal(size=(96, B)).astype(np.float32))
    vec3 = jnp.asarray(rng.normal(size=(3, B)).astype(np.float32))
    live = jnp.ones((B,), jnp.int32)
    zi = jnp.zeros((B,), jnp.int32)
    zf = jnp.full((B,), 1e5, jnp.float32)
    stacks = jnp.zeros((DEPTH, B), jnp.int32)
    full_pend = jnp.full((B,), 0xFFFF, jnp.int32)

    @jax.jit
    def loop(rowsT, vec3):
        def body(i, carry):
            t, u, v = carry
            for _ in range(CHAIN):
                outs = call(rowsT, vec3, vec3, vec3, live, zi, full_pend,
                            zi, t, u, v, zi, zi, stacks, stacks)
                t, u, v = outs[3], outs[4], outs[5]
            return t, u, v
        return jax.lax.fori_loop(0, ITERS, body,
                                 (zf, jnp.zeros_like(zf), jnp.zeros_like(zf)))

    out = loop(rowsT, vec3)
    _ = np.asarray(out[0])
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = loop(rowsT, vec3)
        _ = np.asarray(out[0])
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    per = best / (ITERS * CHAIN)
    print(f"{mode:6s}: {per * 1e3:7.3f} ms/call  "
          f"({per / B * 1e9:5.2f} ns/lane)", flush=True)
    return per


def main():
    print(f"B={B} ITERS={ITERS} DEPTH={DEPTH} (production kernel)")
    full = run("full")
    run("full")
    bf = run("bf16")
    run("bf16")
    print(f"  -> bf16 leaf decode saves {(full - bf) * 1e3:6.3f} ms/call "
          f"({(full - bf) / full * 100:4.1f}% of kernel)")


if __name__ == "__main__":
    main()
