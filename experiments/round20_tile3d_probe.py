"""Round-20 probe: can the transition kernel's (B,) column operands cross
the XLA->Mosaic boundary WITHOUT a relayout copy?

The 2-D (8, B/8) kernel layout (round-18, +2.5%) pays ~15 input + ~12
output reshapes per transition (reshape.12xx, ~60-75 us/super in the
round-20 trace): XLA stores a (B,) operand as T(1024) and the kernel
wants (8, B/8) T(8,128), which is a strided relayout.  BUT a T(1024)
1-D tile is physically an (8, 128) vreg, so the 3-D view
(B/1024, 8, 128) with trailing (8, 128) tiling may be the SAME bytes —
i.e. a free (bitcast) reshape — while giving Mosaic full-vreg blocks.

Measures, per variant, a 64-op elementwise chain over B = 98304 lanes
iterated 200x inside one jit:
  a) 1-D (B,) pallas ref          (the 1/8-sublane baseline)
  b) 2-D reshape to (8, B/8)      (the shipped layout, pays the relayout)
  c) 3-D reshape to (B/1024, 8, 128), block (8, 8, 128)
plus, separately, whether XLA compiles the (B,)->(B/1024,8,128) reshape
to a copy kernel at all (HLO text check).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/round20_tile3d_probe.py
"""

import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

B = 3 << 15
ITERS = 50
OPS = 64


def chain(x):
    for i in range(OPS // 2):
        x = x * 1.000001 + 0.000001
    return x


def k1d(x_ref, o_ref):
    o_ref[:] = chain(x_ref[:])


def run(shape, block, name, grid_dim):
    x = jnp.arange(B, dtype=jnp.float32).reshape(shape)
    grid = (shape[grid_dim] // block[grid_dim],)

    def idx(i):
        out = [0] * len(shape)
        out[grid_dim] = i
        return tuple(out)

    f = pl.pallas_call(
        k1d,
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        grid=grid,
        in_specs=[pl.BlockSpec(block, idx)],
        out_specs=pl.BlockSpec(block, idx),
    )

    @jax.jit
    def loop(x):
        def body(_i, x):
            return f(x)
        return jax.lax.fori_loop(0, ITERS, body, x)

    r = loop(x)
    np.asarray(r)
    t0 = time.perf_counter()
    r = loop(x)
    np.asarray(r)
    dt = time.perf_counter() - t0
    per = dt / ITERS / B * 1e9
    print(f"{name:28s} {per:8.4f} ns/lane-chain", flush=True)
    return per


def reshape_hlo_check():
    """Does (B,) -> (B/1024, 8, 128) lower to a copy?"""
    @jax.jit
    def f(x):
        y = x.reshape(B // 1024, 8, 128)
        return y * 2.0

    txt = jax.jit(f).lower(
        jax.ShapeDtypeStruct((B,), jnp.float32)).compile().as_text()
    has_copy = txt.count("copy(")
    print(f"reshape(B)->(B/1024,8,128) compiled copies: {has_copy}")


def main():
    print(f"devices: {jax.devices()}  B={B} iters={ITERS} ops={OPS}")
    reshape_hlo_check()
    run((B,), (1024,), "1-D (B,) blk 1024", 0)
    run((8, B // 8), (8, 256), "2-D (8, B/8) blk (8,256)", 1)
    run((B // 1024, 8, 128), (8, 8, 128), "3-D (n,8,128) blk (8,8,128)", 0)


if __name__ == "__main__":
    main()
