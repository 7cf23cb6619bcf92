"""Gather width/size matrix + realistic film splat (round-3 design probes).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/round3_gather.py
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

B = 262144


def timed(fn, *args, iters=16):
    f = jax.jit(fn, static_argnums=(len(args),))
    t0 = time.perf_counter()
    out = f(*args, iters)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = f(*args, iters)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters, compile_s


def gather_matrix():
    print("== gather ns/row vs width & table size (B=262144, random idx) ==")
    for W in (24, 48, 96, 128):
        for mb in (8, 24, 42):
            N = int(mb * 1e6 / (W * 4))
            table = (jnp.arange(N * W, dtype=jnp.float32).reshape(N, W) % 7.0)
            idx0 = (jnp.arange(B, dtype=jnp.int32) * np.int32(-1640531527)) % N

            def step(table, idx0, iters):
                def body(i, idx):
                    row = table[idx]
                    return (idx + jax.lax.bitcast_convert_type(
                        row[:, 0], jnp.int32) % 97) % N
                return jax.lax.fori_loop(0, iters, body, idx0)

            ms, _ = timed(step, table, idx0, iters=16)
            print(f"W={W:4d} ({W*4:3d}B) table={mb:3d}MB N={N:8d}"
                  f"  {ms*1e3:7.2f} ms/op  {ms*1e9/B:6.1f} ns/row")


def splat():
    print("== film scatter-add (2.07M rows), index distributions ==")
    npix = 1920 * 1080
    film0 = jnp.zeros((npix, 3), jnp.float32)
    key = np.random.default_rng(0)
    rad = jnp.asarray(key.random((B, 3), np.float32))
    for frac, name in ((1.0, "all-random"), (0.1, "10%-random-rest-0"),
                       (0.0, "all-zero")):
        pix_np = key.integers(0, npix, B).astype(np.int32)
        mask = key.random(B) < frac
        pix = jnp.asarray(np.where(mask, pix_np, 0))
        vals = jnp.asarray(np.where(mask[:, None], np.asarray(rad), 0.0))

        def loop(film, iters):
            def one(i, film):
                return film.at[pix].add(vals + film[0, 0] * 1e-20)
            return jax.lax.fori_loop(0, iters, one, film)

        ms, _ = timed(loop, film0, iters=8)
        print(f"  {name:22s} {ms*1e3:7.2f} ms/op")

    # sorted indices (pre-binned lanes)
    pix_s = jnp.asarray(np.sort(key.integers(0, npix, B).astype(np.int32)))

    def loop_s(film, iters):
        def one(i, film):
            return film.at[pix_s].add(rad + film[0, 0] * 1e-20)
        return jax.lax.fori_loop(0, iters, one, film)

    ms, _ = timed(loop_s, film0, iters=8)
    print(f"  {'sorted-random':22s} {ms*1e3:7.2f} ms/op")

    # one-hot matmul alternative at small film (not viable at 2M, reference)
    # segment-sum via sort is the classic alternative; probe jnp.bincount-ish
    # approach: scatter into a (B,) linear film via iota == compare? skipped.


def attr_f16():
    print("== attr gather: f32x16 (63MB) vs u32x8/f16 (31MB) ==")
    N = 987842
    key = np.random.default_rng(1)
    idx0 = jnp.asarray(key.integers(0, N, B, dtype=np.int32))
    for cols, dtype, name in ((16, jnp.float32, "f32x16 63MB"),
                              (8, jnp.uint32, "u32x8  31MB"),
                              (6, jnp.uint32, "u32x6  23MB")):
        table = jnp.ones((N, cols), dtype)

        def step(table, idx0, iters):
            def body(i, idx):
                row = table[idx]
                v = row[:, 0]
                vi = v.astype(jnp.int32) if dtype == jnp.uint32 else \
                    jax.lax.bitcast_convert_type(v, jnp.int32)
                return (idx + vi % 97) % N
            return jax.lax.fori_loop(0, iters, body, idx0)

        ms, _ = timed(step, table, idx0, iters=16)
        print(f"  {name:12s} {ms*1e3:7.2f} ms/op  {ms*1e9/B:6.1f} ns/row")


if __name__ == "__main__":
    sec = sys.argv[1] if len(sys.argv) > 1 else "all"
    if sec in ("gather", "all"):
        gather_matrix()
    if sec in ("splat", "all"):
        splat()
    if sec in ("attr", "all"):
        attr_f16()
