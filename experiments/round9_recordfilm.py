"""Price the RECORD-FILM building blocks (isolated probe — RELATIVE
numbers only, docs/PERFORMANCE.md measurement discipline).

The record film replaces the per-transition K-slot scatter (~40 ns/slot,
~5.2 ms/super at K=B/2) with an append: sort the death records (already
paid by the sorted film), `lax.dynamic_update_slice` the K-prefix into a
pass-lifetime buffer at a moving cursor, and resolve ONCE per pass with a
global sort + dense reshape-sum (each (pixel, sample) dies exactly once,
so the valid records are exactly npix*spp and sorted-by-pixel they form a
dense (npix, spp, 3) block).

Blocks priced here:
  dus-append   while_loop carrying a (C,) + (C,3) buffer, body = in-loop
               sort + 2 DUS writes at a dynamic cursor.  Cost must be
               FLAT in C (XLA aliases while carries; a per-iteration copy
               of the 1 GB buffer would show as ~C-proportional time).
  globalsort   lax.sort((keys, r, g, b)) at n = 4M..64M -> ns/row.
  resolve      reshape(npix, spp, 3).sum(1) at 66M records.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/round9_recordfilm.py
"""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B = int(os.environ.get("B", 262144))
K = B // 2
ITERS = int(os.environ.get("ITERS", 30))
REPS = 3


def bench(fn, *args):
    out = fn(*args, seed=0)
    float(np.asarray(out).ravel()[0])
    ts = []
    for r in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args, seed=r + 1)
        float(np.asarray(out).ravel()[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def dus_append(C):
    keys0 = jnp.full((C,), 1 << 30, jnp.int32)
    vals0 = jnp.zeros((C, 3), jnp.float32)
    rng = np.random.default_rng(0)
    k_lane = jnp.asarray(rng.integers(0, 2073600, B), jnp.int32)
    rgb = jnp.asarray(rng.random((B, 3), np.float32))

    @jax.jit
    def run(keys0, vals0, k_lane, rgb, seed=0):
        def body(carry):
            i, cur, keys, vals = carry
            k = (k_lane + i + seed) % 2073600
            ks, r0, r1, r2 = lax.sort((k, rgb[:, 0], rgb[:, 1], rgb[:, 2]),
                                      num_keys=1)
            keys = lax.dynamic_update_slice(keys, ks[:K], (cur,))
            vals = lax.dynamic_update_slice(
                vals, jnp.stack([r0[:K], r1[:K], r2[:K]], 1), (cur, 0))
            # advance by a data-dependent amount like production does
            cur = (cur + (K // 2) + (ks[0] % 8)) % (C - K)
            return i + 1, cur, keys, vals

        def cond(carry):
            return carry[0] < ITERS

        _, cur, keys, vals = lax.while_loop(
            cond, body, (jnp.int32(0), jnp.int32(0), keys0, vals0))
        return keys[cur].astype(jnp.float32) + vals[0, 0]

    return lambda *a, **kw: run(*a, seed=jnp.int32(kw.get("seed", 0)))


def main():
    print(f"devices: {jax.devices()}  B={B} K={K} iters={ITERS}", flush=True)

    for C in (1 << 22, 1 << 24, 1 << 26):  # 4M, 16M, 67M rows
        fn = dus_append(C)
        rng = np.random.default_rng(0)
        keys0 = jnp.full((C,), 1 << 30, jnp.int32)
        vals0 = jnp.zeros((C, 3), jnp.float32)
        k_lane = jnp.asarray(rng.integers(0, 2073600, B), jnp.int32)
        rgb = jnp.asarray(rng.random((B, 3), np.float32))
        t = bench(fn, keys0, vals0, k_lane, rgb)
        per = t / ITERS * 1e3
        print(f"dus-append C={C:>9d} ({C*16/1e6:6.0f} MB) "
              f"{per:8.3f} ms/iter ({per*1e6/B:5.2f} ns/lane)", flush=True)

    for n in (1 << 22, 1 << 24, 1 << 26):
        rng = np.random.default_rng(1)
        keys = jnp.asarray(rng.integers(0, 2073600, n), jnp.int32)
        vals = jnp.asarray(rng.random((n, 3), np.float32))

        @jax.jit
        def gsort(keys, vals, seed=0):
            ks, r0, r1, r2 = lax.sort(
                ((keys + seed) % 2073600, vals[:, 0], vals[:, 1], vals[:, 2]),
                num_keys=1)
            return ks[0].astype(jnp.float32) + r0[n // 2] + r1[-1] + r2[1]

        f = lambda *a, **kw: gsort(*a, seed=jnp.int32(kw.get("seed", 0)))
        t = bench(f, keys, vals)
        print(f"globalsort n={n:>9d} {t*1e3:9.1f} ms ({t*1e9/n:5.2f} ns/row)",
              flush=True)

    # resolve: dense reshape-sum at 1080p x 32 spp
    npix, spp = 2073600, 32
    n = npix * spp
    rng = np.random.default_rng(2)
    vals = jnp.asarray(rng.random((n, 3), np.float32))

    @jax.jit
    def resolve(vals, seed=0):
        film = (vals + seed.astype(jnp.float32) * 1e-9).reshape(
            npix, spp, 3).sum(1)
        return film[0, 0] + film[-1, 2]

    f = lambda *a, **kw: resolve(*a, seed=jnp.int32(kw.get("seed", 0)))
    t = bench(f, vals)
    print(f"resolve    n={n:>9d} {t*1e3:9.1f} ms", flush=True)


if __name__ == "__main__":
    main()
