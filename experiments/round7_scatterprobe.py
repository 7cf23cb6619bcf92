"""Probe the TPU scatter-add emitter: does sorted/unique index metadata
(or index patterns) change the ~40 ns/update-slot toll?

Variants (all scatter B=262144 update rows into a (2073600, 3) film inside
one fori_loop, values varied per iteration, host read inside the timed
region — the only trustworthy clock on this platform):

  warmup  random indices (first-config measurement is garbage; discard)
  rand    random indices, no flags            (the production pattern)
  srt     same indices pre-sorted, no flags
  srtflag sorted + indices_are_sorted=True
  uniq    arange(B)*7 (sorted AND unique), no flags
  uniqflag  same + indices_are_sorted + unique_indices
  half    random, K=B/2 update rows           (per-slot pricing check)
  sort    lax.sort_key_val of (B,) u32 key + (B,3) payload, no scatter
          (prices a sort-based compaction step)

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/round7_scatterprobe.py
"""

import os
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B = 262144
NPIX = 2073600
ITERS = int(os.environ.get("ITERS", 50))
REPS = int(os.environ.get("REPS", 3))


def timed(name, fn, *args):
    out = fn(*args)          # compile + warm
    float(np.asarray(out).ravel()[0])
    ts = []
    for r in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args, seed=r + 1)
        v = float(np.asarray(out).ravel()[0])   # host read INSIDE timing
        ts.append(time.perf_counter() - t0)
    per = min(ts) / ITERS * 1e3
    print(f"{name:9s} {per:8.3f} ms/iter   ({per * 1e6 / B:6.1f} ns/slot)"
          f"   reps {['%.3f' % t for t in ts]}  v={v:.3f}", flush=True)
    return per


def scatter_variant(idx, n_rows, **at_kwargs):
    @jax.jit
    def run(film, val, seed=0):
        def body(i, f):
            v = val + (i + seed).astype(jnp.float32) * 1e-6
            return f.at[idx].add(v[:n_rows], **at_kwargs)
        return lax.fori_loop(0, ITERS, body, film).sum(axis=0)
    return run


def main():
    rng = np.random.default_rng(0)
    idx_rand = jnp.asarray(rng.integers(0, NPIX, B), jnp.int32)
    idx_srt = jnp.sort(idx_rand)
    idx_uniq = jnp.arange(B, dtype=jnp.int32) * 7
    val = jnp.asarray(rng.random((B, 3), np.float32))
    film = jnp.zeros((NPIX, 3), jnp.float32)

    def seeded(fn):
        def g(*a, seed=0):
            return fn(*a, seed=jnp.uint32(seed))
        return g

    print(f"devices: {jax.devices()}  B={B} NPIX={NPIX} iters={ITERS}",
          flush=True)

    timed("warmup", seeded(scatter_variant(idx_rand, B)), film, val)
    timed("rand", seeded(scatter_variant(idx_rand, B)), film, val)
    timed("srt", seeded(scatter_variant(idx_srt, B)), film, val)
    timed("srtflag", seeded(scatter_variant(idx_srt, B,
                                            indices_are_sorted=True)),
          film, val)
    timed("uniq", seeded(scatter_variant(idx_uniq, B)), film, val)
    timed("uniqflag", seeded(scatter_variant(
        idx_uniq, B, indices_are_sorted=True, unique_indices=True)),
        film, val)
    timed("half", seeded(scatter_variant(idx_rand[: B // 2], B // 2)),
          film, val)

    key = jnp.asarray(rng.integers(0, NPIX, B), jnp.uint32)

    @jax.jit
    def run_sort(key, val, seed=jnp.uint32(0)):
        def body(i, carry):
            k, v = carry
            ks, v0, v1, v2 = lax.sort(
                (k + i.astype(jnp.uint32) + seed, v[:, 0], v[:, 1], v[:, 2]),
                dimension=0, num_keys=1)
            return k, jnp.stack([v0, v1, v2], axis=1)
        _, v = lax.fori_loop(0, ITERS, body, (key, val))
        return v.sum(axis=0)

    timed("sort", run_sort, key, val)


if __name__ == "__main__":
    main()
