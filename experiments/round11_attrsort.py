"""Attr-gather coherence lever: is sort-before-gather a net win?

Round-10 anatomy: the attr_shade gather runs at 11.5 ns/row (random
indices) vs 1.8 ns/row for the wave-coherent node gather — index
coherence is the only gather lever left. Candidate for round 4: permute
the shade batch into tri-id order before the (3C,16) attr gather.

This prices, on an attr-shaped table (N tri rows x 16 f32 words,
B=262144 gathers/iter):
  rand        random indices (production today)
  sorted      the same indices pre-sorted ascending (upper bound)
  blocksorted indices sorted within 8192-row blocks only (what a cheap
              local sort could achieve)
  sort+gather full argsort (lax.sort_key_val) + coherent gather + rows
              consumed in sorted order (real candidate: downstream shade
              math is order-invariant until the film append, and the
              record film's resolve sort makes final order irrelevant)

If sorted ~ node-gather pricing and sort+gather < rand, the lever is
real; if sort cost eats the gap, it is another measured dead end.

Caveat (docs/PERFORMANCE.md): isolated probes over-report absolute cost;
use the RELATIVE scaling only.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/round11_attrsort.py
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
N = 1_000_000      # ~1M-tri attr table (per-tri rows)
W = 16             # attr_direct gathers (3C, 16) rows; price per row
ITERS = int(os.environ.get("ITERS", 30))
REPS = int(os.environ.get("REPS", 3))


def timed(name, fn, *args):
    out = fn(*args)
    float(np.asarray(out).ravel()[0])
    ts = []
    for r in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args, seed=r + 1)
        float(np.asarray(out).ravel()[0])
        ts.append(time.perf_counter() - t0)
    per = min(ts) / ITERS * 1e3
    print(f"{name:24s} {per:8.3f} ms/iter  ({per * 1e6 / B:5.2f} ns/row)",
          flush=True)
    return per


def gather_only(table, idx):
    @jax.jit
    def run(table, idx, seed=0):
        def body(i, acc):
            j = (idx + i + seed) % table.shape[0]
            return acc + table[j].sum()
        return lax.fori_loop(0, ITERS, body, jnp.float32(0.0))
    return lambda *a, **k: run(*a, seed=jnp.int32(k.get("seed", 0)))


def sort_then_gather(table, idx):
    @jax.jit
    def run(table, idx, seed=0):
        def body(i, acc):
            j = (idx + i + seed) % table.shape[0]
            js, perm = lax.sort_key_val(j, jnp.arange(B, dtype=jnp.int32))
            rows = table[js]
            # consume rows weighted by perm so neither sort output is DCE'd
            return acc + (rows.sum(-1) * perm.astype(jnp.float32)).sum() * 1e-9
        return lax.fori_loop(0, ITERS, body, jnp.float32(0.0))
    return lambda *a, **k: run(*a, seed=jnp.int32(k.get("seed", 0)))


def main():
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}  B={B} N={N} W={W} iters={ITERS}",
          flush=True)
    table = jnp.asarray(rng.random((N, W), np.float32))
    idx_r = rng.integers(0, N, B)
    idx_rand = jnp.asarray(idx_r, jnp.int32)
    idx_sorted = jnp.asarray(np.sort(idx_r), jnp.int32)
    blk = 8192
    idx_blk = jnp.asarray(
        np.concatenate([np.sort(idx_r[i:i + blk])
                        for i in range(0, B, blk)]), jnp.int32)

    timed("rand", gather_only(table, idx_rand), table, idx_rand)
    timed("sorted", gather_only(table, idx_sorted), table, idx_sorted)
    timed("blocksorted(8k)", gather_only(table, idx_blk), table, idx_blk)
    timed("sort+gather", sort_then_gather(table, idx_rand), table, idx_rand)


if __name__ == "__main__":
    main()


def footprint_probe():
    """Follow-up: rand-gather pricing vs table FOOTPRINT at fixed N.

    The round-8 probe (N=70k, 27 MB table) measured 6-8 ns/row flat in
    width; the main probe above (N=1M, 64 MB) measures 23.9. If pricing
    tracks bytes-of-table (cache residency), f16 attr rows halve the
    attr-gather cost — reversing the round-3 'width is free' skip.
    """
    rng = np.random.default_rng(1)
    idx = jnp.asarray(rng.integers(0, N, B), jnp.int32)
    for W_, dt in ((32, np.float32), (16, np.float32), (8, np.float32),
                   (16, np.float16)):
        tb = jnp.asarray(rng.random((N, W_)).astype(dt))
        mb = tb.nbytes / 1e6
        timed(f"rand W={W_} {np.dtype(dt).name} ({mb:.0f}MB)",
              gather_only(tb, idx), tb, idx)


if __name__ == "__main__" and os.environ.get("FOOTPRINT") == "1":
    footprint_probe()
