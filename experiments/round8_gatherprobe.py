"""Gather + transpose-copy scaling law: row WIDTH and duplicate fraction.

The round-8 trace showed the production node gather runs at ~1.8 ns/row
(213 GB/s on 384-B rows) — contradicting the round-2 "10.5 ns/row issued,
width- and cache-independent" model — while the attr gather (random
indices) runs at 11.2 ns/row.  Hypothesis: node-gather indices are
tree-coherent (many duplicate rows per wave) and duplicates coalesce.

This prices  out = table[idx].T  (the exact production pattern: gather
fusion + layout copy) across:
  width  W in {96, 48, 24} f32 words per row
  index sets: random over N, random over N/16 (16x duplication),
              90% idx 0 / 10% random, production-like mix
plus the no-transpose gather (B, W) alone to split gather vs copy cost.

Caveat (docs/PERFORMANCE.md): isolated probes over-report absolute cost;
use the RELATIVE scaling only.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/round8_gatherprobe.py
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
N = 70000          # ~1M-tri wide16 table row count
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
    print(f"{name:28s} {per:8.3f} ms/iter  ({per * 1e6 / B:5.2f} ns/row)",
          flush=True)
    return per


def gather_t(table, idx, do_t):
    @jax.jit
    def run(table, idx, seed=0):
        def body(i, acc):
            # vary idx each iter to defeat replay caching
            j = (idx + i + seed) % table.shape[0]
            r = table[j].T if do_t else table[j]
            return acc + r.sum()     # consume EVERY row (no DCE)
        return lax.fori_loop(0, ITERS, body, jnp.float32(0.0))
    return lambda *a, **k: run(*a, seed=jnp.int32(k.get("seed", 0)))


def main():
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}  B={B} N={N} iters={ITERS}", flush=True)
    idx_rand = jnp.asarray(rng.integers(0, N, B), jnp.int32)
    idx_dup16 = jnp.asarray(rng.integers(0, N // 16, B), jnp.int32)
    mix = rng.integers(0, N, B)
    mix[rng.random(B) < 0.9] = 0
    idx_90z = jnp.asarray(mix, jnp.int32)

    for W in (96, 48, 24):
        table = jnp.asarray(rng.random((N, W), np.float32))
        for nm, idx in (("rand", idx_rand), ("dup16", idx_dup16),
                        ("90pct-zero", idx_90z)):
            timed(f"W={W:3d} {nm:10s}", gather_t(table, idx, False),
                  table, idx)


if __name__ == "__main__":
    main()
