"""Price the sorted-film building blocks in isolation (RELATIVE numbers
only — isolated probes over-report absolute cost, docs/PERFORMANCE.md):

  sort1      lax.sort key only                  (baseline sort cost)
  sort2      key + lane index                   (per-operand scaling?)
  sort4      key + rgb                          (the shipped pattern)
  sort2+gth  key+idx sort, then rgb[perm[:K]]   (cheaper if sort prices
                                                 per operand-row)
  scatK      K-slot scatter-add, unsorted hint
  scatK-s    same with indices_are_sorted=True  (does the hint matter?)

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/round8_sortprobe.py
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
NPIX = 2073600
ITERS = int(os.environ.get("ITERS", 30))
REPS = 3


def timed(name, fn, *args):
    out = fn(*args, seed=0)
    float(np.asarray(out).ravel()[0])
    ts = []
    for r in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args, seed=r + 1)
        float(np.asarray(out).ravel()[0])
        ts.append(time.perf_counter() - t0)
    per = min(ts) / ITERS * 1e3
    print(f"{name:12s} {per:8.3f} ms/iter ({per * 1e6 / B:5.2f} ns/row)",
          flush=True)


def main():
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}  B={B} K={K}", flush=True)
    key0 = jnp.asarray(rng.integers(0, NPIX, B), jnp.int32)
    rgb = jnp.asarray(rng.random((B, 3), np.float32))
    film = jnp.zeros((NPIX + 1, 3), jnp.float32)
    iota = jnp.arange(B, dtype=jnp.int32)

    def loop(body):
        @jax.jit
        def run(key0, rgb, film, seed=0):
            def f(i, acc):
                k = (key0 + i + seed) % NPIX   # vary to defeat replay cache
                return acc + body(k, rgb, film)
            return lax.fori_loop(0, ITERS, f, jnp.float32(0.0))
        return lambda *a, **kw: run(*a, seed=jnp.int32(kw.get("seed", 0)))

    timed("sort1", loop(lambda k, rgb, film:
                        lax.sort((k,))[0][:K].sum().astype(jnp.float32)),
          key0, rgb, film)
    timed("sort2", loop(lambda k, rgb, film:
                        lax.sort((k, iota), num_keys=1)[1][:K]
                        .sum().astype(jnp.float32)),
          key0, rgb, film)

    def sort4(k, rgb, film):
        ks, r0, r1, r2 = lax.sort((k, rgb[:, 0], rgb[:, 1], rgb[:, 2]),
                                  num_keys=1)
        return ks[:K].astype(jnp.float32).sum() + r0[:K].sum()

    timed("sort4", loop(sort4), key0, rgb, film)

    def sort2_gather(k, rgb, film):
        ks, perm = lax.sort((k, iota), num_keys=1)
        pre = rgb[perm[:K]]
        return ks[:K].astype(jnp.float32).sum() + pre[:, 0].sum()

    timed("sort2+gth", loop(sort2_gather), key0, rgb, film)

    def scat(k, rgb, film, srt):
        # Both variants scatter the SAME sorted indices; only the hint
        # differs, so any delta is the hint's effect alone.
        idx = jnp.sort(k[:K])
        f2 = film.at[idx].add(rgb[:K], indices_are_sorted=srt)
        return f2[0, 0] + f2[1000, 1]

    timed("scatK", loop(lambda k, rgb, film: scat(k, rgb, film, False)),
          key0, rgb, film)
    timed("scatK-s", loop(lambda k, rgb, film: scat(k, rgb, film, True)),
          key0, rgb, film)


if __name__ == "__main__":
    main()
