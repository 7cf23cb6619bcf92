"""Does an in-loop reshape of a gather table buy a faster gather?

Round-11 shipped compact attr rows gathered through an IN-LOOP
``reshape(-1, 16)``; xprof shows XLA materializing the reshaped table
as a {0,1}-layout copy into memory space S(1) every super-iteration
(0.37 ms) — and removing the reshape by pre-pairing the stored table
measured **32% slower end to end** (14.4 -> 19.0 s/pass).  Hypothesis:
gathering from a PARAMETER pins the operand to its default {1,0}
layout, while gathering from an intra-computation value lets layout
assignment pick a gather-optimal operand layout (worth far more than
the staging copy costs).

This probe times random-index gathers on attr-shaped and node-shaped
tables, as parameter vs in-loop-reshaped operand, to decide whether the
production NODE gather (8x 0.47 ms/super) should get the same trick.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/round12_stagedgather.py
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B = 262144
ITERS = 64


def bench(fn, *args):
    f = jax.jit(fn)
    f(*args)[1].block_until_ready()
    t0 = time.perf_counter()
    out = f(*args)
    np.asarray(out[1])
    dt = time.perf_counter() - t0
    return dt / ITERS


def loop(table_fn, table, n):
    def body(i, carry):
        acc, key = carry
        key = (key * jnp.uint32(747796405)) + jnp.uint32(2891336453)
        idx = (key[:B] % jnp.uint32(n)).astype(jnp.int32)
        rows = table_fn(table)[idx]
        return acc + rows.sum(1), key

    def run(table, key0):
        acc = jnp.zeros((B,), jnp.float32)
        acc, _ = jax.lax.fori_loop(0, ITERS, body, (acc, key0))
        return table, acc
    return run


def main():
    rng = np.random.default_rng(0)
    key0 = jnp.asarray(rng.integers(1, 2**31, B + 8, dtype=np.int64)
                       .astype(np.uint32))
    for label, n, w in [("attr 1M x 8w (32 MB)", 1 << 20, 8),
                        ("node 124k x 96w (47 MB)", 123748, 96),
                        ("node 124k x 96w pow2idx", 131072, 96)]:
        tab = jnp.asarray(rng.standard_normal((n, w)).astype(np.float32))
        tab_half = tab.reshape(n * 2, w // 2)
        param = bench(loop(lambda t: t, tab, n), tab, key0)
        staged = bench(loop(lambda t: t.reshape(n, w), tab_half, n),
                       tab_half, key0)
        print(f"{label:26s} param {param*1e3:6.3f} ms/it "
              f"({param/B*1e9:5.2f} ns/row)   staged {staged*1e3:6.3f} "
              f"({staged/B*1e9:5.2f} ns/row)", flush=True)


if __name__ == "__main__":
    main()
