"""Round-18 probe (VERDICT r4 item 3): VMEM-resident upper tree.

The proposal: pin BVH levels ~3 (4096 wide16 rows x 384 B = 1.5 MB — the
deepest level that fits VMEM; level 4 is 25 MB) inside the arrival kernel
and fetch each lane's row WITHOUT the HBM gather.  Mosaic has no per-lane
dynamic gather from a VMEM array, so the only in-kernel fetch mechanisms
are:

* per-row DMA — measured 35-50 ns/row in round-4 (docs/PERFORMANCE.md
  round-4 finding 4): dead vs the 1.51 ns/row coherent XLA gather;
* a select chain — the 256-slot variant already measured ~2 ms
  (PERFORMANCE.md round-2 item: L3 prestep select chain): dead;
* a one-hot MXU matmul from the VMEM table — the variant this probe
  prices: onehot(B, 4096) @ table(4096, 96) in bf16.

Paper arithmetic says the matmul is dead too (77 GFLOP per arrival wave
at B=98k = 0.39 ms at peak bf16 vs the gather's 0.148 ms — and N=96 < 128
underfills the MXU), but the ceiling-2 argument in the round-17 roofline
leans on it, so measure rather than assert.  ns/lane reported; compare to
1.51 ns/row (gather) — and remember a real integration would also pay
exactness limbs (x3) and the row-source select.
"""

import functools
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 1 << 15          # lanes timed (one bench wave is 98k; rate scales)
ROWS = 4096          # level-3 table
COLS = 96            # wide16 row width
BLK = 1024           # lanes per grid step (onehot block = BLK x ROWS bf16);
                     # 1024 matches XLA's T(1024) layout for s32[B] operands
ITERS = 50


def kernel(idx_ref, table_ref, o_ref):
    idx = idx_ref[:]                                   # (BLK,)
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (BLK, ROWS), 1)
              == idx[:, None]).astype(jnp.bfloat16)
    rows = jnp.dot(onehot, table_ref[:],
                   preferred_element_type=jnp.float32)  # (BLK, COLS)
    o_ref[:] = rows


def main():
    print("backend:", jax.default_backend())
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (B,), 0, ROWS, jnp.int32)
    table = jax.random.uniform(jax.random.PRNGKey(1), (ROWS, COLS),
                               jnp.bfloat16)

    call = pl.pallas_call(
        kernel,
        grid=(B // BLK,),
        in_specs=[
            pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, COLS), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLK, COLS), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, COLS), jnp.float32),
    )

    @jax.jit
    def loop(idx, table):
        def body(i, acc):
            r = call((idx + i) % ROWS, table)
            return acc + r[0, 0]
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    # XLA HBM-gather reference on the same shapes.
    table32 = table.astype(jnp.float32)

    @jax.jit
    def loop_gather(idx, table32):
        def body(i, acc):
            r = table32[(idx + i) % ROWS]
            return acc + r[0, 0]
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    for name, fn, args in [("onehot-mxu-vmem", loop, (idx, table)),
                           ("xla-gather", loop_gather, (idx, table32))]:
        r = fn(*args)
        _ = np.asarray(r)
        t0 = time.perf_counter()
        _ = np.asarray(fn(*args))
        dt = time.perf_counter() - t0
        print(f"{name:18s}: {dt*1e3:7.2f} ms / {ITERS} x {B} lanes = "
              f"{dt/(ITERS*B)*1e9:.3f} ns/lane-row")

    # Correctness spot check (one call).
    out = call(idx, table)
    ref = table32[idx]
    ok = np.allclose(np.asarray(out), np.asarray(ref), atol=0, rtol=0)
    print("exact rows:", bool(ok))


if __name__ == "__main__":
    main()
