"""Price the (B,1) column-vector layout vs flat (B,) on TPU.

The round-16 trace shows many transition-tail fusions materializing
f32[98304,1]{0,1:T(1,128)} buffers (broadcast helpers like ``dot1`` /
``[..., None]`` keep per-lane scalars 2-D).  T(1,128) packs 128 lanes per
vreg row vs T(1024)'s 1024 — IF the fusion loop iterates per tile row,
(B,1) work runs at 1/8 VPU utilization.  This probe times an identical
8-op scalar chain through three shapes:

* flat    — (B,) arrays end to end
* col     — (B,1) arrays end to end (forced materialization via carry)
* mixed   — (B,) math but a (B,1) materialization each step (the [:, None]
            -> next-op pattern)

Each step's output feeds the carry so nothing folds away.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/round16_b1_layout_probe.py
Env: B (default 98304), ITERS (default 200), CHAIN (default 16).
"""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

B = int(os.environ.get("B", 98304))
ITERS = int(os.environ.get("ITERS", 200))
CHAIN = int(os.environ.get("CHAIN", 16))


def step_math(x, y):
    # 8 elementwise ops — a miniature of a transition-tail fusion.
    z = x * y + 1.5
    z = jnp.maximum(z, 0.25) * jnp.where(z > 1.0, 0.5, 2.0)
    z = z - x * 0.125
    return z / (jnp.abs(y) + 1.0)


def run(mode):
    if mode == "col":
        x0 = jnp.ones((B, 1), jnp.float32)
        y0 = jnp.full((B, 1), 0.5, jnp.float32)
    else:
        x0 = jnp.ones((B,), jnp.float32)
        y0 = jnp.full((B,), 0.5, jnp.float32)

    @jax.jit
    def loop(x, y):
        def body(i, carry):
            x, y = carry
            for _ in range(CHAIN):
                z = step_math(x, y)
                if mode == "mixed":
                    # materialize as a column, then flatten back — the
                    # [:, None] handoff pattern.
                    z = z[:, None]
                    z = jax.lax.optimization_barrier(z)
                    z = z[:, 0]
                else:
                    z = jax.lax.optimization_barrier(z)
                x, y = y, z
            return x, y
        return jax.lax.fori_loop(0, ITERS, body, (x, y))

    out = loop(x0, y0)
    _ = np.asarray(out[0])
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = loop(x0, y0)
        _ = np.asarray(out[0])
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    per = best / (ITERS * CHAIN)
    print(f"{mode:6s}: {per * 1e6:8.3f} us/step ({per / B * 1e12:6.2f} ps/lane)",
          flush=True)
    return per


def main():
    print(f"B={B} ITERS={ITERS} CHAIN={CHAIN}")
    f = run("flat")
    run("flat")
    c = run("col")
    m = run("mixed")
    print(f"  -> col/flat = {c / f:.2f}x, mixed/flat = {m / f:.2f}x")


if __name__ == "__main__":
    main()
