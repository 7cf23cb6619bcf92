"""Dual independent chains: can XLA overlap two serial gather chains?

The round-4 bisection showed the super-iteration is dominated by per-op
fixed costs on a SERIAL dependency chain (10 arrivals = 39.5 ms while no
transition stage matters). If two independent half-pools are traced in the
same body, the scheduler may overlap chain A's gather latency with chain
B's decode — the classic latency-hiding duality, expressed purely as two
independent subgraphs.

Configs (all at matched total lanes where relevant):
  single-262k      one chain, pool 262k     (baseline)
  single-524k      one chain, pool 524k     (amortization control)
  dual-262k        two chains, 262k each    (the experiment)
  quad-131k        four chains, 131k each

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/round4_dual.py
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import round4_trav_ab as AB  # noqa: E402

ITERS = int(os.environ.get("AB_ITERS", 12))
TE = int(os.environ.get("PROBE_TE", 10))


def run_multi(n_chains, pool_each, te=TE, trav="wide8"):
    setups = [AB.make_setup(trav, te, pool_each, sample_base=97 * i)
              for i in range(n_chains)]
    bodies = [b for b, _ in setups]
    s0s = tuple(s for _, s in setups)

    def body_all(ss):
        return tuple(b(s) for b, s in zip(bodies, ss))

    @jax.jit
    def warm(ss):
        return jax.lax.fori_loop(0, 40, lambda i, ss: body_all(ss), ss)

    sw = warm(s0s)
    np.asarray(sw[0].queue_head)

    def loop(ss, iters):
        return jax.lax.fori_loop(0, iters, lambda i, ss: body_all(ss), ss)

    f = jax.jit(loop, static_argnums=(1,))
    out = f(sw, ITERS)
    np.asarray(out[0].queue_head)
    t0 = time.perf_counter()
    out = f(sw, ITERS)
    q1 = sum(int(np.asarray(s.queue_head)) for s in out)
    dt = time.perf_counter() - t0
    q0 = sum(int(np.asarray(s.queue_head)) for s in sw)
    rate = (q1 - q0) / dt
    print(f"{n_chains}x{pool_each>>10}k te={te:2d}: {dt/ITERS*1e3:7.2f} ms/iter, "
          f"{(q1-q0)//ITERS:7d} deaths/iter, {rate/1e3:8.1f} ksamples/s",
          flush=True)
    return rate


def main():
    results = {}
    for n, pool in [(1, 1 << 18), (2, 1 << 18), (4, 1 << 17), (2, 1 << 17),
                    (1, 1 << 18)]:
        results[f"{n}x{pool}"] = run_multi(n, pool)
    best = max(results, key=results.get)
    print(f"\nbest: {best} ({results[best]/1e3:.1f} ksamples/s)")


if __name__ == "__main__":
    main()
