"""Film-splat alternatives, measured in-loop on TPU.

The film scatter-add costs 10.35 ms/iter in the production loop (~40
ns/update at B=262k into a 2.07M-row film) and out-of-bounds routing of
the ~84% dead updates did NOT reduce it.  Candidates:

  add-oob      current production form (baseline)
  add-all      every lane in-bounds random (dup pileup at 0 removed)
  set-oob      .set instead of .add (no read-modify-write)
  add-sorted   sorted indices (queue-order locality, the real pattern)
  add-65k      quarter-size update batch (fixed vs marginal cost)
  outbox       select-chain into a (B,4,4) per-lane outbox (the staged
               alternative's per-iteration cost, drain excluded)
  drain-1m     the amortized drain: 1M updates every 4 iters

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/round5_splat.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

B = 1 << 18
NPIX = 1920 * 1080


def timed(fn, *args, iters=16):
    f = jax.jit(fn, static_argnums=(len(args),))
    out = f(*args, iters)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    out = f(*args, iters)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters


def main():
    key = np.random.default_rng(0)
    rad = jnp.asarray(key.random((B, 3), np.float32))
    film0 = jnp.zeros((NPIX, 3), jnp.float32)
    died = key.random(B) < 0.16
    pix_r = key.integers(0, NPIX, B).astype(np.int32)

    def loop(film, pix, op, iters):
        def one(i, film):
            p = (pix + i) % np.int32(NPIX + 1)
            if op == "set":
                return film.at[p].set(rad + film[0, 0] * 1e-20)
            return film.at[p].add(rad + film[0, 0] * 1e-20)
        return jax.lax.fori_loop(0, iters, one, film)

    cases = {
        "add-oob (production)": jnp.asarray(np.where(died, pix_r, NPIX)),
        "add-all-random": jnp.asarray(pix_r),
        "add-sorted": jnp.asarray(np.sort(np.where(died, pix_r, NPIX))),
    }
    for name, pix in cases.items():
        ms = timed(lambda f, p, it: loop(f, p, "add", it), film0, pix)
        print(f"{name:24s} {ms*1e3:7.2f} ms/iter")
    ms = timed(lambda f, p, it: loop(f, p, "set", it), film0,
               jnp.asarray(np.where(died, pix_r, NPIX)))
    print(f"{'set-oob':24s} {ms*1e3:7.2f} ms/iter")

    # quarter batch
    pq = jnp.asarray(np.where(died[: B // 4], pix_r[: B // 4], NPIX))
    rq = rad[: B // 4]

    def loop_q(film, pix, iters):
        def one(i, film):
            p = (pix + i) % np.int32(NPIX + 1)
            return film.at[p].add(rq + film[0, 0] * 1e-20)
        return jax.lax.fori_loop(0, iters, one, film)

    ms = timed(loop_q, film0, pq)
    print(f"{'add-oob-65k':24s} {ms*1e3:7.2f} ms/iter")

    # outbox write: (B, K, 4) select-chain update at per-lane write index
    K = 4
    outbox0 = jnp.zeros((B, K, 4), jnp.float32)
    widx0 = jnp.asarray(key.integers(0, K, B, dtype=np.int32))
    rec = jnp.concatenate([rad, jnp.asarray(pix_r, jnp.float32)[:, None]], 1)

    def loop_o(outbox, widx, iters):
        def one(i, carry):
            outbox, widx = carry
            sel = (jnp.arange(K, dtype=jnp.int32)[None, :] == widx[:, None])
            outbox = jnp.where(sel[..., None], rec[:, None, :], outbox)
            return outbox, (widx + 1) % K
        return jax.lax.fori_loop(0, iters, one, (outbox, widx0))

    ms = timed(loop_o, outbox0, widx0)
    print(f"{'outbox write (K=4)':24s} {ms*1e3:7.2f} ms/iter")

    # amortized drain: 4B updates every 4 iters -> report per-iter share
    pix4 = jnp.asarray(np.where(np.tile(died, 4), np.tile(pix_r, 4), NPIX))
    rad4 = jnp.tile(rad, (4, 1))

    def loop_d(film, pix, iters):
        def one(i, film):
            p = (pix + i) % np.int32(NPIX + 1)
            return film.at[p].add(rad4 + film[0, 0] * 1e-20)
        return jax.lax.fori_loop(0, iters, one, film)

    ms = timed(loop_d, film0, pix4, iters=8)
    print(f"{'drain-1M (/4 = amort)':24s} {ms*1e3:7.2f} ms/iter "
          f"-> {ms*1e3/4:5.2f} ms amortized")


if __name__ == "__main__":
    main()
