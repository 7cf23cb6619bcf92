"""Round-2 measurement campaign (real TPU, axon).

Run:  python experiments/round2_probe.py <section>
Sections: xla_gather | dma_gather | vmem_gather | shade | shade2d

All timings follow the axon trap rules (docs/PERFORMANCE.md): the op under
test is looped ON DEVICE inside fori_loop with a data dependency between
iterations, and the clock is read only after np.asarray of the output.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

SECTION = sys.argv[1] if len(sys.argv) > 1 else "all"


def timed(fn, *args, iters=16, warmup=1):
    """Compile fn(*args) at the SAME static iters (a different iters is a
    different program — round-2 harness bug burned an hour on this), warm
    up, then time on-device."""
    f = jax.jit(fn, static_argnums=(len(args),))
    t0 = time.perf_counter()
    out = f(*args, iters)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = f(*args, iters)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    per_iter = (time.perf_counter() - t0) / iters
    return per_iter, compile_s


# ---------------------------------------------------------------- xla_gather
def xla_gather():
    """Fixed vs marginal XLA gather cost: rows (B,) from (N, W) f32 table."""
    print("== XLA gather: ms/op vs table size, B, row width ==")
    for B in (65536, 262144):
        for W in (12, 48):
            for mb in (1, 8, 24, 87):
                N = int(mb * 1e6 / (W * 4))
                table = jnp.arange(N * W, dtype=jnp.float32).reshape(N, W) % 7.0
                idx0 = jnp.arange(B, dtype=jnp.int32) * np.int32(-1640531527) % N

                def step(table, idx0, iters):
                    def body(i, idx):
                        row = table[idx]
                        # serialize: next idx depends on gathered data
                        return (
                            idx
                            + jax.lax.bitcast_convert_type(row[:, 0], jnp.int32)
                            % 97
                        ) % N
                    return jax.lax.fori_loop(0, iters, body, idx0)

                ms, cs = timed(step, table, idx0, iters=16)
                print(
                    f"B={B:7d} W={W:2d} ({W*4:3d}B) table={mb:3d}MB N={N:8d}"
                    f"  {ms*1e3:7.2f} ms/op  {ms*1e9/B:6.1f} ns/row"
                    f"  (compile {cs:.0f}s)"
                )


# ---------------------------------------------------------------- dma_gather
def dma_gather():
    """Pallas per-row DMA gather rate from an HBM table."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print("== Pallas per-row DMA gather (HBM -> VMEM) ==")
    W = 128          # floats per row (512 B) — last dim must be 128-aligned
    NSLOT = 16       # in-flight DMA slots

    for mb in (8, 87, 232):
        N = int(mb * 1e6 / (W * 4))
        for CHUNK in (1024, 8192):
            table = jnp.arange(N * W, dtype=jnp.float32).reshape(N, W) % 7.0
            idx = (jnp.arange(CHUNK, dtype=jnp.int32) * np.int32(-1640531527)) % N

            def kernel(idx_ref, table_ref, out_ref):
                # Pure DMA issue/wait loop: no VMEM reads on the scalar
                # critical path; one vector reduction at the end.
                def body(scratch, sem):
                    def issue(k):
                        pltpu.make_async_copy(
                            table_ref.at[idx_ref[k]],
                            scratch.at[k % NSLOT],
                            sem.at[k % NSLOT],
                        ).start()

                    for k in range(NSLOT):
                        issue(k)

                    def loop(k, carry):
                        pltpu.make_async_copy(
                            table_ref.at[idx_ref[k]],
                            scratch.at[k % NSLOT],
                            sem.at[k % NSLOT],
                        ).wait()

                        @pl.when(k + NSLOT < CHUNK)
                        def _():
                            issue_k = k + NSLOT
                            pltpu.make_async_copy(
                                table_ref.at[idx_ref[issue_k]],
                                scratch.at[issue_k % NSLOT],
                                sem.at[issue_k % NSLOT],
                            ).start()

                        return carry

                    jax.lax.fori_loop(0, CHUNK, loop, 0)
                    out_ref[:] = jnp.sum(scratch[:], axis=0, keepdims=True)

                pl.run_scoped(
                    body,
                    pltpu.VMEM((NSLOT, W), jnp.float32),
                    pltpu.SemaphoreType.DMA((NSLOT,)),
                )

            def gather_pallas(idx, table):
                return pl.pallas_call(
                    kernel,
                    out_shape=jax.ShapeDtypeStruct((1, W), jnp.float32),
                    in_specs=[
                        pl.BlockSpec(memory_space=pltpu.SMEM),
                        pl.BlockSpec(memory_space=pl.ANY),
                    ],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                )(idx, table)

            def step(table, idx, iters):
                def body(i, carry):
                    s = gather_pallas((idx + carry) % N, table)
                    return carry + s[0, 0].astype(jnp.int32) % 3
                return jax.lax.fori_loop(0, iters, body, jnp.int32(0))

            if True:  # keep the loop-variable closure happy
                pass

            try:
                ms, cs = timed(step, table, idx, iters=8)
                print(
                    f"table={mb}MB chunk={CHUNK}: {ms*1e3:8.3f} ms/chunk "
                    f"{ms*1e9/CHUNK:7.1f} ns/row (compile {cs:.0f}s)"
                )
            except Exception as e:  # noqa: BLE001
                print(f"table={mb}MB chunk={CHUNK}: FAILED {type(e).__name__}: {e}")
                break


# --------------------------------------------------------------- vmem_gather
def vmem_gather():
    """Pallas dynamic row indexing of a VMEM-resident table + capacity probe."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print("== Pallas VMEM-table dynamic indexing ==")
    W = 48
    for mb in (2, 8, 12, 16, 24):
        N = int(mb * 1e6 / (W * 4))
        CHUNK = 4096
        table = jnp.arange(N * W, dtype=jnp.float32).reshape(N, W) % 7.0
        idx = (jnp.arange(CHUNK, dtype=jnp.int32) * np.int32(-1640531527)) % N

        def kernel(idx_ref, table_ref, out_ref):
            def loop(k, acc):
                row = table_ref[idx_ref[k]]
                return acc + row[0]

            out_ref[0, 0] = jax.lax.fori_loop(0, CHUNK, loop, jnp.float32(0.0))

        def gather_pallas(idx, table):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            )(idx, table)

        def step(table, idx, iters):
            def body(i, carry):
                s = gather_pallas((idx + carry) % N, table)
                return carry + s[0, 0].astype(jnp.int32) % 3
            return jax.lax.fori_loop(0, iters, body, jnp.int32(0))

        try:
            ms, cs = timed(step, table, idx, iters=8)
            print(
                f"table={mb}MB in VMEM chunk={CHUNK}: {ms*1e3:8.3f} ms "
                f"{ms*1e9/CHUNK:7.1f} ns/row (compile {cs:.0f}s)"
            )
        except Exception as e:  # noqa: BLE001
            print(f"table={mb}MB in VMEM: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}")



def _fake_mat(sh):
    import numpy as np
    from unity_webgpu_pathtracer_tpu.scene.material import derive_material
    B = int(np.prod(sh))
    md = np.zeros((5, 32), np.float32)
    md[:, 0:4] = [0.7, 0.5, 0.3, 1.0]
    md[:, 8] = 0.3; md[:, 9] = 0.4; md[:, 11] = 1.5
    md[:, 22:27] = -1.0
    md[:, 28:30] = 1.0
    mdata = jnp.asarray(md)[jnp.arange(B, dtype=jnp.int32) % 5].reshape(*sh, 32)
    return mdata

# --------------------------------------------------------------------- shade
def shade():
    """XLA eval_brdf cost at (B,) vs Pallas transcendental-heavy math."""
    sys.path.insert(0, "/root/repo")
    from unity_webgpu_pathtracer_tpu.render import bsdf as ubsdf
    
    print("== shade probes ==")
    B = 262144
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    n = jax.random.normal(ks[0], (B, 3))
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    v = jax.random.normal(ks[1], (B, 3))
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    l = jax.random.normal(ks[2], (B, 3))
    l = l / jnp.linalg.norm(l, axis=-1, keepdims=True)
    from unity_webgpu_pathtracer_tpu.scene.material import derive_material
    mdata = _fake_mat((B,)).reshape(B, 32)
    mat = derive_material(mdata, jnp.zeros((B, 2)), -v, n)

    def step(mat, v, n, l, iters):
        def body(i, carry):
            f, pdf = ubsdf.eval_brdf(mat, v + carry * 0.0, n, l)
            return carry + jnp.sum(f) * 1e-30 + pdf[0] * 1e-30
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    ms, cs = timed(step, mat, v, n, l, iters=16)
    print(f"XLA eval_brdf B={B}: {ms*1e3:.2f} ms ({ms*1e9/B:.1f} ns/lane, "
          f"compile {cs:.0f}s)")


def shade_pallas():
    """Pallas straight-line transcendental-heavy math throughput."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = 262144
    R = B // 128
    x = jnp.linspace(0.1, 0.9, B).reshape(R, 128)

    def kernel(x_ref, o_ref):
        v = x_ref[:]
        acc = jnp.zeros_like(v)
        for i in range(40):
            # a schlick-ish block: ~12 flops + 1 pow-chain each
            w = 1.0 - v
            w2 = w * w
            f = w2 * w2 * w
            g = jnp.sqrt(jnp.abs(v * 0.9 + 0.05))
            acc = acc + f * g + v * (1.0 - f)
            v = jnp.abs(acc * 0.3 + 0.1) % 0.9 + 0.05
        o_ref[:] = acc

    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    def step(x, iters):
        def body(i, carry):
            return run(carry)
        return jax.lax.fori_loop(0, iters, body, x)

    ms, cs = timed(step, x, iters=16)
    print(f"Pallas 40-block math (~600 flops/lane) B={B}: {ms*1e3:.3f} ms "
          f"({ms*1e9/B:.2f} ns/lane, compile {cs:.0f}s)")


def shade2d():
    """XLA eval_brdf with 2-D (R,128)-shaped lanes instead of (B,)."""
    sys.path.insert(0, "/root/repo")
    from unity_webgpu_pathtracer_tpu.render import bsdf as ubsdf
    
    B = 262144
    R = B // 128
    sh = (R, 128)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)

    def nrm(k):
        a = jax.random.normal(k, (*sh, 3))
        return a / jnp.linalg.norm(a, axis=-1, keepdims=True)

    n, v, l = nrm(ks[0]), nrm(ks[1]), nrm(ks[2])
    from unity_webgpu_pathtracer_tpu.scene.material import derive_material
    mdata = _fake_mat(sh)
    mat = derive_material(mdata.reshape(-1, 32), jnp.zeros((B, 2)), -v.reshape(-1, 3), n.reshape(-1, 3))
    mat = jax.tree_util.tree_map(lambda a: a.reshape(*sh, *a.shape[1:]), mat)

    def step(mat, v, n, l, iters):
        def body(i, carry):
            f, pdf = ubsdf.eval_brdf(mat, v + carry * 0.0, n, l)
            return carry + jnp.sum(f) * 1e-30 + pdf[0, 0] * 1e-30
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    try:
        ms, cs = timed(step, mat, v, n, l, iters=16)
        print(f"XLA eval_brdf 2-D {sh}: {ms*1e3:.2f} ms ({ms*1e9/B:.1f} "
              f"ns/lane, compile {cs:.0f}s)")
    except Exception as e:  # noqa: BLE001
        print(f"2-D eval_brdf FAILED: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    print("devices:", jax.devices())
    if SECTION in ("xla_gather", "all"):
        xla_gather()
    if SECTION in ("dma_gather", "all"):
        dma_gather()
    if SECTION in ("vmem_gather", "all"):
        vmem_gather()
    if SECTION in ("shade", "all"):
        shade()
        shade_pallas()
    if SECTION in ("shade2d", "all"):
        shade2d()
