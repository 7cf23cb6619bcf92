"""Round-18: per-kernel anatomy of the fused pass with the Pallas
transition kernel ON vs OFF (env PTRANS=1/0).

Same xprof methodology as round8_gaps.py / the round-16 anatomy: trace one
short production-shaped pass, take the steady middle 60% of the TensorCore
track, and report busy totals by kernel.  The question this answers: where
did the expected transition win go — is the Mosaic kernel itself slower
than XLA's ~30 shading fusions, or do the (B,3)<->(3,B) plane transposes /
relayouts around the pallas_call eat it?

Run: PYTHONPATH=/root/repo:/root/.axon_site PTRANS=1 python experiments/round18_ptrans_trace.py
Env: TE (default 8), SPP (2), POOL (98304), PTRANS (1).
"""

import collections
import glob
import gzip
import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

TE = int(os.environ.get("TE", 8))
SPP = int(os.environ.get("SPP", 2))
POOL = int(os.environ.get("POOL", 3 << 15))
PTRANS = os.environ.get("PTRANS", "1") == "1"
OUT = os.environ.get("PROF_DIR", "/tmp/prof_ptrans")

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
os.environ.setdefault(
    "UWPT_BVH_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".bvh_cache"))

from unity_webgpu_pathtracer_tpu.config import SKY_MODE_ENVIRONMENT, RenderConfig  # noqa: E402
from unity_webgpu_pathtracer_tpu.models.benchmark import million_triangle_scene  # noqa: E402
from unity_webgpu_pathtracer_tpu.render.camera import make_camera_params  # noqa: E402
from unity_webgpu_pathtracer_tpu.render.fused import fused_pass_with_stats  # noqa: E402


def main():
    scene, cam = million_triangle_scene(1_000_000)
    sd = scene.build("wide16")
    config = RenderConfig(
        width=1920, height=1080, samples_per_pass=SPP, max_bounces=5,
        traversal="wide16", sky_mode=SKY_MODE_ENVIRONMENT,
        has_environment_texture=True, use_russian_roulette=True,
        integrator="fused", pool_size=POOL, transition_every=TE,
        use_prestep=True, use_pallas_arrival=True,
        use_pallas_transition=PTRANS, attr_compact=2,
    )
    params = make_camera_params(width=1920, height=1080, **cam)

    @jax.jit
    def one_pass(sd, params):
        film, occ, rays, arrivals = fused_pass_with_stats(
            sd, config, params, 0, pool_size=POOL)
        return film.sum(), occ, rays, arrivals

    import dataclasses as _dc

    def ws(i):
        return _dc.replace(params, seed_root=jnp.uint32(0xABCD + i))

    r = one_pass(sd, ws(0))
    print("warm:", [float(np.asarray(x)) for x in r], flush=True)
    t0 = time.perf_counter()
    r = one_pass(sd, ws(1))
    v = [float(np.asarray(x)) for x in r]
    wall = time.perf_counter() - t0
    print(f"pass: {wall:.2f} s (ptrans={PTRANS}, te={TE}, spp={SPP}, "
          f"pool={POOL}) out={v}", flush=True)

    os.makedirs(OUT, exist_ok=True)
    with jax.profiler.trace(OUT):
        out = one_pass(sd, ws(2))
        _ = [float(np.asarray(x)) for x in out]

    tj = sorted(glob.glob(os.path.join(OUT, "**", "*.trace.json.gz"),
                          recursive=True), key=os.path.getmtime)
    if not tj:
        print("no trace.json.gz")
        return
    with gzip.open(tj[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    pids = {}
    tracks = collections.defaultdict(list)
    for e in events:
        ph = e.get("ph")
        if ph == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
        elif ph == "X":
            tracks[(e["pid"], e.get("tid"))].append(e)
    best, best_dur = None, 0.0
    for k, evs in tracks.items():
        name = pids.get(k[0], "")
        if "TPU" not in name and "Tensor" not in name and "/device" not in name:
            continue
        d = sum(e.get("dur", 0) for e in evs)
        if d > best_dur:
            best, best_dur = k, d
    if best is None:
        best = max(tracks, key=lambda k: sum(e.get("dur", 0) for e in tracks[k]))
    evs = sorted(tracks[best], key=lambda e: e["ts"])
    print(f"track {best} ({pids.get(best[0], '?')}): {len(evs)} events, "
          f"busy {sum(e['dur'] for e in evs)/1e3:.1f} ms")

    t_lo = evs[0]["ts"] + 0.2 * (evs[-1]["ts"] - evs[0]["ts"])
    t_hi = evs[0]["ts"] + 0.8 * (evs[-1]["ts"] - evs[0]["ts"])
    mid = [e for e in evs if t_lo <= e["ts"] <= t_hi]
    span = mid[-1]["ts"] + mid[-1]["dur"] - mid[0]["ts"]
    busy = sum(e["dur"] for e in mid)
    print(f"steady window: span {span/1e3:.1f} ms, busy {busy/1e3:.1f} ms, "
          f"idle {(span-busy)/1e3:.1f} ms ({(span-busy)/span*100:.1f}%)")

    # Super-iteration count in the window: arrivals per super = TE, so
    # count the Pallas arrival kernels and divide.
    by_k = collections.defaultdict(float)
    cnt_k = collections.Counter()
    for e in mid:
        by_k[e["name"]] += e["dur"]
        cnt_k[e["name"]] += 1
    arr_kernels = [n for n in by_k if "arrival" in n.lower()]
    n_arr = sum(cnt_k[n] for n in arr_kernels)
    n_super = max(n_arr // TE, 1)
    print(f"supers in window: ~{n_super} ({n_arr} arrival kernels / te={TE})")
    print("busy totals by kernel (per-super avg in last col):")
    for n, d in sorted(by_k.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {d/1e3:8.2f} ms  n={cnt_k[n]:5d}  avg {d/cnt_k[n]:7.1f} us  "
              f"per-super {d/n_super:7.1f} us  {n[:60]}")
    print(f"distinct kernels in window: {len(by_k)}")


if __name__ == "__main__":
    main()
