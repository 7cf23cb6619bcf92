"""Capture an xprof trace of the production super-iteration and print the
per-HLO-op time breakdown (the ground truth the stub-bisection could not
give: which kernels actually occupy the 72 ms).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/round4_profile.py
"""

import glob
import gzip
import json
import os
import sys

import numpy as np
import jax

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import round4_trav_ab as AB  # noqa: E402

TRAV = os.environ.get("PROBE_TRAV", "wide8")
TE = int(os.environ.get("PROBE_TE", 10))
POOL = int(os.environ.get("PROBE_POOL", 1 << 18))
OUT = os.environ.get("PROF_DIR", "/tmp/prof_super")


def main():
    body, s0 = AB.make_setup(TRAV, TE, POOL, pal=os.environ.get("PROBE_PAL", "0") == "1")

    @jax.jit
    def warm(s):
        return jax.lax.fori_loop(0, 40, lambda i, s: body(s), s)

    sw = warm(s0)
    np.asarray(sw.queue_head)

    def loop(s, iters):
        return jax.lax.fori_loop(0, iters, lambda i, s: body(s), s)

    f = jax.jit(loop, static_argnums=(1,))
    out = f(sw, 16)
    np.asarray(out.queue_head)

    os.makedirs(OUT, exist_ok=True)
    with jax.profiler.trace(OUT):
        out = f(sw, 16)
        np.asarray(out.queue_head)

    print("trace captured", flush=True)
    xs = glob.glob(os.path.join(OUT, "**", "*.xplane.pb"), recursive=True)
    print("xplane files:", xs)
    if not xs:
        return
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data as r2t
    except ImportError:
        from xprof.convert import raw_to_tool_data as r2t
    data, _ = r2t.xspace_to_tool_data(xs, "framework_op_stats", {})
    path = "/tmp/op_stats.json"
    if isinstance(data, bytes):
        data = data.decode()
    open(path, "w").write(data)
    print("wrote", path, "bytes", len(data))
    try:
        js = json.loads(data)
        print(type(js), list(js)[:5] if isinstance(js, dict) else len(js))
    except Exception as e:
        print("parse:", e, data[:400])


if __name__ == "__main__":
    main()
