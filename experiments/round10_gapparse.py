"""Full kernel-class breakdown of an existing xprof trace (CPU-only parse).

Aggregates the TensorCore track of the newest trace under PROF_DIR
(default /tmp/prof_gaps) and prints every kernel >= 0.5% of busy time,
plus a grouped view (pallas body / sorts / fusions / rest) normalized to
per-super-iteration cost (SUPERS env, default counted from body.* reps).

Run: python experiments/round10_gapparse.py
"""

import collections
import glob
import gzip
import json
import os

OUT = os.environ.get("PROF_DIR", "/tmp/prof_gaps")

tj = sorted(glob.glob(os.path.join(OUT, "**", "*.trace.json.gz"),
                      recursive=True), key=os.path.getmtime)
assert tj, f"no trace under {OUT}"
with gzip.open(tj[-1], "rt") as f:
    trace = json.load(f)
events = trace["traceEvents"]
pids = {}
tracks = collections.defaultdict(list)
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pids[e["pid"]] = e["args"].get("name", "")
    elif e.get("ph") == "X":
        tracks[(e["pid"], e.get("tid"))].append(e)
best, best_dur = None, 0.0
for k, evs in tracks.items():
    name = pids.get(k[0], "")
    if "TPU" not in name and "Tensor" not in name and "/device" not in name:
        continue
    d = sum(e.get("dur", 0) for e in evs)
    if d > best_dur:
        best, best_dur = k, d
evs = sorted(tracks[best], key=lambda e: e["ts"])
t_lo = evs[0]["ts"] + 0.2 * (evs[-1]["ts"] - evs[0]["ts"])
t_hi = evs[0]["ts"] + 0.8 * (evs[-1]["ts"] - evs[0]["ts"])
mid = [e for e in evs if t_lo <= e["ts"] <= t_hi]
busy = sum(e["dur"] for e in mid)

by_k = collections.defaultdict(float)
cnt_k = collections.Counter()
for e in mid:
    by_k[e["name"]] += e["dur"]
    cnt_k[e["name"]] += 1

# supers in window = median rep count of the pallas bodies
body_reps = [cnt_k[n] for n in by_k if n.startswith("body.")]
supers = sorted(body_reps)[len(body_reps) // 2] if body_reps else 1
print(f"steady window busy {busy/1e3:.1f} ms, ~{supers} supers "
      f"-> {busy/1e3/supers:.2f} ms/super")

print(f"\nall kernels >= 0.3% of busy ({len(by_k)} distinct):")
rows = sorted(by_k.items(), key=lambda kv: -kv[1])
acc = 0.0
for n, d in rows:
    if d < 0.003 * busy:
        break
    acc += d
    print(f"  {d/1e3:8.2f} ms {d/busy*100:5.1f}%  n={cnt_k[n]:5d} "
          f"avg {d/cnt_k[n]:7.1f} us  {d/1e3/supers:7.3f} ms/super  {n[:60]}")
print(f"  (listed = {acc/busy*100:.1f}% of busy)")


def cls(n):
    if n.startswith("body"):
        return "pallas arrival"
    if "sort" in n:
        return "sort"
    if n.startswith(("dynamic-update-slice", "copy", "slice", "pad")):
        return "copies/slices/pads"
    if n.startswith(("fusion", "input_fusion", "loop_fusion")):
        return "fusion (unnamed)"
    if "gather" in n or "dynamic-slice" in n:
        return "gather"
    return "other"


by_c = collections.defaultdict(float)
for n, d in by_k.items():
    by_c[cls(n)] += d
print("\nby class (ms/super):")
for c, d in sorted(by_c.items(), key=lambda kv: -kv[1]):
    print(f"  {d/1e3/supers:8.3f} ms/super {d/busy*100:5.1f}%  {c}")
