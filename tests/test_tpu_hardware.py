"""Hardware-gated TPU checks (VERDICT r4 item 8): a perf-regression
tripwire and a TPU golden smoke.

The suite's conftest pins the in-process backend to CPU, so both tests
drive SUBPROCESSES with the TPU backend.  They are opt-in — set
``UWPT_TPU_TESTS=1`` on a host with a live TPU (see docs/API.md runbook):

    UWPT_TPU_TESTS=1 python -m pytest tests/test_tpu_hardware.py -v

* ``test_tpu_perf_tripwire`` runs ``BENCH_SMALL=1 bench.py`` and asserts
  >= TRIPWIRE_FRACTION of the recorded per-config constant in
  ``tests/tpu_perf_baseline.json`` — the guard VERDICT r4 asked for after
  the attr_carry incident showed one XLA layout decision can silently
  cost 10% (docs/PERFORMANCE.md round-15).
* ``test_tpu_golden_smoke`` renders the "brdf" golden scene ON TPU with
  the production Pallas kernels and checks its film's global mean against
  the CPU fixture's calibrated global-mean gate — the first golden
  statistic computed from a hardware render (closes the parity-chain gap
  in VERDICT r4 weak #6).
"""

import json
import os
import subprocess
import sys

import pytest

_GATED = os.environ.get("UWPT_TPU_TESTS") != "1"
_REASON = "hardware-gated: set UWPT_TPU_TESTS=1 on a TPU host"
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_BASELINE_PATH = os.path.join(os.path.dirname(__file__),
                              "tpu_perf_baseline.json")
TRIPWIRE_FRACTION = 0.9


def _clean_env(**extra):
    """Subprocess env for TPU runs: undo the conftest's CPU pinning but
    KEEP any host-level platform selection (e.g. an out-of-tree TPU
    plugin selected via JAX_PLATFORMS — stripping it makes jax autodetect
    and fight the plugin's daemon for the device, which hangs)."""
    env = dict(os.environ)
    if env.get("JAX_PLATFORMS") == "cpu":
        del env["JAX_PLATFORMS"]
    flags = env.get("XLA_FLAGS", "")
    flags = " ".join(f for f in flags.split()
                     if "xla_force_host_platform_device_count" not in f)
    if flags:
        env["XLA_FLAGS"] = flags
    else:
        env.pop("XLA_FLAGS", None)
    env.update(extra)
    return env


@pytest.mark.skipif(_GATED, reason=_REASON)
def test_tpu_perf_tripwire():
    with open(_BASELINE_PATH) as f:
        baseline = json.load(f)
    rec = baseline["bench_small"]
    out = subprocess.run(
        [sys.executable, os.path.join(_REPO, "bench.py")],
        env=_clean_env(BENCH_SMALL="1"), cwd=_REPO,
        capture_output=True, text=True, timeout=1800)
    assert out.returncode == 0, out.stderr[-2000:]
    result = json.loads(out.stdout.strip().splitlines()[-1])
    floor = TRIPWIRE_FRACTION * rec["mrays"]
    assert result["value"] >= floor, (
        f"BENCH_SMALL regressed: {result['value']} Mrays/s < {floor:.2f} "
        f"(= {TRIPWIRE_FRACTION} x recorded {rec['mrays']}, "
        f"{rec['provenance']}) — find the layout/kernel change before the "
        "official bench does")


@pytest.mark.skipif(_GATED, reason=_REASON)
def test_tpu_golden_smoke():
    script = r"""
import json, os
import numpy as np
from tests.golden_common import (render_pass_means, load_golden,
                                 compare_to_golden, seed_roots,
                                 TEST_SEED_BASE)
import jax
assert jax.default_backend() == "tpu", jax.default_backend()
passes = render_pass_means(
    "brdf", seed_roots(TEST_SEED_BASE, 2),
    config_overrides=dict(use_pallas_arrival=True,
                          use_pallas_transition=True))
ok, stats = compare_to_golden(passes, "brdf")
print("GOLDEN_JSON " + json.dumps(dict(stats, ok=bool(ok))))
"""
    out = subprocess.run(
        [sys.executable, "-c", script],
        env=_clean_env(UWPT_GOLDEN_NATIVE_BACKEND="1"), cwd=_REPO,
        capture_output=True, text=True, timeout=1800)
    assert out.returncode == 0, (out.stderr[-2000:], out.stdout[-500:])
    line = [l for l in out.stdout.splitlines()
            if l.startswith("GOLDEN_JSON ")][-1]
    stats = json.loads(line[len("GOLDEN_JSON "):])
    # The contract is the GLOBAL-mean arm (TPU FMA contraction makes some
    # per-pixel ulp drift expected; the calibrated mean gate is the
    # radiometric check).  The full per-pixel verdict is reported too.
    assert stats["mean_shift_rel"] < stats["mean_gate"], stats
