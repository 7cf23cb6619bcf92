"""Golden-image statistical regression tests (SURVEY.md §4).

Each builtin example scene has a committed fixture (tests/golden/*.npz:
per-pixel mean/std of 8 fixed-seed production-config passes, in both the
raw and log1p domains).  The test renders 2 FRESH passes under disjoint
seeds and applies the dual raw+log z-test (golden_common.dual_flags):
radiometric regressions that shift distributions (flipped MIS weight,
wrong lobe pdf, broken falloff) fire both arms on many pixels, while
Monte-Carlo fireflies — which explode the raw z on heavy-tailed pixels
even between two unbiased estimators — are absorbed by the log arm.
A >1% image-mean shift fails regardless (uniform-gain bugs).

Regenerate after INTENDED radiometric changes:
``python -m tests.golden_gen``.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from tests.golden_common import (
    SCENES,
    TEST_SEED_BASE,
    compare_to_golden,
    golden_path,
    load_golden,
    render_pass_means,
)


@pytest.mark.parametrize("name", SCENES)
def test_golden_regression(name):
    if not os.path.exists(golden_path(name)):
        # Fixtures are generated per-scene (~2 min each on CPU incl. the
        # megakernel cross-check); a partially-populated tests/golden/
        # directory means generation is still in flight — skip, don't
        # fail, so the rest of the suite's signal stays clean.
        pytest.skip(f"golden fixture for {name} not generated yet; run "
                    "python -m tests.golden_gen")
    passes = render_pass_means(name, [TEST_SEED_BASE, TEST_SEED_BASE + 1])
    ok, stats = compare_to_golden(passes, name)
    assert ok, (f"{name} drifted from golden: {stats} — if the change is "
                "an intended radiometric fix, regenerate with "
                "python -m tests.golden_gen")


def _perturbed_passes(g, scale_img):
    """Synthesize two 'passes' at the golden mean times a perturbation —
    zero internal variance, so any real shift must be caught."""
    m = g["mean"] * scale_img
    return np.stack([m, m])


def test_golden_detector_catches_radiometric_shift():
    """Meta-test: the dual z-test must FLAG a 10% regional brightening
    and a 5% global gain (typical MIS/pdf bug scale) on the Cornell
    fixture, while passing the fixture's own mean."""
    g = load_golden("cornell")

    ok_self, _ = compare_to_golden(_perturbed_passes(g, 1.0), "cornell")
    assert ok_self

    h = g["mean"].shape[0]
    scale = np.ones_like(g["mean"])
    scale[: h // 2] = 1.10
    ok_bright, stats_b = compare_to_golden(
        _perturbed_passes(g, scale), "cornell")
    assert not ok_bright, f"10% regional shift not detected: {stats_b}"

    ok_gain, stats_g = compare_to_golden(
        _perturbed_passes(g, 1.05), "cornell")
    assert not ok_gain, f"5% global gain not detected: {stats_g}"
