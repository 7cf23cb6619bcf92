"""RNG tests: exact PCG semantics + statistical uniformity.

The generator must match the reference's PCG (``random.hlsl:5-16``) so seeds
reproduce the same sample streams.
"""

import jax.numpy as jnp
import numpy as np

from unity_webgpu_pathtracer_tpu.utils import rng


def _pcg_numpy(state: np.uint32) -> np.uint32:
    """Independent numpy model of random.hlsl:5-10."""
    with np.errstate(over="ignore"):
        old = np.uint32(state + np.uint32(747796405) + np.uint32(2891336453))
        shift = np.uint32((old >> np.uint32(28)) + np.uint32(4))
        word = np.uint32(np.uint32(old >> shift) ^ old) * np.uint32(277803737)
        word = np.uint32(word)
        return np.uint32((word >> np.uint32(22)) ^ word)


def test_next_state_matches_scalar_model():
    states = np.array([0, 1, 42, 0xDEADBEEF, 0xFFFFFFFF, 123456789], dtype=np.uint32)
    got = np.asarray(rng.next_state(jnp.asarray(states)))
    want = np.array([_pcg_numpy(s) for s in states], dtype=np.uint32)
    np.testing.assert_array_equal(got, want)


def test_seed_formula():
    # state = pixelIndex * (sample+1) + seedRoot (PathTracer.compute:60)
    s = rng.seed(jnp.asarray([3, 5], dtype=jnp.uint32), 7, 11)
    np.testing.assert_array_equal(np.asarray(s), np.array([3 * 8 + 11, 5 * 8 + 11], dtype=np.uint32))


def test_random_float_range_and_uniformity():
    state = jnp.arange(50_000, dtype=jnp.uint32)
    u, state2 = rng.random_float(state)
    u = np.asarray(u)
    assert u.min() >= 0.0 and u.max() <= 1.0
    assert abs(u.mean() - 0.5) < 5e-3
    assert abs(np.var(u) - 1.0 / 12.0) < 1e-3
    # State advances.
    assert not np.array_equal(np.asarray(state2), np.asarray(state))


def test_sequential_streams_decorrelated():
    state = jnp.zeros((10_000,), dtype=jnp.uint32) + jnp.arange(10_000, dtype=jnp.uint32)
    (u1, u2), _ = rng.random_floats(state, 2)
    c = np.corrcoef(np.asarray(u1), np.asarray(u2))[0, 1]
    assert abs(c) < 0.03
