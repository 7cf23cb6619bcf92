"""Counter-based PCG random number generation.

Implements the same PCG-hash generator the reference threads through its
megakernel (``Assets/Resources/util/random.hlsl:5-16``) as a *pure function of
carried state*: every stage of the wavefront integrator takes a ``(B,)``
``uint32`` state array and returns the advanced state, so renders are
bit-reproducible regardless of how rays are re-batched or sharded across
chips.  Seeding matches the reference dispatch
(``PathTracer.compute:60``): ``state = pixel_index * (sample + 1) + seed_root``.
"""

from __future__ import annotations

import jax.numpy as jnp

_U32 = jnp.uint32


def seed(pixel_index: jnp.ndarray, sample_index: jnp.ndarray, seed_root) -> jnp.ndarray:
    """Per-ray RNG state, reference-compatible (``PathTracer.compute:60``)."""
    pixel_index = pixel_index.astype(_U32)
    sample_index = jnp.asarray(sample_index).astype(_U32)
    seed_root = jnp.asarray(seed_root).astype(_U32)
    return pixel_index * (sample_index + _U32(1)) + seed_root


def next_state(state: jnp.ndarray) -> jnp.ndarray:
    """One PCG step (``random.hlsl:5-10``). uint32 wrap-around arithmetic."""
    state = state.astype(_U32)
    old = state + _U32(747796405) + _U32(2891336453)
    shift = (old >> _U32(28)) + _U32(4)
    word = ((old >> shift) ^ old) * _U32(277803737)
    return (word >> _U32(22)) ^ word


def random_float(state: jnp.ndarray):
    """Advance state and return uniform float32 in [0, 1] (``random.hlsl:12-16``).

    Returns ``(u, new_state)``.
    """
    state = next_state(state)
    u = state.astype(jnp.float32) * jnp.float32(1.0 / 4294967295.0)
    return u, state


def random_floats(state: jnp.ndarray, n: int):
    """Draw ``n`` sequential uniforms; returns ``(list_of_u, new_state)``."""
    us = []
    for _ in range(n):
        u, state = random_float(state)
        us.append(u)
    return us, state
