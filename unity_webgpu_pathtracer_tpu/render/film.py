"""Film: progressive accumulation state + checkpoint/resume.

The reference keeps accumulation in ping-pong RenderTextures with a sample
counter and a ``Reset()`` on any invalidation (``PathTracer.cs:318-322``,
``PathTracer.compute:89-98``).  Here film state is an explicit pytree
``(accum, sample_count)`` — trivially checkpointable to disk and restorable
mid-accumulation, which the reference cannot do (SURVEY.md §5).
``accum`` stores the running *mean* radiance, like the reference RT.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class Film(NamedTuple):
    accum: jnp.ndarray          # (H, W, 3) running mean radiance
    sample_count: jnp.ndarray   # () int32 samples accumulated per pixel


def new_film(height: int, width: int, dtype=jnp.float32) -> Film:
    return Film(
        accum=jnp.zeros((height, width, 3), dtype),
        sample_count=jnp.asarray(0, jnp.int32),
    )


def accumulate(film: Film, pass_sum: jnp.ndarray, samples_in_pass) -> Film:
    """Progressive average update (``PathTracer.compute:89-98``).

    ``pass_sum`` is the *sum* of radiance over ``samples_in_pass`` new
    samples per pixel: mean' = (pass_sum + mean·n) / (n + s).
    """
    n = film.sample_count.astype(film.accum.dtype)
    s = jnp.asarray(samples_in_pass, film.accum.dtype)
    mean = (pass_sum + film.accum * n) / (n + s)
    return Film(accum=mean, sample_count=film.sample_count + jnp.asarray(samples_in_pass, jnp.int32))


def reset(film: Film) -> Film:
    """``PathTracer.Reset()`` analogue: zero the sample counter and film."""
    return Film(accum=jnp.zeros_like(film.accum), sample_count=jnp.zeros_like(film.sample_count))


def save(path: str, film: Film) -> None:
    np.savez(path, accum=np.asarray(film.accum), sample_count=np.asarray(film.sample_count))


def load(path: str) -> Film:
    data = np.load(path)
    return Film(
        accum=jnp.asarray(data["accum"]),
        sample_count=jnp.asarray(data["sample_count"]),
    )
