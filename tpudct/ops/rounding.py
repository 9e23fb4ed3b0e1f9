"""Rounding with CUDA `round()` semantics.

The reference quantizer is ``C = round(A / Q)`` (utils_kernels.cu:42) where
CUDA's ``round()`` rounds half away from zero.  ``jnp.round`` rounds half to
even (banker's rounding), which diverges on every exact .5 quotient — so the
framework has its own primitive.  This is gotcha #2 in SURVEY.md §7.
"""

from __future__ import annotations

import jax.numpy as jnp


def round_half_away(x):
    """Round to nearest integer, ties away from zero (CUDA round()).

    round_half_away(2.5) == 3, round_half_away(-2.5) == -3
    (jnp.round gives 2 and -2 respectively).

    Implemented as sign(x) * floor(|x| + 0.5) — branch-free, VPU-friendly,
    safe under jit and inside Pallas kernels.
    """
    return jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)
