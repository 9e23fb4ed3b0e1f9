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

    Branch-free compare form, safe under jit and inside Pallas kernels.
    NOT floor(|x| + 0.5): that rounds UP f32 values just below .5 whenever
    |x| + 0.5 lands on the next representable float (e.g. f32 0.49999997
    -> 1.0 where CUDA round() gives 0) — the compare never adds, so the
    equivalence contract 'differs from exact only at true .5 ties' holds.
    """
    a = jnp.abs(x)
    f = jnp.floor(a)
    return jnp.sign(x) * (f + (a - f >= 0.5).astype(a.dtype))
