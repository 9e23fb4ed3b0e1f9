"""Quantization, dequantization and zonal coefficient retention.

Reference semantics:
  quantize:   C = round(A / Q[ty, tx])   per in-block position
              (divide_matrices, utils_kernels.cu:34-44; CUDA round() is
              half-away-from-zero — see tpudct.ops.rounding)
  dequantize: C = A * Q[ty, tx]          (multiply_matrices, utils_kernels.cu:47-57)

NOTE deliberately not replicated: main.cu:399-409 contains an inline variant
indexing ``B[tx*dim+ty]`` (transposed Q) — a latent inconsistency in the
legacy sandbox file, not the shipped behavior.

Retention: the README's k=6..10 accuracy sweep (README.md:62-69) has no code
in the reference (computed externally).  Here it is a zonal (anti-diagonal)
mask applied to quantized coefficients: keep (u, v) iff u + v < k.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from tpudct.constants import BLOCK_SIZE, Q
from tpudct.ops.blocks import as_block_grid, from_block_grid
from tpudct.ops.rounding import round_half_away


def _q_for(x, q_scale: float):
    return jnp.asarray(Q * np.float32(q_scale), x.dtype)


def quantize(y, q_scale: float = 1.0):
    """round_half_away(Y / Q) with Q broadcast per 8x8 block position."""
    g = as_block_grid(y)
    q = _q_for(y, q_scale)
    return from_block_grid(round_half_away(g / q.reshape(1, BLOCK_SIZE, 1, BLOCK_SIZE)))


def dequantize(c, q_scale: float = 1.0):
    """C * Q, exact inverse scaling of :func:`quantize`'s division."""
    g = as_block_grid(c)
    q = _q_for(c, q_scale)
    return from_block_grid(g * q.reshape(1, BLOCK_SIZE, 1, BLOCK_SIZE))


def retention_mask(k: int | None, bs: int = BLOCK_SIZE) -> np.ndarray:
    """Zonal mask: keep coefficient (u, v) iff u + v < k. k=None keeps all."""
    if k is None:
        return np.ones((bs, bs), dtype=np.float32)
    u = np.arange(bs)[:, None]
    v = np.arange(bs)[None, :]
    return ((u + v) < k).astype(np.float32)


def apply_retention(c, k: int | None):
    """Zero out truncated coefficients in an (H, W) quantized-coefficient map."""
    if k is None:
        return c
    m = jnp.asarray(retention_mask(k), c.dtype)
    g = as_block_grid(c)
    return from_block_grid(g * m.reshape(1, BLOCK_SIZE, 1, BLOCK_SIZE))
