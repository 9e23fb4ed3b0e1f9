"""Blockwise 2-D transform and level shift.

Semantics (identical across all four reference pipelines):
  forward:  Y_b = T @ (X_b - 128) @ T.T        (e.g. main_newAppr.cu:177-211)
  inverse:  X_b = T.T @ Y_b @ T + 128          (main_newAppr.cu:220-250)
  output:   clamp to [0, 255], cast to uint8    (convertToUnsignedChar, utils.cu:18-24)

T is orthogonal, so the inverse uses the transpose exactly.  The whole-image
formulation here operates on the (H//8, 8, W//8, 8) block-grid view: one
einsum = one batched MXU contraction over every block, the TPU-native
replacement for both the per-block GEMM loop (main_cublass.cu:225-243) and
the block-diagonal whole-image GEMM (main_cublass_2.cu:228-235).
"""

from __future__ import annotations

import jax.numpy as jnp

from tpudct.constants import LEVEL_SHIFT, T
from tpudct.ops.blocks import as_block_grid, from_block_grid


def level_shift(x):
    """x - 128 (sub_matrix_scalar, utils_kernels.cu:8-18)."""
    return x - jnp.asarray(LEVEL_SHIFT, x.dtype)


def level_unshift(x):
    """x + 128 (add_matrix_scalar, utils_kernels.cu:21-31)."""
    return x + jnp.asarray(LEVEL_SHIFT, x.dtype)


def to_uint8(x):
    """Clamp [0,255] and cast (convertToUnsignedChar, utils.cu:18-24)."""
    return jnp.clip(round_free(x), 0.0, 255.0).astype(jnp.uint8)


def round_free(x):
    # The reference casts with C truncation after clamp (utils.cu:22:
    # `(unsigned char)value` truncates); matching that exactly.
    return jnp.trunc(x)


def dct2_blocks(x, t=None):
    """Forward blockwise transform on an (H, W) image (no level shift/quant).

    Y[bi, i, bj, l] = sum_{j,k} T[i,j] X[bi, j, bj, k] T[l,k]
    """
    t = T if t is None else t
    t = jnp.asarray(t, x.dtype)
    g = as_block_grid(x)
    # precision="highest": TPU default matmul precision is bf16 passes, which
    # costs ~1.0 absolute error on coefficients ~1000 — enough to corrupt
    # quantizer decisions. The reference computes in true f32 (cublasSgemm).
    y = jnp.einsum("ij,ajbk,lk->aibl", t, g, t, precision="highest")
    return from_block_grid(y)


def idct2_blocks(y, t=None):
    """Inverse blockwise transform: X_b = T.T @ Y_b @ T."""
    t = T if t is None else t
    t = jnp.asarray(t, y.dtype)
    g = as_block_grid(y)
    x = jnp.einsum("ji,ajbk,kl->aibl", t, g, t, precision="highest")
    return from_block_grid(x)
