"""Transform and quantization constants.

The reference hardcodes two 8x8 float arrays in every translation unit
(T: /root/reference/main.cu:135-143, Q: /root/reference/main.cu:122-130;
duplicated in all 9 TUs).  Here there is exactly one copy of each, plus a
first-principles derivation of T used by the test-suite to prove the
literals are the Haweel et al. (2016) signed/sparse orthogonal DCT
approximation (reference README.md:9,22).

T factors as ``T = D @ Ts`` where ``Ts`` is an integer matrix with entries
in {0, +-1, +-2} (the multiplierless add/shift core) and ``D`` is the
diagonal of reciprocal row norms.  The `fast` pipeline exploits this
factorization to run the core contraction in int8 on the MXU.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 8

# Signed integer core of the Haweel approximate DCT.  Row r of the reference
# T matrix (main.cu:135-143) equals HAWEEL_TS[r] / ||HAWEEL_TS[r]||_2.
HAWEEL_TS = np.array(
    [
        [1, 1, 1, 1, 1, 1, 1, 1],
        [1, 1, 0, 0, 0, 0, -1, -1],
        [2, 1, -1, -2, -2, -1, 1, 2],
        [0, 0, -1, 0, 0, 1, 0, 0],
        [1, -1, -1, 1, 1, -1, -1, 1],
        [1, -1, 0, 0, 0, 0, 1, -1],
        [1, -2, 2, -1, -1, 2, -2, 1],
        [0, 0, 0, -1, 1, 0, 0, 0],
    ],
    dtype=np.int8,
)

# The float literals exactly as hardcoded in the reference (main.cu:135-143,
# main_newAppr.cu:73-81, ...).  These are the canonical runtime values so the
# new framework is bit-compatible with the reference's arithmetic inputs.
T = np.array(
    [
        [0.35355339, 0.35355339, 0.35355339, 0.35355339, 0.35355339, 0.35355339, 0.35355339, 0.35355339],
        [0.5, 0.5, 0.0, 0.0, 0.0, 0.0, -0.5, -0.5],
        [0.4472136, 0.2236068, -0.2236068, -0.4472136, -0.4472136, -0.2236068, 0.2236068, 0.4472136],
        [0.0, 0.0, -0.70710678, 0.0, 0.0, 0.70710678, 0.0, 0.0],
        [0.35355339, -0.35355339, -0.35355339, 0.35355339, 0.35355339, -0.35355339, -0.35355339, 0.35355339],
        [0.5, -0.5, 0.0, 0.0, 0.0, 0.0, 0.5, -0.5],
        [0.2236068, -0.4472136, 0.4472136, -0.2236068, -0.2236068, 0.4472136, -0.4472136, 0.2236068],
        [0.0, 0.0, 0.0, -0.70710678, 0.70710678, 0.0, 0.0, 0.0],
    ],
    dtype=np.float32,
)

# Standard JPEG luminance quantization table (main.cu:122-130).
Q = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.float32,
)

LEVEL_SHIFT = 128.0  # sub_matrix_scalar / add_matrix_scalar operand (utils_kernels.cu:8-31)


def haweel_row_norms() -> np.ndarray:
    """Euclidean norms of the integer-core rows: (2*sqrt2, 2, sqrt20, sqrt2, ...)."""
    return np.sqrt((HAWEEL_TS.astype(np.float64) ** 2).sum(axis=1))


def haweel_integer_core() -> np.ndarray:
    """The {0,+-1,+-2} integer matrix Ts with T = diag(1/row_norms) @ Ts."""
    return HAWEEL_TS.copy()


def derive_T(dtype=np.float32) -> np.ndarray:
    """Derive T from first principles (Haweel construction): row-normalized Ts.

    The test-suite asserts ``derive_T() ~= T`` so the hardcoded literals are
    provably the Haweel matrix and not arbitrary constants.
    """
    ts = HAWEEL_TS.astype(np.float64)
    return (ts / haweel_row_norms()[:, None]).astype(dtype)


def block_diag_Ts(num_blocks: int) -> np.ndarray:
    """Block-diagonal expansion of the int8 integer core Ts (one builder for
    the hp Pallas kernels, the fast pipeline's MXU einsum, and benchmarks)."""
    n = BLOCK_SIZE * num_blocks
    out = np.zeros((n, n), np.int8)
    for b in range(num_blocks):
        s = b * BLOCK_SIZE
        out[s : s + BLOCK_SIZE, s : s + BLOCK_SIZE] = HAWEEL_TS
    return out


def block_diag_T(num_blocks: int, transpose: bool = False, dtype=np.float32) -> np.ndarray:
    """Block-diagonal expansion of T: the TPU analog of `upgrade_T_matrix`
    (utils_kernels.cu:60-69), sized for lane tiles rather than whole images.

    With ``num_blocks = 16`` this yields the 128x128 matrix ``BDT`` such that
    for a (128, 128) image tile X holding a 16x16 grid of 8x8 blocks,
    ``BDT @ X @ BDT.T`` applies ``T @ Xb @ T.T`` to every block — two
    MXU-native matmuls for 256 DCT blocks.
    """
    t = T.T if transpose else T
    n = BLOCK_SIZE * num_blocks
    out = np.zeros((n, n), dtype=dtype)
    for b in range(num_blocks):
        s = b * BLOCK_SIZE
        out[s : s + BLOCK_SIZE, s : s + BLOCK_SIZE] = t
    return out


def tiled_Q(rows: int, cols: int, scale: float = 1.0, dtype=np.float32) -> np.ndarray:
    """Q broadcast over an (rows, cols) tile, matching the per-block-position
    indexing ``B[threadIdx.y*8 + threadIdx.x]`` in divide_matrices
    (utils_kernels.cu:34-44)."""
    assert rows % BLOCK_SIZE == 0 and cols % BLOCK_SIZE == 0
    return np.tile(Q * np.float32(scale), (rows // BLOCK_SIZE, cols // BLOCK_SIZE)).astype(dtype)
