"""M0: the hardcoded literals are provably the Haweel construction."""

import numpy as np

from tpudct.constants import (
    BLOCK_SIZE,
    HAWEEL_TS,
    Q,
    T,
    block_diag_T,
    derive_T,
    haweel_row_norms,
    tiled_Q,
)


def test_T_matches_haweel_derivation():
    # The reference literals (main.cu:135-143) are rounded to 8 decimals;
    # the derivation must agree to that precision.
    np.testing.assert_allclose(T, derive_T(np.float64), atol=5e-9)


def test_T_is_orthogonal():
    # T @ T.T == I is what makes IDCT = T^T Y T exact (README.md:22).
    np.testing.assert_allclose(T.astype(np.float64) @ T.T.astype(np.float64), np.eye(8), atol=2e-8)


def test_integer_core_entries():
    assert set(np.unique(HAWEEL_TS)).issubset({-2, -1, 0, 1, 2})


def test_row_norms():
    expected = np.array([np.sqrt(8), 2, np.sqrt(20), np.sqrt(2)] * 2)[
        [0, 1, 2, 3, 0, 1, 2, 3]
    ]
    np.testing.assert_allclose(haweel_row_norms(), expected)


def test_Q_is_jpeg_luminance():
    assert Q.shape == (8, 8) and Q[0, 0] == 16 and Q[7, 7] == 99 and Q.min() == 10


def test_block_diag_T():
    bd = block_diag_T(16)
    assert bd.shape == (128, 128)
    np.testing.assert_array_equal(bd[8:16, 8:16], T)
    np.testing.assert_array_equal(bd[0:8, 8:16], 0)
    # Orthogonality survives block-diagonal expansion.
    np.testing.assert_allclose(bd.astype(np.float64) @ bd.T.astype(np.float64), np.eye(128), atol=2e-7)


def test_tiled_Q():
    qt = tiled_Q(128, 256)
    assert qt.shape == (128, 256)
    np.testing.assert_array_equal(qt[8:16, 16:24], Q)
