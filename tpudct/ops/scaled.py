"""Fractional-scale decode: quantized coefficients -> (H/f, W/f) image.

The reference world's analog is djpeg's ``-scale M/8`` (decode a JPEG
straight to a smaller raster without ever materializing the full image);
the reference repo itself always reconstructs at full size
(main_newAppr.cu:220-250, main_cublass.cu:245-263).  tpudct already has
the 1/8 endpoint as the DC-only preview (utils/serialize.py
preview_from_bytes); this module fills in 1/2 and 1/4 — and generalizes
all three — with one exact contract:

    scaled decode at 1/f  ==  full inverse transform, then an f x f
                              box-filter average

Per 8x8 block, with T the (orthogonal) transform and Yd the dequantized
coefficients, the full inverse is ``T^T Yd T + 128``; pooling rows with
the (m, 8) averaging matrix P (m = 8/f, each row f entries of 1/f) gives

    P (T^T Yd T + 128) P^T  =  (P T^T) Yd (P T^T)^T + 128

because P's rows sum to 1.  So the whole scaled decode is the ordinary
blockwise bilinear form with the rectangular basis ``B = P T^T`` — one
(m, 8) matrix per axis, valid for EVERY registry transform (libjpeg's
scaled IDCT is instead a spectral truncation specific to the true DCT
basis; the box-average contract is the transform-agnostic equivalent,
and it is exact rather than an ideal-low-pass approximation).

Factors may differ per axis (``f_rows != f_cols``): subsampled chroma
planes need e.g. a (1/2, 1/4) decode so a 4:2:2 stream scales without
an upsample-then-downsample round trip (models/color.py
decode_color_scaled).  Factor 1 degenerates to the full inverse
(B = T^T), so the same code path covers "no scaling on this axis".

TPU mapping: like ops/transform.py the sweeps run at lane width when the
axis is a multiple of 128 — ``kron(I_16, B)`` is a (16m, 128) operand, a
K=128 contraction the MXU tiles well — and fall back to the 8-wide
einsum for small/ragged planes (scaled outputs are small; the fallback's
relayout cost is irrelevant here).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpudct.constants import get_transform
from tpudct.ops.quant import dequantize
from tpudct.ops.transform import level_unshift

_LANE = 128
_BS = 8

#: scale factors with an exact block-aligned pooling (8 % f == 0)
FACTORS = (1, 2, 4, 8)


def pool_matrix(f: int) -> np.ndarray:
    """(8/f, 8) box-average matrix: row i averages entries i*f .. i*f+f-1."""
    if f not in FACTORS:
        raise ValueError(f"scale factor must be one of {FACTORS}, got {f}")
    m = _BS // f
    p = np.zeros((m, _BS), np.float32)
    for i in range(m):
        p[i, i * f : (i + 1) * f] = 1.0 / f
    return p


@functools.lru_cache(maxsize=32)
def scaled_basis(f: int, transform: str = "haweel") -> np.ndarray:
    """B = P @ T^T, the (8/f, 8) per-block synthesis basis (f=1: plain T^T)."""
    t = get_transform(transform).t.astype(np.float64)
    return (pool_matrix(f).astype(np.float64) @ t.T).astype(np.float32)


@functools.lru_cache(maxsize=32)
def _lane_basis(f: int, transform: str = "haweel") -> np.ndarray:
    """(16 * 8/f, 128) block-diagonal form for lane-width sweeps."""
    return np.kron(
        np.eye(_LANE // _BS, dtype=np.float32), scaled_basis(f, transform)
    )


def _col_sweep(x, f: int, transform: str):
    """Contract the minor axis: (H, W) -> (H, W/f)."""
    h, w = x.shape
    if w % _LANE == 0:
        bd = jnp.asarray(_lane_basis(f, transform), x.dtype)
        y = jnp.matmul(
            x.reshape(h * (w // _LANE), _LANE), bd.T, precision="highest"
        )
        return y.reshape(h, (w // _LANE) * bd.shape[0])
    b = jnp.asarray(scaled_basis(f, transform), x.dtype)
    g = x.reshape(h, w // _BS, _BS)
    y = jnp.einsum("abk,lk->abl", g, b, precision="highest")
    return y.reshape(h, (w // _BS) * b.shape[0])


def _row_sweep(x, f: int, transform: str):
    """Contract the major axis: (H, W) -> (H/f, W)."""
    h, w = x.shape
    if h % _LANE == 0:
        bd = jnp.asarray(_lane_basis(f, transform), x.dtype)
        y = jnp.einsum(
            "ij,ajw->aiw", bd, x.reshape(h // _LANE, _LANE, w),
            precision="highest",
        )
        return y.reshape((h // _LANE) * bd.shape[0], w)
    b = jnp.asarray(scaled_basis(f, transform), x.dtype)
    y = jnp.einsum(
        "ij,ajw->aiw", b, x.reshape(h // _BS, _BS, w), precision="highest"
    )
    return y.reshape((h // _BS) * b.shape[0], w)


def scaled_idct2_blocks(
    y, f_rows: int, f_cols: int, transform: str = "haweel"
):
    """Blockwise ``B_r @ Y_b @ B_c^T`` on an (H, W) DEQUANTIZED map.

    Returns the (H * m_r/8, W * m_c/8) level-SHIFTED reconstruction (no
    +128); callers add the level shift (it commutes with pooling because
    P's rows sum to 1 — see module docstring).
    """
    h, w = y.shape
    if h % _BS or w % _BS:
        raise ValueError(
            f"coefficient map {h}x{w} not divisible into 8x8 blocks"
        )
    return _row_sweep(_col_sweep(y, f_cols, transform), f_rows, transform)


def scaled_decode(coeffs, cfg, factor: int, f_cols: int | None = None):
    """Quantized (H, W) coefficient map -> (H/f, W/f) float reconstruction.

    ``cfg`` supplies q_scale / q_table / transform exactly as the full
    decode does (models/base.py Pipeline.idct contract); ``factor``
    applies to rows (and columns unless ``f_cols`` overrides — chroma
    planes of subsampled color streams scale anisotropically).  The
    result equals ``box_pool(pipeline.idct(coeffs, cfg), factor)`` up to
    f32 summation order; quantize to uint8 with ops.transform.to_uint8.
    """
    fc = factor if f_cols is None else f_cols
    yd = dequantize(
        jnp.asarray(coeffs, jnp.float32), cfg.q_scale, cfg.q_table
    )
    return level_unshift(scaled_idct2_blocks(yd, factor, fc, cfg.transform))


def scaled_shape(orig: int, f: int) -> int:
    """Output length of a 1/f-scaled axis of pre-padding length ``orig``.

    ceil(orig / f): the last scaled pixel may average edge-padded source
    pixels (pad_to_blocks edge-replicates, so the average stays a local
    image statistic, same as every block-codec edge).
    """
    return -(-orig // f)


@functools.lru_cache(maxsize=8)
def _pool01_lane(fc: int) -> np.ndarray:
    """(128, 128/fc) block 0/1 lane-pooling matrix: column j sums lanes
    j*fc .. j*fc+fc-1."""
    m = np.zeros((_LANE, _LANE // fc), np.float32)
    for j in range(_LANE // fc):
        m[j * fc : (j + 1) * fc, j] = 1.0
    return m


def box_pool_u8(x_u8, f_rows: int, f_cols: int | None = None):
    """Exact f x f box average of a uint8 raster -> float32.

    Integer-exact and relayout-free at scale: the LANE (minor) direction
    pools via an MXU dot against a 0/1 block matrix — u8 values are
    bf16-exact and the MXU accumulates in f32, so window sums are exact
    integers (lane-strided slices measured ~1.5 ms of relayout at 8192²;
    the dot is ~0.04 ms) — and the SUBLANE direction pools with
    major-axis strided adds (cheap: whole-row moves).  The final
    1/(f_r*f_c) is a power-of-two multiply, exact.  Requires dims
    divisible by the factors (kernel-padded maps always are)."""
    fc = f_rows if f_cols is None else f_cols
    h, w = x_u8.shape
    if h % f_rows or w % fc:
        raise ValueError(
            f"box_pool_u8 needs dims divisible by the factors, got "
            f"{h}x{w} at ({f_rows}, {fc})"
        )
    if fc > 1 and w % _LANE == 0:
        # direct u8->bf16 convert (exact: u8 <= 255 < 2^8 mantissa); the
        # i32 hop is a MOSAIC constraint only — in XLA it measured +0.8 ms
        # of extra materialization at 8192² (pool variant A/B, round 3)
        xb = jnp.asarray(x_u8).astype(jnp.bfloat16)
        m = jnp.asarray(_pool01_lane(fc), jnp.bfloat16)
        s = jax.lax.dot_general(
            xb.reshape(h * (w // _LANE), _LANE), m,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(h, w // fc)
    else:
        x = jnp.asarray(x_u8, jnp.int32)
        s = x[:, 0::fc].astype(jnp.float32)
        for j in range(1, fc):
            s = s + x[:, j::fc]
    r = s[0::f_rows]
    for i in range(1, f_rows):
        r = r + s[i::f_rows]
    return r * jnp.float32(1.0 / (f_rows * fc))


def scaled_decode_u8(pipeline, coeffs_i8, cfg, factor: int,
                     f_cols: int | None = None):
    """Fast-path fractional-scale decode: fused int8 full decode (the
    0.29 ms/8192² kernel) + exact integer box pooling of its uint8
    output -> (H/f, W/fc) float32.

    CONTRACT DELTA vs :func:`scaled_decode`: this is the box average of
    the CLAMPED, ROUNDED full decode (the u8 image a viewer actually
    sees — i.e. "shrink the decoded picture"), while scaled_decode
    averages the UNCLAMPED f32 reconstruction ("decode at lower
    resolution").  They differ by the codec's per-pixel u8 conversion —
    C-truncation, the reference-faithful cast (utils.cu:18-24), < 1.0
    per pixel — plus clamping wherever the reconstruction overshoots
    [0, 255]: bounded by 1 LSB on natural images (overshoot is a
    ringing-edge phenomenon), up to the overshoot magnitude on
    adversarial noise content.  For
    thumbnailing — the use --scale exists for — the clamped semantic is
    the faithful one.  Measured ~6x faster at 8192² (the einsum path
    pays 6-pass `highest` sweeps plus a full f32 dequantized
    intermediate; this path's decode is at its MXU floor and the pool is
    traffic-bounded).  Requires the u8 decode geometry (h % 32,
    w % 128) and the factors to divide the dims; callers fall back to
    scaled_decode otherwise (the gate in cli/_decode_stream)."""
    rec = pipeline.decode_u8(jnp.asarray(coeffs_i8, jnp.int8), cfg)
    return box_pool_u8(rec, factor, f_cols)
