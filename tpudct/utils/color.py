"""Color-space conversion and chroma resampling for the color extension.

The reference is strictly grayscale — its loader converts RGB to luminance
at decode time (utils.cu:70-72) and nothing downstream can represent a
second channel.  This module supplies the standard JPEG color model on top
of the same blockwise codec: full-range BT.601 RGB <-> YCbCr (ITU-T T.871)
plus 4:2:0 chroma resampling, so a color image codes as one luma plane at
full resolution and two chroma planes at quarter resolution against the
chroma quantization table (constants.QC).

Everything is jit-friendly jnp math on whole planes, written lane-aware:
the 2x2 pooling is a free (H/2, 2, W) sublane reshape for rows plus a
strided lane slice for columns — NEVER an (H/2, 2, W/2, 2) block view,
whose lane-splitting relayout measured 4.6 ms/plane at 2048² on v5e vs
0.06 ms for the strided form (83x; same perf rule as the codec kernels,
see CLAUDE.md).
"""

from __future__ import annotations

import jax.numpy as jnp

# ITU-T T.871 (JPEG full-range) BT.601 luma coefficients.
_KR, _KG, _KB = 0.299, 0.587, 0.114


def ycbcr_from_rgb_planes(r, g, b):
    """Plane-wise BT.601 forward transform (f32 in, f32 out, unclamped).

    The ONE copy of the affine equations — the interleaved API, the u8
    planar helpers and the Pallas color kernels all call this, so a
    formula change can never desynchronize them."""
    y = _KR * r + _KG * g + _KB * b
    cb = 128.0 + (b - y) * (0.5 / (1.0 - _KB))
    cr = 128.0 + (r - y) * (0.5 / (1.0 - _KR))
    return y, cb, cr


def rgb_from_ycbcr_planes(y, cb, cr):
    """Plane-wise BT.601 inverse transform (f32 in, f32 out, unclamped)."""
    cbc, crc = cb - 128.0, cr - 128.0
    r = y + (2.0 - 2.0 * _KR) * crc
    b = y + (2.0 - 2.0 * _KB) * cbc
    g = (y - _KR * r - _KB * b) / _KG
    return r, g, b


def rgb_to_ycbcr(rgb):
    """(H, W, 3) RGB (any float/int dtype, 0..255) -> (y, cb, cr) f32 planes.

    Full-range JFIF mapping: Y in [0, 255], Cb/Cr in [0, 255] centered at
    128 — so every plane feeds the codec's existing level-shift (-128)
    unchanged."""
    x = jnp.asarray(rgb, jnp.float32)
    return ycbcr_from_rgb_planes(x[..., 0], x[..., 1], x[..., 2])


def ycbcr_to_rgb(y, cb, cr):
    """Inverse of :func:`rgb_to_ycbcr`; returns (H, W, 3) f32, unclamped.

    Callers clamp/cast (ops.transform.to_uint8 semantics) after
    reconstruction, matching the codec's own output stage."""
    r, g, b = rgb_from_ycbcr_planes(
        jnp.asarray(y, jnp.float32),
        jnp.asarray(cb, jnp.float32),
        jnp.asarray(cr, jnp.float32),
    )
    return jnp.stack([r, g, b], axis=-1)


def downsample_420(plane):
    """(H, W) -> (ceil(H/2), ceil(W/2)) by 2x2 mean pooling (JPEG 4:2:0).

    Odd trailing row/column is edge-replicated before pooling so every
    output sample averages a full 2x2 window."""
    x = jnp.asarray(plane, jnp.float32)
    h, w = x.shape
    if h % 2:
        x = jnp.concatenate([x, x[-1:, :]], axis=0)
    if w % 2:
        x = jnp.concatenate([x, x[:, -1:]], axis=1)
    # Strided slices on both axes — measured 2x faster than the
    # (H/2, 2, W) reshape-mean row form, 40x faster than the block view.
    x = (x[0::2] + x[1::2]) * 0.5
    return (x[:, 0::2] + x[:, 1::2]) * 0.5


def _repeat_rows2(x):
    """Row-doubling via broadcast+reshape: (H, W) -> (2H, W).

    NOT jnp.repeat(axis=0) — interleave-repeat lowers to a gather measured
    at ~342 ms per plane at 8192² (CLAUDE.md).  Broadcasting a middle axis
    keeps the minor (lane) dim intact, so this form is a free relayout."""
    h, w = x.shape
    return jnp.broadcast_to(x[:, None, :], (h, 2, w)).reshape(2 * h, w)


def upsample_420(plane, h: int, w: int):
    """(h2, w2) -> (h, w) by 2x2 nearest replication (box upsample), the
    exact adjoint of :func:`downsample_420`'s pooling grid; crops the
    replicated edge when h or w is odd.

    Column replication rides the same broadcast-reshape form through a
    transpose pair — the trailing-axis interleave alternatives are the
    documented catastrophes (jnp.repeat = gather; a trailing 2-dim
    broadcast pads 64x and OOMs at 8192², CLAUDE.md)."""
    x = jnp.asarray(plane, jnp.float32)
    x = _repeat_rows2(x)                    # rows: free broadcast-reshape
    x = _repeat_rows2(x.T).T                # cols: same form, transposed
    return x[:h, :w]


def downsample_422(plane):
    """(H, W) -> (H, ceil(W/2)) by horizontal 2x mean pooling (JPEG 4:2:2:
    chroma halved horizontally only — the broadcast-studio compromise
    between 4:4:4 and 4:2:0)."""
    x = jnp.asarray(plane, jnp.float32)
    if x.shape[1] % 2:
        x = jnp.concatenate([x, x[:, -1:]], axis=1)
    return (x[:, 0::2] + x[:, 1::2]) * 0.5


def upsample_422(plane, h: int, w: int):
    """(h, w2) -> (h, w) by horizontal nearest replication (adjoint of
    :func:`downsample_422`); broadcast-reshape through a transpose pair
    instead of the gather-lowering jnp.repeat (see upsample_420)."""
    x = jnp.asarray(plane, jnp.float32)
    return _repeat_rows2(x.T).T[:h, :w]


# ---- u8-native planar fast path --------------------------------------------
#
# The float API above is layout-agnostic and general; the serving path wants
# u8 end-to-end (4x less HBM traffic — the same argument as the codec's
# u8-native kernels, kernels/hp_pallas.py).  Planar (3, H, W) layout keeps
# every op a whole-plane elementwise/strided form; the interleaved boundary
# costs one u8 transpose (~0.3 ms at 8192² on v5e, measured).


def ycbcr_split_420_u8(rgb_planar_u8, subsample: bool = True):
    """(3, H, W) uint8 RGB -> (y_u8 (H, W), cb_u8, cr_u8 (H/2, W/2)).

    Fused color conversion + 4:2:0 pooling + rounding in one XLA graph:
    chroma is pooled in float BEFORE the single u8 rounding, exactly like
    a libjpeg encoder's downsampled path.  Requires even H, W when
    subsampling (the codec's u8 fast path needs stricter alignment
    anyway; models/color.py gates and falls back)."""
    from tpudct.ops.rounding import round_half_away

    y, cb, cr = ycbcr_from_rgb_planes(
        rgb_planar_u8[0].astype(jnp.float32),
        rgb_planar_u8[1].astype(jnp.float32),
        rgb_planar_u8[2].astype(jnp.float32),
    )
    to_u8 = lambda v: jnp.clip(round_half_away(v), 0.0, 255.0).astype(jnp.uint8)
    if subsample:
        cb, cr = downsample_420(cb), downsample_420(cr)
    return to_u8(y), to_u8(cb), to_u8(cr)


def ycbcr_merge_420_u8(y_u8, cb_u8, cr_u8, h: int, w: int, subsample: bool = True):
    """(y, cb, cr) uint8 planes -> (3, H, W) uint8 RGB (inverse of
    :func:`ycbcr_split_420_u8`, nearest-neighbor chroma upsampling)."""
    from tpudct.ops.rounding import round_half_away

    y = jnp.asarray(y_u8[:h, :w], jnp.float32)
    cb = jnp.asarray(cb_u8, jnp.float32)
    cr = jnp.asarray(cr_u8, jnp.float32)
    if subsample:
        cb, cr = upsample_420(cb, h, w), upsample_420(cr, h, w)
    else:
        cb, cr = cb[:h, :w], cr[:h, :w]
    r, g, b = rgb_from_ycbcr_planes(y, cb, cr)
    rgb = jnp.stack([r, g, b], axis=0)
    return jnp.clip(round_half_away(rgb), 0.0, 255.0).astype(jnp.uint8)
