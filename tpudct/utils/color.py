"""Color-space conversion and chroma resampling for the color extension.

The reference is strictly grayscale — its loader converts RGB to luminance
at decode time (utils.cu:70-72) and nothing downstream can represent a
second channel.  This module supplies the standard JPEG color model on top
of the same blockwise codec: full-range BT.601 RGB <-> YCbCr (ITU-T T.871)
plus 4:2:0 chroma resampling, so a color image codes as one luma plane at
full resolution and two chroma planes at quarter resolution against the
chroma quantization table (constants.QC).

Everything is jit-friendly jnp math on whole planes.  The 2x2 chroma
pooling does reshape the minor dimension into 2-wide pieces — a relayout
XLA charges for (CLAUDE.md perf rules) — but chroma planes are a quarter
of the pixels and this path is a convenience layer, not the hot kernel;
measured cost is negligible next to the plane codecs it wraps.
"""

from __future__ import annotations

import jax.numpy as jnp

# ITU-T T.871 (JPEG full-range) BT.601 luma coefficients.
_KR, _KG, _KB = 0.299, 0.587, 0.114


def rgb_to_ycbcr(rgb):
    """(H, W, 3) RGB (any float/int dtype, 0..255) -> (y, cb, cr) f32 planes.

    Full-range JFIF mapping: Y in [0, 255], Cb/Cr in [0, 255] centered at
    128 — so every plane feeds the codec's existing level-shift (-128)
    unchanged."""
    x = jnp.asarray(rgb, jnp.float32)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = _KR * r + _KG * g + _KB * b
    cb = 128.0 + (b - y) * (0.5 / (1.0 - _KB))
    cr = 128.0 + (r - y) * (0.5 / (1.0 - _KR))
    return y, cb, cr


def ycbcr_to_rgb(y, cb, cr):
    """Inverse of :func:`rgb_to_ycbcr`; returns (H, W, 3) f32, unclamped.

    Callers clamp/cast (ops.transform.to_uint8 semantics) after
    reconstruction, matching the codec's own output stage."""
    y = jnp.asarray(y, jnp.float32)
    cbc = jnp.asarray(cb, jnp.float32) - 128.0
    crc = jnp.asarray(cr, jnp.float32) - 128.0
    r = y + (2.0 - 2.0 * _KR) * crc
    b = y + (2.0 - 2.0 * _KB) * cbc
    g = (y - _KR * r - _KB * b) / _KG
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
    hh, ww = x.shape
    x = x.reshape(hh // 2, 2, ww // 2, 2)
    return x.mean(axis=(1, 3))


def upsample_420(plane, h: int, w: int):
    """(h2, w2) -> (h, w) by 2x2 nearest replication (box upsample), the
    exact adjoint of :func:`downsample_420`'s pooling grid; crops the
    replicated edge when h or w is odd."""
    x = jnp.asarray(plane, jnp.float32)
    x = jnp.repeat(jnp.repeat(x, 2, axis=0), 2, axis=1)
    return x[:h, :w]
