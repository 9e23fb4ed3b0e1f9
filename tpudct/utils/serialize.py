"""Coefficient-stream serialization (.tdc files).

The reference never persists its actual compressed payload — the quantized
coefficient matrix lives only in device memory and the sole artifact is a
quality-100 JPEG re-encode of the reconstruction (utils.cu:98-147;
SURVEY.md §5 "Checkpoint / resume: none").  That makes its compression
factor unmeasurable end-to-end.  This module adds the missing piece: a
self-describing container for the quantized (optionally zonally-truncated)
coefficients, entropy-coded with zlib, from which the image can be decoded
by any pipeline.

Format (little-endian):
  magic  b"TDC2"
  uint32 height, uint32 width          (of the coefficient map, padded)
  uint32 orig_h, uint32 orig_w         (pre-padding image size; 0,0 = same)
  float32 q_scale
  int32  retain_k (-1 = none)
  uint32 payload_size, then zlib(int16 coefficients, C order)
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"TDC2"
_HEADER = "<4sIIIIfiI"


def coefficients_to_bytes(
    coeffs, q_scale: float = 1.0, retain_k=None, level: int = 6, orig_shape=None
) -> bytes:
    c = np.ascontiguousarray(np.asarray(coeffs), dtype=np.int16)
    h, w = c.shape
    oh, ow = orig_shape if orig_shape is not None else (0, 0)
    payload = zlib.compress(c.tobytes(), level)
    header = struct.pack(
        _HEADER, _MAGIC, h, w, oh, ow, float(q_scale),
        -1 if retain_k is None else int(retain_k), len(payload),
    )
    return header + payload


def bytes_to_coefficients(data: bytes, with_orig_shape: bool = False):
    hsize = struct.calcsize(_HEADER)
    if len(data) < hsize or data[:4] != _MAGIC:
        raise ValueError("not a .tdc coefficient stream")
    _magic, h, w, oh, ow, q_scale, retain_k, psize = struct.unpack(_HEADER, data[:hsize])
    raw = zlib.decompress(data[hsize : hsize + psize])
    coeffs = np.frombuffer(raw, dtype=np.int16).reshape(h, w).astype(np.float32)
    out = (coeffs, float(q_scale), (None if retain_k < 0 else retain_k))
    if with_orig_shape:
        return (*out, (oh or h, ow or w))
    return out


def save_coefficients(path: str, coeffs, q_scale: float = 1.0, retain_k=None, orig_shape=None) -> int:
    """Write a .tdc file; returns bytes written (the measurable payload)."""
    data = coefficients_to_bytes(coeffs, q_scale, retain_k, orig_shape=orig_shape)
    with open(path, "wb") as f:
        f.write(data)
    return len(data)


def load_coefficients(path: str, with_orig_shape: bool = False):
    """Read a .tdc file -> (float32 coefficient map, q_scale, retain_k
    [, original (h, w) if with_orig_shape])."""
    with open(path, "rb") as f:
        return bytes_to_coefficients(f.read(), with_orig_shape)
