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
  magic  b"TDC1"
  uint32 height, uint32 width
  float32 q_scale
  int32  retain_k (-1 = none)
  uint32 payload_size, then zlib(int16 coefficients, C order)
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"TDC1"
_HEADER = "<4sIIfiI"


def coefficients_to_bytes(coeffs, q_scale: float = 1.0, retain_k=None, level: int = 6) -> bytes:
    c = np.ascontiguousarray(np.asarray(coeffs), dtype=np.int16)
    h, w = c.shape
    payload = zlib.compress(c.tobytes(), level)
    header = struct.pack(
        _HEADER, _MAGIC, h, w, float(q_scale),
        -1 if retain_k is None else int(retain_k), len(payload),
    )
    return header + payload


def bytes_to_coefficients(data: bytes):
    hsize = struct.calcsize(_HEADER)
    magic, h, w, q_scale, retain_k, psize = struct.unpack(_HEADER, data[:hsize])
    if magic != _MAGIC:
        raise ValueError("not a .tdc coefficient stream")
    raw = zlib.decompress(data[hsize : hsize + psize])
    coeffs = np.frombuffer(raw, dtype=np.int16).reshape(h, w).astype(np.float32)
    return coeffs, float(q_scale), (None if retain_k < 0 else retain_k)


def save_coefficients(path: str, coeffs, q_scale: float = 1.0, retain_k=None) -> int:
    """Write a .tdc file; returns bytes written (the measurable payload)."""
    data = coefficients_to_bytes(coeffs, q_scale, retain_k)
    with open(path, "wb") as f:
        f.write(data)
    return len(data)


def load_coefficients(path: str):
    """Read a .tdc file -> (float32 coefficient map, q_scale, retain_k)."""
    with open(path, "rb") as f:
        return bytes_to_coefficients(f.read())
