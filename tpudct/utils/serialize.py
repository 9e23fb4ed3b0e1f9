"""Coefficient-stream serialization (.tdc files).

The reference never persists its actual compressed payload — the quantized
coefficient matrix lives only in device memory and the sole artifact is a
quality-100 JPEG re-encode of the reconstruction (utils.cu:98-147;
SURVEY.md §5 "Checkpoint / resume: none").  That makes its compression
factor unmeasurable end-to-end.  This module adds the missing piece: a
self-describing container for the quantized (optionally zonally-truncated)
coefficients, entropy-coded with zlib, from which the image can be decoded
by any pipeline.

Format v3 (little-endian):
  magic  b"TDC3"
  uint32 height, uint32 width          (of the coefficient map, padded)
  uint32 orig_h, uint32 orig_w         (pre-padding image size; 0,0 = same)
  float32 q_scale
  int32  retain_k (-1 = none)
  8s     transform name (NUL-padded ASCII; decode must use the same one)
  uint32 payload_size, then zlib(int16 coefficients, C order)

v2 streams (b"TDC2", no transform field) still load; they predate the
transform registry and always decode as "haweel".
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC2 = b"TDC2"
_HEADER2 = "<4sIIIIfiI"
_MAGIC = b"TDC3"
_HEADER = "<4sIIIIfi8sI"


def coefficients_to_bytes(
    coeffs, q_scale: float = 1.0, retain_k=None, level: int = 6,
    orig_shape=None, transform: str = "haweel",
) -> bytes:
    c = np.ascontiguousarray(np.asarray(coeffs), dtype=np.int16)
    h, w = c.shape
    oh, ow = orig_shape if orig_shape is not None else (0, 0)
    tname = transform.encode("ascii")
    if len(tname) > 8:
        raise ValueError(f"transform name {transform!r} exceeds 8 bytes")
    payload = zlib.compress(c.tobytes(), level)
    header = struct.pack(
        _HEADER, _MAGIC, h, w, oh, ow, float(q_scale),
        -1 if retain_k is None else int(retain_k), tname, len(payload),
    )
    return header + payload


def bytes_to_coefficients(
    data: bytes, with_orig_shape: bool = False, with_transform: bool = False
):
    if len(data) >= 4 and data[:4] == _MAGIC:
        hsize = struct.calcsize(_HEADER)
        if len(data) < hsize:
            raise ValueError("truncated .tdc coefficient stream")
        (_m, h, w, oh, ow, q_scale, retain_k, tname, psize) = struct.unpack(
            _HEADER, data[:hsize]
        )
        transform = tname.rstrip(b"\x00").decode("ascii")
    elif len(data) >= 4 and data[:4] == _MAGIC2:
        hsize = struct.calcsize(_HEADER2)
        if len(data) < hsize:
            raise ValueError("truncated .tdc coefficient stream")
        (_m, h, w, oh, ow, q_scale, retain_k, psize) = struct.unpack(
            _HEADER2, data[:hsize]
        )
        transform = "haweel"
    else:
        raise ValueError("not a .tdc coefficient stream")
    if len(data) < hsize + psize:
        raise ValueError("truncated .tdc coefficient stream")
    raw = zlib.decompress(data[hsize : hsize + psize])
    coeffs = np.frombuffer(raw, dtype=np.int16).reshape(h, w).astype(np.float32)
    out = (coeffs, float(q_scale), (None if retain_k < 0 else retain_k))
    if with_orig_shape:
        out = (*out, (oh or h, ow or w))
    if with_transform:
        out = (*out, transform)
    return out


def save_coefficients(
    path: str, coeffs, q_scale: float = 1.0, retain_k=None, orig_shape=None,
    transform: str = "haweel",
) -> int:
    """Write a .tdc file; returns bytes written (the measurable payload)."""
    data = coefficients_to_bytes(
        coeffs, q_scale, retain_k, orig_shape=orig_shape, transform=transform
    )
    with open(path, "wb") as f:
        f.write(data)
    return len(data)


def load_coefficients(
    path: str, with_orig_shape: bool = False, with_transform: bool = False
):
    """Read a .tdc file -> (float32 coefficient map, q_scale, retain_k
    [, original (h, w)][, transform name])."""
    with open(path, "rb") as f:
        return bytes_to_coefficients(f.read(), with_orig_shape, with_transform)
