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

Color streams (.tdcc): a b"TDCC" container holding one v4 plane stream per
YCbCr plane.  v4 (b"TDC4") extends v3 with the quantization-table name
("luma"/"chroma") so chroma planes decode against constants.QC.  The plane
headers carry their own pre-padding sizes: the Y plane's is the RGB image
size, the Cb/Cr planes' the (possibly 4:2:0-subsampled) chroma size.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC2 = b"TDC2"
_HEADER2 = "<4sIIIIfiI"
_MAGIC = b"TDC3"
_HEADER = "<4sIIIIfi8sI"
_MAGIC4 = b"TDC4"
_HEADER4 = "<4sIIIIfi8s8sI"
_MAGICC = b"TDCC"
_HEADERC = "<4sBB"  # magic, n_planes, subsample flag


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


# ---- color (.tdcc) containers ---------------------------------------------


def _plane_to_bytes(
    coeffs, q_scale: float, retain_k, transform: str, q_table: str,
    orig_shape, level: int = 6,
) -> bytes:
    """One YCbCr plane as a v4 stream (v3 + quantization-table name)."""
    c = np.ascontiguousarray(np.asarray(coeffs), dtype=np.int16)
    h, w = c.shape
    oh, ow = orig_shape
    tname = transform.encode("ascii")
    qname = q_table.encode("ascii")
    if len(tname) > 8 or len(qname) > 8:
        raise ValueError("transform/q_table names exceed 8 bytes")
    payload = zlib.compress(c.tobytes(), level)
    return struct.pack(
        _HEADER4, _MAGIC4, h, w, oh, ow, float(q_scale),
        -1 if retain_k is None else int(retain_k), tname, qname, len(payload),
    ) + payload


def _bytes_to_plane(data: bytes) -> tuple:
    """Parse one v4 plane stream -> (plane dict, bytes consumed)."""
    hsize = struct.calcsize(_HEADER4)
    if len(data) < hsize or data[:4] != _MAGIC4:
        raise ValueError("not a .tdcc v4 plane stream")
    (_m, h, w, oh, ow, q_scale, retain_k, tname, qname, psize) = struct.unpack(
        _HEADER4, data[:hsize]
    )
    if len(data) < hsize + psize:
        raise ValueError("truncated .tdcc plane stream")
    raw = zlib.decompress(data[hsize : hsize + psize])
    coeffs = np.frombuffer(raw, dtype=np.int16).reshape(h, w).astype(np.float32)
    plane = {
        "coeffs": coeffs,
        "orig_shape": (oh, ow),
        "q_scale": float(q_scale),
        "retain_k": None if retain_k < 0 else retain_k,
        "transform": tname.rstrip(b"\x00").decode("ascii"),
        "q_table": qname.rstrip(b"\x00").decode("ascii"),
    }
    return plane, hsize + psize


def color_to_bytes(
    planes: dict, meta: dict, q_scale: float = 1.0, retain_k=None,
    transform: str = "haweel", level: int = 6,
) -> bytes:
    """Serialize models.color.encode_color output to a .tdcc stream."""
    h, w = meta["orig_shape"]
    parts = [struct.pack(_HEADERC, _MAGICC, 3, 1 if meta["subsample"] else 0)]
    for name, q_table, oshape in (
        ("y", "luma", (h, w)),
        ("cb", "chroma", meta["chroma_shape"]),
        ("cr", "chroma", meta["chroma_shape"]),
    ):
        blob = _plane_to_bytes(
            planes[name], q_scale, retain_k, transform, q_table, oshape, level
        )
        parts.append(struct.pack("<I", len(blob)))
        parts.append(blob)
    return b"".join(parts)


def is_color_stream(data: bytes) -> bool:
    return len(data) >= 4 and data[:4] == _MAGICC


def bytes_to_color(data: bytes) -> tuple:
    """Parse a .tdcc stream -> ({plane: f32 coeffs}, meta).

    meta carries orig_shape / chroma_shape / subsample (decode geometry)
    plus q_scale / retain_k / transform (codec configuration, uniform
    across planes by construction)."""
    hsize = struct.calcsize(_HEADERC)
    if not is_color_stream(data) or len(data) < hsize:
        raise ValueError("not a .tdcc color stream")
    (_m, n_planes, subsample) = struct.unpack(_HEADERC, data[:hsize])
    if n_planes != 3:
        raise ValueError(f"expected 3 planes, got {n_planes}")
    off = hsize
    parsed = []
    for _ in range(n_planes):
        if len(data) < off + 4:
            raise ValueError("truncated .tdcc color stream")
        (blen,) = struct.unpack("<I", data[off : off + 4])
        off += 4
        plane, used = _bytes_to_plane(data[off : off + blen])
        if used != blen:
            raise ValueError("corrupt .tdcc plane length")
        off += blen
        parsed.append(plane)
    y, cb, cr = parsed
    if (y["transform"] != cb["transform"] or y["q_scale"] != cb["q_scale"]
            or cb["orig_shape"] != cr["orig_shape"]):
        raise ValueError("inconsistent .tdcc plane headers")
    planes = {"y": y["coeffs"], "cb": cb["coeffs"], "cr": cr["coeffs"]}
    meta = {
        "orig_shape": y["orig_shape"],
        "chroma_shape": cb["orig_shape"],
        "subsample": bool(subsample),
        "q_scale": y["q_scale"],
        "retain_k": y["retain_k"],
        "transform": y["transform"],
    }
    return planes, meta


def save_color(
    path: str, planes: dict, meta: dict, q_scale: float = 1.0, retain_k=None,
    transform: str = "haweel",
) -> int:
    """Write a .tdcc file; returns bytes written (the measurable payload)."""
    data = color_to_bytes(planes, meta, q_scale, retain_k, transform)
    with open(path, "wb") as f:
        f.write(data)
    return len(data)


def load_color(path: str) -> tuple:
    """Read a .tdcc file -> ({plane: f32 coeffs}, meta)."""
    with open(path, "rb") as f:
        return bytes_to_color(f.read())
