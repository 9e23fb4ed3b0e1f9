"""JPEG-style color codec on top of any grayscale pipeline.

The reference cannot represent color at all — its loader collapses RGB to
luminance (utils.cu:70-72) and every kernel takes one plane.  This module
composes the existing blockwise codec into the standard JPEG color model:

  RGB -> full-range BT.601 YCbCr (utils/color.py)
  Y   : full resolution, luminance table Q      (the reference's only mode)
  Cb, Cr: 4:2:0 subsampled (optional), chrominance table QC (ITU-T T.81
          Table K.2), both planes coded through ONE batched kernel launch

Every plane rides the same pipeline object (`cublas` / `batched` / `fast` /
`hp`), so the color path inherits whatever compute strategy and decode tier
the caller picked.  Plane layout, padding and retention behave exactly as
in the grayscale path.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp

from tpudct.config import CodecConfig
from tpudct.models.base import Pipeline
from tpudct.ops.padding import crop, pad_to_blocks
from tpudct.ops.rounding import round_half_away
from tpudct.utils.color import (
    downsample_420,
    rgb_to_ycbcr,
    upsample_420,
    ycbcr_to_rgb,
)

PLANES = ("y", "cb", "cr")


def _chroma_cfg(cfg: CodecConfig) -> CodecConfig:
    return dataclasses.replace(cfg, q_table="chroma")


def encode_color(
    p: Pipeline, rgb, cfg: CodecConfig, subsample: bool = True
) -> Tuple[dict, dict]:
    """(H, W, 3) RGB -> ({plane: coefficient map}, meta).

    Coefficient maps keep the padded plane shapes (block-aligned); `meta`
    records everything decode needs: the RGB size, per-plane pre-padding
    sizes and the subsampling flag."""
    y, cb, cr = rgb_to_ycbcr(rgb)
    h, w = y.shape
    if subsample:
        cb, cr = downsample_420(cb), downsample_420(cr)
    ch, cw = cb.shape

    yp, _ = pad_to_blocks(y)
    cy = p.encode(yp, cfg)

    ccfg = _chroma_cfg(cfg)
    cbp, _ = pad_to_blocks(cb)
    crp, _ = pad_to_blocks(cr)
    cc = p.encode(jnp.concatenate([cbp, crp], axis=0), ccfg)
    ph = cbp.shape[0]
    meta = {
        "orig_shape": (h, w),
        "chroma_shape": (ch, cw),
        "subsample": bool(subsample),
    }
    return {"y": cy, "cb": cc[:ph], "cr": cc[ph:]}, meta


def decode_color(p: Pipeline, planes: dict, meta: dict, cfg: CodecConfig):
    """Inverse of :func:`encode_color`: coefficient planes -> (H, W, 3) u8."""
    h, w = meta["orig_shape"]
    ch, cw = meta["chroma_shape"]

    y = crop(p.idct(jnp.asarray(planes["y"], jnp.float32), cfg), h, w)

    ccfg = _chroma_cfg(cfg)
    cc = p.idct(
        jnp.concatenate(
            [jnp.asarray(planes["cb"], jnp.float32),
             jnp.asarray(planes["cr"], jnp.float32)], axis=0
        ),
        ccfg,
    )
    ph = planes["cb"].shape[0]
    cb = crop(cc[:ph], ch, cw)
    cr = crop(cc[ph:], ch, cw)
    if meta["subsample"]:
        cb, cr = upsample_420(cb, h, w), upsample_420(cr, h, w)

    rgb = ycbcr_to_rgb(y, cb, cr)
    return jnp.clip(round_half_away(rgb), 0.0, 255.0).astype(jnp.uint8)


def roundtrip_color(
    p: Pipeline, rgb, cfg: CodecConfig, subsample: bool = True
) -> Tuple[dict, dict, "jnp.ndarray"]:
    """Full color pass: returns (coefficient planes, meta, RGB u8 recon)."""
    planes, meta = encode_color(p, rgb, cfg, subsample=subsample)
    return planes, meta, decode_color(p, planes, meta, cfg)
