"""Float64 numpy golden model of the codec — the activated version of the
reference's dead `arrays_are_close` cross-check (utils.cu:27-35, never
called).  Every pipeline must agree with this."""

from __future__ import annotations

import numpy as np

from tpudct.constants import Q, T, BLOCK_SIZE


def round_half_away_np(x):
    return np.sign(x) * np.floor(np.abs(x) + 0.5)


def blockify_np(x, bs=BLOCK_SIZE):
    h, w = x.shape
    return x.reshape(h // bs, bs, w // bs, bs).transpose(0, 2, 1, 3).reshape(-1, bs, bs)


def deblockify_np(b, h, w, bs=BLOCK_SIZE):
    return b.reshape(h // bs, w // bs, bs, bs).transpose(0, 2, 1, 3).reshape(h, w)


def zonal_mask_np(k, bs=BLOCK_SIZE):
    if k is None:
        return np.ones((bs, bs))
    u, v = np.meshgrid(np.arange(bs), np.arange(bs), indexing="ij")
    return (u + v < k).astype(np.float64)


def golden_dct(img, q_scale=1.0, retain_k=None, dtype=np.float64, t=None, q=None):
    t = (T if t is None else t).astype(dtype)
    q = (Q if q is None else np.asarray(q)).astype(dtype) * q_scale
    h, w = img.shape
    xb = blockify_np(img.astype(dtype)) - 128.0
    yb = np.einsum("ij,bjk,lk->bil", t, xb, t)
    cb = round_half_away_np(yb / q) * zonal_mask_np(retain_k)
    return deblockify_np(cb, h, w)


def golden_idct(coeffs, q_scale=1.0, dtype=np.float64, t=None, q=None):
    t = (T if t is None else t).astype(dtype)
    q = (Q if q is None else np.asarray(q)).astype(dtype) * q_scale
    h, w = coeffs.shape
    yb = blockify_np(coeffs.astype(dtype)) * q
    xb = np.einsum("ji,bjk,kl->bil", t, yb, t) + 128.0
    return deblockify_np(xb, h, w)


def golden_roundtrip(img, q_scale=1.0, retain_k=None, t=None, q=None):
    c = golden_dct(img, q_scale, retain_k, t=t, q=q)
    r = golden_idct(c, q_scale, t=t, q=q)
    return c, np.clip(np.trunc(r), 0, 255).astype(np.uint8)
