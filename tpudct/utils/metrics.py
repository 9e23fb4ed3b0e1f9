"""Accuracy / compression metrics.

The reference publishes PEEN, MSE and compression factor for the Circuit
image (README.md:62-69) but contains NO code computing them (verified in
SURVEY.md §4 — they were produced outside the repo).  This module makes
them first-class, jit-compatible, and shardable (each reduces with sums, so
the distributed variants in tpudct.parallel psum the partial sums).

Definitions used (documented because the reference leaves them implicit):
  MSE   = mean((x - y)^2)                      over uint8-range pixels
  PSNR  = 10 log10(255^2 / MSE)
  PEEN  = 100 * sum((x - y)^2) / sum(x^2)      percentage error energy,
          normalized to the input energy (the PEEN of the approximate-DCT
          literature, e.g. the Haweel line of papers)
  compression factor = compressed_size(original) / compressed_size(coded)
          where the original side is zlib and the coefficient side is the
          .tdc 'auto' entropy stage (smallest of rans/huffman/xz/spectral
          — what encode actually stores; see utils/serialize.py).
          An alternative JPEG-file-based factor is provided for parity
          with the reference's libjpeg-re-encode storage model.
"""

from __future__ import annotations

import zlib

import jax
import jax.numpy as jnp
import numpy as np


def mse(x, y):
    d = jnp.asarray(x, jnp.float32) - jnp.asarray(y, jnp.float32)
    return jnp.mean(d * d)


def psnr(x, y):
    # Guard the perfect-reconstruction case: inf is not valid JSON and the
    # CLI emits these values verbatim (cap matches the sharded-metrics
    # guard in parallel/sharding.py).
    return 10.0 * jnp.log10(255.0**2 / jnp.maximum(mse(x, y), 1e-30))


def peen(x, y):
    """Percentage error energy normalized: 100 * ||x-y||^2 / ||x||^2.

    The all-zero-reference denominator is guarded the same way psnr's
    perfect-reconstruction case is: NaN/inf are not valid JSON and the CLI
    (`run`, `table`, `compare`) emits these values verbatim."""
    xf = jnp.asarray(x, jnp.float32)
    d = xf - jnp.asarray(y, jnp.float32)
    return 100.0 * jnp.sum(d * d) / jnp.maximum(jnp.sum(xf * xf), 1e-30)


def ssim(x, y, data_range: float = 255.0, win: int = 8):
    """Mean structural similarity (Wang et al. 2004), uniform 8x8 windows.

    Beyond the reference's metric set; standard constants K1=0.01, K2=0.03.
    Uniform (not Gaussian) windows keep it jit-friendly and match the
    codec's own 8x8 block structure."""
    xf = jnp.asarray(x, jnp.float32)
    yf = jnp.asarray(y, jnp.float32)
    # Images smaller than the window would make the valid-mode convolution
    # empty (mean -> NaN); clamp to global statistics instead.
    win = max(1, min(win, xf.shape[0], xf.shape[1]))
    k = jnp.ones((win, win), jnp.float32) / (win * win)

    def blur(a):
        return jax.scipy.signal.convolve2d(a, k, mode="valid")

    mx, my = blur(xf), blur(yf)
    mxx, myy, mxy = blur(xf * xf), blur(yf * yf), blur(xf * yf)
    vx = mxx - mx * mx
    vy = myy - my * my
    cxy = mxy - mx * my
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    num = (2 * mx * my + c1) * (2 * cxy + c2)
    den = (mx * mx + my * my + c1) * (vx + vy + c2)
    return jnp.mean(num / den)


def _zlib_size(data: bytes, level: int = 6) -> int:
    return len(zlib.compress(data, level))


def compression_factor(image_u8: np.ndarray, coeffs: np.ndarray, level: int = 6) -> float:
    """Losslessly-entropy-coded size ratio: raw image vs coefficient stream.

    Coefficients are integers after quantization (utils_kernels.cu:42);
    the denominator is the spectral-codec payload exactly as serialize's
    on-disk .tdc format stores it (DC delta + zig-zag AC planes, zlib), so
    the reported factor is what a user actually gets on disk."""
    from tpudct.utils.serialize import _encode_payload

    img = np.ascontiguousarray(image_u8, dtype=np.uint8)
    c = np.ascontiguousarray(np.asarray(coeffs), dtype=np.int16)
    if c.ndim == 2 and c.shape[0] % 8 == 0 and c.shape[1] % 8 == 0:
        # The "auto" on-disk choice (smaller of huffman / spectral+zlib) —
        # the factor reported is what a user actually gets in a .tdc.
        _code, payload = _encode_payload(c, "auto", level)
        return _zlib_size(img.tobytes(), level) / len(payload)
    # Non-block-aligned maps can't ride the block codecs; fall back to the
    # raw-stream size so quality_report stays usable on arbitrary shapes.
    return _zlib_size(img.tobytes(), level) / _zlib_size(c.tobytes(), level)


def jpeg_compression_factor(image_u8: np.ndarray, recon_u8: np.ndarray, quality: int = 100) -> float:
    """JPEG-file-size ratio, matching the reference's storage model (the
    reconstruction is re-encoded with libjpeg at quality 100,
    main_cublass.cu:152)."""
    from tpudct.utils.imageio import encode_jpeg_bytes

    return len(encode_jpeg_bytes(image_u8, quality)) / len(
        encode_jpeg_bytes(np.asarray(recon_u8), quality)
    )


def quality_report(image_u8, recon_u8, coeffs) -> dict:
    """The README-table triple for one image (README.md:62-69).

    Two compression-factor definitions ride side by side:
    `compression_factor` is the on-disk .tdc model (this framework's own
    container — the better number), `jpeg_factor` is the REFERENCE's
    storage model (the reconstruction re-encoded with libjpeg at quality
    100, main_cublass.cu:152) so the README.md:69 row (1.29-1.49) is
    directly comparable."""
    img = np.asarray(image_u8)
    rec = np.asarray(recon_u8)
    rep = {
        "mse": float(mse(img, rec)),
        "psnr_db": float(psnr(img, rec)),
        "peen_pct": float(peen(img, rec)),
        "ssim": float(ssim(img, rec)),
        "compression_factor": compression_factor(img, np.asarray(coeffs)),
    }
    if img.ndim == 2 and rec.ndim == 2:  # reference model is gray-only
        rep["jpeg_factor"] = jpeg_compression_factor(img, rec)
    return rep
