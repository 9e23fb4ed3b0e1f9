"""Fractional-scale decode (ops/scaled.py, the djpeg -scale M/8 analog).

The contract under test: a 1/f scaled decode equals the FULL inverse
followed by an f x f box-filter average — per block,
P (T^T Yd T + 128) P^T == (P T^T) Yd (P T^T)^T + 128.  The reference
always reconstructs at full size (main_newAppr.cu:220-250); scaled
decode has no reference analog beyond the DC preview endpoint.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tpudct.config import CodecConfig
from tpudct.models import get_pipeline
from tpudct.models.color import (
    decode_color,
    decode_color_scaled,
    encode_color,
)
from tpudct.ops.scaled import (
    FACTORS,
    pool_matrix,
    scaled_basis,
    scaled_decode,
    scaled_shape,
)
from tpudct.ops.transform import to_uint8
from tpudct.utils import serialize


def _box_pool(x, f):
    h, w = x.shape
    return np.asarray(x, np.float64).reshape(h // f, f, w // f, f).mean(
        axis=(1, 3)
    )


def test_pool_matrix_rows_sum_to_one():
    for f in FACTORS:
        p = pool_matrix(f)
        assert p.shape == (8 // f, 8)
        np.testing.assert_allclose(p.sum(axis=1), 1.0, rtol=1e-7)


def test_pool_matrix_rejects_bad_factor():
    with pytest.raises(ValueError):
        pool_matrix(3)


def test_factor_one_basis_is_full_inverse():
    from tpudct.constants import get_transform

    b = scaled_basis(1, "haweel")
    np.testing.assert_allclose(
        b, get_transform("haweel").t.T.astype(np.float32), atol=1e-7
    )


# Shapes cover the lane-width sweep (multiples of 128), the 8-wide
# fallback, and the mixed case (one axis each).
@pytest.mark.parametrize("shape", [(128, 128), (40, 56), (128, 72)])
@pytest.mark.parametrize("transform", ["haweel", "dct", "wht"])
def test_scaled_equals_pooled_full_decode(rng, shape, transform):
    img = rng.integers(0, 256, shape).astype(np.float32)
    cfg = CodecConfig(q_scale=1.0, transform=transform)
    p = get_pipeline("batched")
    c = p.encode(jnp.asarray(img), cfg)
    full = np.asarray(p.idct(c, cfg))
    for f in FACTORS:
        s = np.asarray(scaled_decode(c, cfg, f))
        assert s.shape == (shape[0] // f, shape[1] // f)
        np.testing.assert_allclose(s, _box_pool(full, f), atol=1e-3)


def test_anisotropic_factors(rng):
    img = rng.integers(0, 256, (64, 64)).astype(np.float32)
    cfg = CodecConfig(q_scale=1.0)
    p = get_pipeline("batched")
    c = p.encode(jnp.asarray(img), cfg)
    full = np.asarray(p.idct(c, cfg), np.float64)
    s = np.asarray(scaled_decode(c, cfg, 2, f_cols=4))
    ref = full.reshape(32, 2, 16, 4).mean(axis=(1, 3))
    assert s.shape == (32, 16)
    np.testing.assert_allclose(s, ref, atol=1e-3)


def test_scale_eighth_matches_dc_preview(rng, tmp_path):
    """The f=8 endpoint must agree with the DC-only preview: for a
    flat-DC-row orthogonal T the other basis rows sum to zero, so the
    block box-average IS the preview's DC formula."""
    img = rng.integers(0, 256, (48, 80)).astype(np.float32)
    cfg = CodecConfig(q_scale=1.0)
    p = get_pipeline("batched")
    c = np.asarray(p.encode(jnp.asarray(img), cfg))
    data = serialize.coefficients_to_bytes(
        c, cfg.q_scale, orig_shape=img.shape, transform=cfg.transform,
        codec="spectral",  # preview needs a spectral-ordered stream
    )
    pv = serialize.preview_from_bytes(data)
    s = np.asarray(to_uint8(scaled_decode(jnp.asarray(c), cfg, 8)))
    assert s.shape == pv.shape
    # identical math, different summation order: both trunc to u8, so a
    # value epsilon-below an integer may land 1 apart
    assert np.abs(s.astype(int) - pv.astype(int)).max() <= 1


def test_scaled_shape_ceil():
    assert scaled_shape(64, 8) == 8
    assert scaled_shape(65, 8) == 9
    assert scaled_shape(63, 2) == 32


@pytest.mark.parametrize("mode", ["420", "422", "444"])
@pytest.mark.parametrize("factor", [2, 4, 8])
def test_color_scaled_decode(rng, mode, factor):
    """Scaled color decode is the pooled unclipped float reconstruction;
    a smooth in-gamut gradient keeps RGB clipping out of the comparison
    so the u8 outputs agree to rounding."""
    h, w = 80, 96
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    rgb = np.stack(
        [64 + yy, 64 + xx, 64 + (yy + xx) / 2], axis=-1
    ) * (128.0 / (h + w))
    rgb = np.clip(rgb + 64, 0, 255).astype(np.float32)
    p = get_pipeline("batched")
    cfg = CodecConfig(q_scale=1.0)
    planes, meta = encode_color(p, jnp.asarray(rgb), cfg, subsample=mode)
    full = np.asarray(decode_color(p, planes, meta, cfg)).astype(np.float64)
    s = np.asarray(decode_color_scaled(p, planes, meta, cfg, factor))
    assert s.shape == (h // factor, w // factor, 3)
    ref = full.reshape(
        h // factor, factor, w // factor, factor, 3
    ).mean(axis=(1, 3))
    # full path rounds to u8 BEFORE the pool; in-gamut that is < 1 apart
    assert np.abs(s.astype(np.float64) - ref).max() <= 1.5


def test_color_scaled_factor_one_is_full_decode(rng):
    rgb = rng.integers(0, 256, (40, 40, 3)).astype(np.float32)
    p = get_pipeline("batched")
    cfg = CodecConfig(q_scale=1.0)
    planes, meta = encode_color(p, jnp.asarray(rgb), cfg, subsample="420")
    full = np.asarray(decode_color(p, planes, meta, cfg))
    s = np.asarray(decode_color_scaled(p, planes, meta, cfg, 1))
    np.testing.assert_array_equal(s, full)


# ---- CLI surface -----------------------------------------------------------


def test_cli_decode_scale_gray(rng, tmp_path):
    from tpudct.cli import main
    from tpudct.utils import imageio

    img = rng.integers(0, 256, (72, 104)).astype(np.uint8)
    src = tmp_path / "in.png"
    imageio.save_image(src, img)
    tdc = tmp_path / "c.tdc"
    assert main(["encode", "--pipeline", "batched", str(src), str(tdc)]) == 0
    out = tmp_path / "quarter.png"
    assert main(["decode", "--scale", "1/4", str(tdc), str(out)]) == 0
    dec = imageio.load_image(out)
    assert dec.shape == (18, 26)  # ceil(72/4), ceil(104/4)


def test_cli_decode_scale_color(rng, tmp_path):
    from tpudct.cli import main
    from tpudct.utils import imageio

    rgb = rng.integers(0, 256, (64, 48, 3)).astype(np.uint8)
    src = tmp_path / "in.png"
    imageio.save_image(src, rgb)
    tdcc = tmp_path / "c.tdcc"
    assert main(["encode", "--color", "--pipeline", "batched",
                 str(src), str(tdcc)]) == 0
    out = tmp_path / "half.png"
    assert main(["decode", "--scale", "1/2", str(tdcc), str(out)]) == 0
    dec = imageio.load_image(out, force_gray=False)
    assert dec.shape == (32, 24, 3)


def test_cli_scale_rejects_combinations(rng, tmp_path):
    from tpudct.cli import main
    from tpudct.utils import imageio

    img = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    src = tmp_path / "in.png"
    imageio.save_image(src, img)
    tdc = tmp_path / "c.tdc"
    assert main(["encode", "--pipeline", "batched", str(src), str(tdc)]) == 0
    out = tmp_path / "o.png"
    assert main(["decode", "--scale", "1/2", "--rows", "0:8",
                 str(tdc), str(out)]) != 0


# ---- djpeg drop-in: decode works straight on .jpg inputs -------------------

from tpudct.utils import jpegcoef  # noqa: E402

_needs_native = pytest.mark.skipif(
    not jpegcoef.coef_io_available(),
    reason="coefficient-level libjpeg access needs the native library",
)


@_needs_native
def test_cli_decode_jpg_input_gray(rng, tmp_path, capsys):
    from tpudct.cli import main
    from tpudct.utils import imageio

    img = (rng.integers(0, 9, (64, 96)) * 28).astype(np.uint8)
    src = tmp_path / "in.jpg"
    imageio.save_jpeg(src, img, quality=95)
    out = tmp_path / "full.png"
    assert main(["decode", str(src), str(out)]) == 0
    dec = imageio.load_image(out)
    assert dec.shape == (64, 96)
    # our IDCT of libjpeg's own coefficients: within a couple of gray
    # levels of the (lossy-compressed) source
    ref = imageio.load_jpeg(src)
    assert np.abs(dec.astype(int) - ref.astype(int)).max() <= 2
    # the user-facing message names the .jpg, not the internal temp file
    assert "in.jpg" in capsys.readouterr().out

    q = tmp_path / "q.png"
    assert main(["decode", "--scale", "1/4", str(src), str(q)]) == 0
    assert imageio.load_image(q).shape == (16, 24)


@_needs_native
def test_cli_decode_jpg_input_color(rng, tmp_path):
    from tpudct.cli import main
    from tpudct.utils import imageio

    rgb = rng.integers(0, 256, (48, 64, 3)).astype(np.uint8)
    src = tmp_path / "in.jpg"
    imageio.save_image(src, rgb, quality=95)
    out = tmp_path / "half.png"
    assert main(["decode", "--scale", "1/2", str(src), str(out)]) == 0
    assert imageio.load_image(out, force_gray=False).shape == (24, 32, 3)


@_needs_native
def test_cli_decode_jpg_input_preview(rng, tmp_path):
    from tpudct.cli import main
    from tpudct.utils import imageio

    img = rng.integers(0, 256, (64, 64)).astype(np.uint8)
    src = tmp_path / "in.jpg"
    imageio.save_jpeg(src, img, quality=95)
    out = tmp_path / "pv.png"
    assert main(["decode", "--preview", str(src), str(out)]) == 0
    assert imageio.load_image(out).shape == (8, 8)


def test_scaled_decode_u8_fast_path(rng):
    """Fast-path scaled decode (fused int8 full decode + exact integer box
    pool): bit-deterministic vs its own contract (pool of the ROUNDED
    full decode), and within the documented sub-LSB delta of the f32
    einsum path."""
    import jax.numpy as jnp

    from tpudct import CodecConfig, get_pipeline
    from tpudct.ops.scaled import box_pool_u8, scaled_decode, scaled_decode_u8

    p = get_pipeline("hp")
    cfg = CodecConfig()
    # natural-statistics content: the contract delta vs the f32 path is
    # clamping of [0,255]-overshoots, absent on smooth images (on noise
    # content it reaches the overshoot magnitude — documented)
    yy, xx = np.mgrid[0:64, 0:256].astype(np.float32)
    img = np.clip(128 + 80 * np.sin(yy / 9) * np.cos(xx / 13), 10, 245).astype(np.uint8)
    c = p.encode_u8(jnp.asarray(img), cfg)
    for f in (2, 4, 8):
        fast = np.asarray(scaled_decode_u8(p, c, cfg, f))
        # contract: exactly the box average of the clamped+rounded decode
        ref_pool = np.asarray(box_pool_u8(p.decode_u8(c, cfg), f))
        np.testing.assert_array_equal(fast, ref_pool)
        # within 1 LSB of the f32 contract where nothing clips (the
        # codec's u8 conversion is the reference-faithful C truncation,
        # so each pooled pixel sits up to 1.0 below the f32 value)
        f32_path = np.asarray(scaled_decode(jnp.asarray(c, jnp.float32), cfg, f))
        d = fast - f32_path
        assert d.max() <= 0.01 and d.min() >= -1.0, (f, d.min(), d.max())


def test_box_pool_u8_exactness(rng):
    from tpudct.ops.scaled import box_pool_u8

    x = rng.integers(0, 256, (32, 64), dtype=np.uint8)
    for fr, fc in ((2, 2), (4, 2), (8, 8), (1, 4)):
        got = np.asarray(box_pool_u8(x, fr, fc))
        ref = x.astype(np.float64).reshape(
            32 // fr, fr, 64 // fc, fc
        ).mean(axis=(1, 3))
        np.testing.assert_allclose(got, ref, atol=0)  # integer-exact


def test_cli_scale_fast_path_engages(tmp_path, capsys):
    """decode --scale rides the u8 fast path for eligible streams (spy on
    decode_u8) and produces the same pixels as the documented contract."""
    import jax.numpy as jnp

    from tpudct import CodecConfig, get_pipeline
    from tpudct.cli import main
    from tpudct.utils import imageio, serialize

    img = (np.random.default_rng(9).integers(0, 256, (100, 130))).astype(np.uint8)
    src = tmp_path / "in.png"
    imageio.save_image(src, img)
    tdc = tmp_path / "x.tdc"
    out = tmp_path / "half.png"
    assert main(["encode", str(src), str(tdc)]) == 0
    p = get_pipeline("hp")
    calls = []
    orig = p.decode_u8
    p.decode_u8 = lambda x, cfg: calls.append(tuple(x.shape)) or orig(x, cfg)
    try:
        assert main(["decode", "--scale", "1/2", str(tdc), str(out)]) == 0
    finally:
        del p.decode_u8
    assert calls, "u8 fast path did not engage for an eligible stream"
    rec = imageio.load_image(str(out))
    assert rec.shape == (50, 65)
