"""Unit tests for the functional ops layer."""

import numpy as np
import jax.numpy as jnp

from tpudct.ops import (
    apply_retention,
    blockify,
    deblockify,
    dequantize,
    dct2_blocks,
    idct2_blocks,
    level_shift,
    level_unshift,
    quantize,
    retention_mask,
    round_half_away,
    to_uint8,
)


def test_round_half_away_matches_cuda_round():
    x = jnp.array([2.5, -2.5, 0.5, -0.5, 1.4999, -1.4999, 3.0, -3.0, 0.0])
    expect = np.array([3, -3, 1, -1, 1, -1, 3, -3, 0], dtype=np.float32)
    np.testing.assert_array_equal(np.asarray(round_half_away(x)), expect)
    # Divergence from banker's rounding is exactly the point:
    assert float(round_half_away(jnp.float32(2.5))) == 3.0
    assert float(jnp.round(jnp.float32(2.5))) == 2.0


def test_blockify_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((64, 128)).astype(np.float32))
    b = blockify(x)
    assert b.shape == (128, 8, 8)
    np.testing.assert_array_equal(np.asarray(deblockify(b, 64, 128)), np.asarray(x))
    # Block (0, 1) is columns 8:16 of rows 0:8.
    np.testing.assert_array_equal(np.asarray(b[1]), np.asarray(x[0:8, 8:16]))


def test_level_shift_inverse(image256):
    x = jnp.asarray(image256)
    np.testing.assert_array_equal(np.asarray(level_unshift(level_shift(x))), image256)


def test_dct_idct_inverse_without_quant(image256):
    # T orthogonal => exact inverse up to f32 rounding.
    x = jnp.asarray(image256)
    rec = idct2_blocks(dct2_blocks(x))
    np.testing.assert_allclose(np.asarray(rec), image256, atol=2e-3)


def test_quant_dequant_semantics():
    y = jnp.full((8, 8), 40.0)  # Q[0,0]=16 -> 40/16=2.5 -> 3 (away from zero)
    c = quantize(y)
    assert float(c[0, 0]) == 3.0
    d = dequantize(c)
    assert float(d[0, 0]) == 48.0


def test_retention_mask_counts():
    assert retention_mask(None).sum() == 64
    for k, n in [(1, 1), (2, 3), (6, 21), (8, 36), (15, 64)]:
        assert retention_mask(k).sum() == n, k


def test_apply_retention_zeroes_high_freq():
    c = jnp.ones((16, 16))
    out = np.asarray(apply_retention(c, 2))
    assert out[0, 0] == 1 and out[0, 1] == 1 and out[1, 0] == 1
    assert out[7, 7] == 0 and out[15, 15] == 0
    assert out.sum() == 4 * 3


def test_to_uint8_clamps():
    x = jnp.array([-5.0, 0.0, 254.6, 300.0])
    np.testing.assert_array_equal(np.asarray(to_uint8(x)), np.array([0, 0, 254, 255], np.uint8))


def test_padding_roundtrip(rng):
    from tpudct.ops.padding import pad_to_blocks, crop, padded_shape

    x = jnp.asarray(rng.integers(0, 256, (60, 100)).astype(np.float32))
    p, (h, w) = pad_to_blocks(x)
    assert p.shape == padded_shape(60, 100) == (64, 104)
    np.testing.assert_array_equal(np.asarray(crop(p, h, w)), np.asarray(x))
    # Edge replication: last real row/col extends.
    assert float(p[63, 0]) == float(x[59, 0])
    assert float(p[0, 103]) == float(x[0, 99])
    # Already-aligned images pass through untouched.
    y = jnp.zeros((64, 64))
    p2, _ = pad_to_blocks(y)
    assert p2 is y


def test_q_scale_for_quality_ijg_mapping():
    from tpudct.ops.quant import q_scale_for_quality

    assert q_scale_for_quality(50) == 1.0   # the reference's standard table
    assert q_scale_for_quality(10) == 5.0
    assert q_scale_for_quality(100) == 0.01  # floored: never a zero table
    assert q_scale_for_quality(75) == 0.5
    assert q_scale_for_quality(-3) == q_scale_for_quality(1) == 50.0
    # monotone: higher quality -> smaller scale
    scales = [q_scale_for_quality(q) for q in range(1, 101)]
    assert all(a >= b for a, b in zip(scales, scales[1:]))


def test_quantize_deadzone(rng):
    """Deadzone quantization (round 5, CodecConfig.deadzone): AC rounds at
    |y|/Q + theta, DC keeps round-half-away, theta=0.5 is bit-identical
    to the default rule, and dequantization needs no knowledge of theta
    (decode unchanged)."""
    import jax.numpy as jnp

    from tpudct.constants import Q
    from tpudct.ops.quant import quantize

    y = rng.normal(0, 300, (64, 64)).astype(np.float32)
    base = np.asarray(quantize(jnp.asarray(y), 1.0, "luma"))
    same = np.asarray(quantize(jnp.asarray(y), 1.0, "luma", deadzone=0.5))
    np.testing.assert_array_equal(base, same)
    got = np.asarray(quantize(jnp.asarray(y), 1.0, "luma", deadzone=0.35))
    q8 = np.tile(Q, (8, 8)).astype(np.float32)
    s = y / q8
    ref = np.sign(s) * np.floor(np.abs(s) + 0.35)
    dc = np.zeros((64, 64), bool)
    dc[::8, ::8] = True
    ref[dc] = (np.sign(s) * np.floor(np.abs(s) + 0.5))[dc]
    np.testing.assert_array_equal(got, ref)
    # deadzone only ever shrinks magnitudes (toward zero)
    assert (np.abs(got) <= np.abs(base)).all()
    import pytest

    with pytest.raises(ValueError, match="deadzone"):
        quantize(jnp.asarray(y), 1.0, "luma", deadzone=0.7)


def test_deadzone_dispatch_and_rate(rng):
    """cfg.deadzone < 0.5 demotes encodes to the einsum quantizer (the
    fused kernels bake the 0.5 rule), shrinks the rANS payload on real
    content, and the stream decodes through the UNCHANGED decode path
    (no header field needed).  Non-quantizing pipelines refuse loudly."""
    import jax.numpy as jnp

    from tpudct import CodecConfig, get_pipeline
    from tpudct.models.dispatch import (
        choose_gray_path, decode_gray_auto, encode_gray_auto,
    )
    from tpudct.utils import serialize

    p = get_pipeline("hp")
    img = rng.integers(0, 256, (128, 128)).astype(np.uint8)
    cfg0, cfgd = CodecConfig(), CodecConfig(deadzone=0.35)
    assert choose_gray_path(p, 128, 128, cfgd) == "general"
    c0, _ = encode_gray_auto(p, img, cfg0)
    cd, _ = encode_gray_auto(p, img, cfgd)
    blob0 = serialize.coefficients_to_bytes(np.asarray(c0), codec="spectral")
    blobd = serialize.coefficients_to_bytes(np.asarray(cd), codec="spectral")
    assert len(blobd) < len(blob0)
    # decode path identical: round-trips through the standard loader
    back, _qs, _k = serialize.bytes_to_coefficients(blobd)
    rec = decode_gray_auto(p, back, cfg0, (128, 128))
    assert rec.dtype == np.uint8 and rec.shape == (128, 128)
    import pytest

    for name in ("cublas", "fast"):
        with pytest.raises(ValueError, match="deadzone"):
            get_pipeline(name).dct(jnp.asarray(img, jnp.float32), cfgd)
