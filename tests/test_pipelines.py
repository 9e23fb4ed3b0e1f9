"""Golden and cross-variant equivalence for all pipeline families.

This is the activated version of the reference's dead-code comparator
`arrays_are_close` (utils.cu:27-35): every variant must agree with the
float64 golden model and with every other variant (SURVEY.md §4).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tpudct import CodecConfig, available_pipelines, get_pipeline
from tests.golden import golden_dct, golden_idct, golden_roundtrip

PIPELINES = ["cublas", "batched", "fast", "hp"]
CFG = CodecConfig()


def test_registry():
    assert set(PIPELINES).issubset(set(available_pipelines()))
    assert get_pipeline("cublas2").name == "batched"


@pytest.mark.parametrize("name", PIPELINES)
def test_dct_matches_golden(name, image256):
    c = np.asarray(get_pipeline(name).dct(jnp.asarray(image256), CFG))
    g = golden_dct(image256)
    # Coefficients are integers; f32 vs f64 may flip a rare half-boundary.
    mismatches = int((c != g).sum())
    # f32 vs f64 arithmetic flips quantizer decisions only where y/Q lands
    # within ~1 ulp of an exact .5 tie (verified empirically: every flip is
    # +-1 at a true half boundary) — bound the flip rate, not exactness.
    assert mismatches <= c.size * 5e-3, f"{name}: {mismatches} coefficient mismatches"
    assert np.abs(c - g).max() <= 1.0


@pytest.mark.parametrize("name", PIPELINES)
def test_idct_matches_golden(name, image256):
    g_coeffs = golden_dct(image256).astype(np.float32)
    r = np.asarray(get_pipeline(name).idct(jnp.asarray(g_coeffs), CFG))
    g = golden_idct(g_coeffs)
    np.testing.assert_allclose(r, g, atol=1e-2)


def test_cross_variant_coefficient_agreement(image256):
    x = jnp.asarray(image256)
    maps = {n: np.asarray(get_pipeline(n).dct(x, CFG)) for n in PIPELINES}
    ref = maps["batched"]
    for n, c in maps.items():
        mismatches = int((c != ref).sum())
        assert mismatches <= c.size * 5e-3, f"{n} vs batched: {mismatches}"
        assert np.abs(c - ref).max() <= 1.0


@pytest.mark.parametrize("name", PIPELINES)
def test_roundtrip_reconstruction_quality(name, image256):
    _, rec = get_pipeline(name).roundtrip(jnp.asarray(image256), CFG)
    rec = np.asarray(rec).astype(np.float64)
    mse = float(((rec - image256) ** 2).mean())
    # Random-noise images quantize harshly; just sanity-bound and compare
    # to golden exactly below.
    _, grec = golden_roundtrip(image256)
    gmse = float(((grec.astype(np.float64) - image256) ** 2).mean())
    assert abs(mse - gmse) <= 2e-2 * max(gmse, 1.0), f"{name}: {mse} vs golden {gmse}"
    assert rec.dtype == np.float64 and rec.min() >= 0 and rec.max() <= 255


@pytest.mark.parametrize("name", PIPELINES)
def test_smooth_image_high_fidelity(name):
    # A smooth gradient survives quantization nearly losslessly.
    yy, xx = np.meshgrid(np.arange(128), np.arange(128), indexing="ij")
    img = (128 + 60 * np.sin(xx / 40.0) * np.cos(yy / 40.0)).astype(np.float32)
    _, rec = get_pipeline(name).roundtrip(jnp.asarray(img), CFG)
    mse = float(((np.asarray(rec).astype(np.float64) - img) ** 2).mean())
    assert mse < 12.0, f"{name}: smooth-image MSE {mse}"


def test_retention_sweep_monotone(image256):
    # Fewer retained coefficients => worse reconstruction (k-sweep,
    # README.md:62-69).
    p = get_pipeline("batched")
    x = jnp.asarray(image256)
    mses = []
    for k in [2, 6, 8, 10, None]:
        cfg = CodecConfig(retain_k=k)
        _, rec = p.roundtrip(x, cfg)
        mses.append(float(((np.asarray(rec).astype(np.float64) - image256) ** 2).mean()))
    assert mses == sorted(mses, reverse=True), mses


def test_q_scale(image256):
    p = get_pipeline("batched")
    x = jnp.asarray(image256)
    _, rec_fine = p.roundtrip(x, CodecConfig(q_scale=0.25))
    _, rec_coarse = p.roundtrip(x, CodecConfig(q_scale=4.0))
    mse_f = float(((np.asarray(rec_fine).astype(np.float64) - image256) ** 2).mean())
    mse_c = float(((np.asarray(rec_coarse).astype(np.float64) - image256) ** 2).mean())
    assert mse_f < mse_c


def test_roundtrip_batch(image256):
    import jax.numpy as jnp

    p = get_pipeline("batched")
    batch = jnp.stack([jnp.asarray(image256), jnp.asarray(image256[::-1].copy())])
    cb, rb = p.roundtrip_batch(batch, CFG)
    assert cb.shape == rb.shape == batch.shape
    c0, r0 = p.roundtrip(batch[0], CFG)
    np.testing.assert_array_equal(np.asarray(rb[0]), np.asarray(r0))


def test_roundtrip_padded(rng):
    import jax.numpy as jnp

    p = get_pipeline("batched")
    img = rng.integers(0, 256, (60, 100)).astype(np.float32)
    c, r = p.roundtrip_padded(jnp.asarray(img), CFG)
    assert r.shape == (60, 100) and c.shape == (64, 104)
    mse = float(((np.asarray(r).astype(np.float64) - img) ** 2).mean())
    _, r_aligned = p.roundtrip(jnp.asarray(img[:56, :96]), CFG)
    mse_a = float(((np.asarray(r_aligned).astype(np.float64) - img[:56, :96]) ** 2).mean())
    assert abs(mse - mse_a) < 0.35 * max(mse_a, 1.0)  # padding shouldn't wreck quality


def test_roundtrip_channels(rng):
    # (H, W, C) color pass: channels coded independently via the batch axis.
    import jax.numpy as jnp

    img = rng.integers(0, 256, (64, 128, 3)).astype(np.float32)
    p = get_pipeline("hp")
    c, r = p.roundtrip_channels(jnp.asarray(img), CodecConfig())
    assert np.asarray(c).shape == (3, 64, 128)
    assert np.asarray(r).shape == (64, 128, 3) and np.asarray(r).dtype == np.uint8
    # each channel must equal the single-plane result
    for ch in range(3):
        c1, r1 = p.roundtrip(jnp.asarray(img[:, :, ch]), CodecConfig())
        np.testing.assert_array_equal(np.asarray(c)[ch], np.asarray(c1))
        np.testing.assert_array_equal(np.asarray(r)[:, :, ch], np.asarray(r1))


def test_streamed_roundtrip_matches_whole_image():
    """Band-streamed codec == whole-image codec, bitwise (blocks never
    cross band edges; tpudct/utils/streaming.py)."""
    import jax.numpy as jnp
    import numpy as np

    from tpudct import CodecConfig, get_pipeline
    from tpudct.utils.streaming import roundtrip_u8_streamed

    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, (96, 256), dtype=np.uint8)
    p = get_pipeline("hp")
    cfg = CodecConfig(interpret=True)
    c0, r0 = p.roundtrip_u8(jnp.asarray(img), cfg)
    c1, r1 = roundtrip_u8_streamed(p, img, cfg, band_rows=32)
    np.testing.assert_array_equal(c1, np.asarray(c0))
    np.testing.assert_array_equal(r1, np.asarray(r0))
    # preallocated (memmap-style) outputs fill in place
    oc = np.zeros((96, 256), np.int8)
    orr = np.zeros((96, 256), np.uint8)
    roundtrip_u8_streamed(p, img, cfg, band_rows=64, out_coeffs=oc, out_recon=orr)
    np.testing.assert_array_equal(oc, np.asarray(c0))
    np.testing.assert_array_equal(orr, np.asarray(r0))

    import pytest

    with pytest.raises(ValueError):
        roundtrip_u8_streamed(p, img[:90], cfg)  # 90 % 32 != 0
