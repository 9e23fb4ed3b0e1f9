"""Property/fuzz tests: random shapes x pipelines x configs against the
float64 golden model (tests/golden.py).  Everything here runs on the
forced-CPU mesh; shapes stay small so the whole file is a few seconds."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpudct import CodecConfig, get_pipeline
from tests.golden import golden_dct, golden_roundtrip


@pytest.mark.parametrize("seed", range(6))
def test_random_shape_roundtrip_matches_golden(seed):
    rng = np.random.default_rng(100 + seed)
    h = 8 * int(rng.integers(1, 20))
    w = 8 * int(rng.integers(1, 20))
    k = [None, 6, 8, 10][seed % 4]
    qs = [1.0, 1.0, 2.0, 0.5][seed % 4]
    name = ["hp", "fast", "batched"][seed % 3]
    img = rng.integers(0, 256, (h, w)).astype(np.float32)

    cfg = CodecConfig(retain_k=k, q_scale=qs)
    c, r = get_pipeline(name).roundtrip(jnp.asarray(img), cfg)
    gc, gr = golden_roundtrip(img, q_scale=qs, retain_k=k)

    c = np.asarray(c)
    # Coefficients: exact up to the documented .5-tie class.
    assert np.abs(c - gc).max() <= 1.0, (name, h, w, k, qs)
    assert int((c != gc).sum()) <= max(4, c.size // 100)
    # Reconstruction: each flipped coefficient moves its block's pixels by
    # at most ~q/2 after truncation.
    assert np.abs(np.asarray(r).astype(int) - gr.astype(int)).max() <= 64


def test_extreme_q_scale_roundtrip():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (64, 64)).astype(np.float32)
    for qs in (0.25, 4.0, 16.0):
        c, r = get_pipeline("hp").roundtrip(jnp.asarray(img), CodecConfig(q_scale=qs))
        gc, gr = golden_roundtrip(img, q_scale=qs)
        assert np.abs(np.asarray(c) - gc).max() <= 1.0, qs
        assert np.asarray(r).dtype == np.uint8


def test_constant_image_is_lossless_dc():
    # A flat image is pure DC; reconstruction must be near-exact for any k>=1.
    img = np.full((64, 128), 200.0, np.float32)
    for name in ("hp", "fast", "batched"):
        c, r = get_pipeline(name).roundtrip(jnp.asarray(img), CodecConfig(retain_k=1))
        assert np.abs(np.asarray(r).astype(float) - 200.0).max() <= 8.0, name


def test_uint8_input_does_not_wrap():
    # uint8 pixel 5 must level-shift to -123, not wrap to 133 (mod 256).
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (64, 128)).astype(np.uint8)
    for name in ("hp", "fast", "batched"):
        c, r = get_pipeline(name).roundtrip(jnp.asarray(img), CodecConfig())
        gc, gr = golden_roundtrip(img.astype(np.float32))
        assert np.abs(np.asarray(c) - gc).max() <= 1.0, name


# ---- color-path fuzz --------------------------------------------------------


@pytest.mark.parametrize("seed", range(6))
def test_random_color_roundtrip_and_serialize(seed):
    """Random sizes (odd allowed) x pipelines x configs through the full
    color path: encode -> .tdcc bytes -> parse -> decode.  Guards padding,
    4:2:0 odd-dimension handling, the q_table threading and the spectral
    entropy codec in one sweep."""
    from tpudct.models.color import decode_color, encode_color
    from tpudct.utils import serialize

    rng = np.random.default_rng(300 + seed)
    h = int(rng.integers(17, 180))
    w = int(rng.integers(17, 180))
    k = [None, 6, 8][seed % 3]
    sub = bool(seed % 2)
    name = ["hp", "batched", "fast"][seed % 3]
    rgb = rng.integers(0, 256, (h, w, 3)).astype(np.float32)

    cfg = CodecConfig(interpret=True, retain_k=k)
    p = get_pipeline(name)
    planes, meta = encode_color(p, jnp.asarray(rgb), cfg, subsample=sub)
    blob = serialize.color_to_bytes(
        {n: np.asarray(v) for n, v in planes.items()}, meta,
        cfg.q_scale, cfg.retain_k, cfg.transform,
    )
    planes2, meta2 = serialize.bytes_to_color(blob)
    assert meta2["orig_shape"] == (h, w)
    assert meta2["subsample"] == ("420" if sub else False)
    rec = np.asarray(decode_color(p, planes2, meta2, cfg))
    assert rec.shape == (h, w, 3) and rec.dtype == np.uint8
    # Lossy but sane: uniform-noise chroma is unrecoverable under 4:2:0 +
    # zonal retention, so bound against the input's own variance — the
    # codec must always beat predicting the mean.
    mse = ((rec.astype(np.float64) - rgb) ** 2).mean()
    var = ((rgb - rgb.mean()) ** 2).mean()
    assert mse < 0.95 * var, (seed, name, h, w, k, sub, mse, var)


@pytest.mark.parametrize("seed", range(4))
def test_random_u8_color_auto_path(seed):
    """Aligned random geometries through the auto dispatch (u8 kernels when
    eligible) in both layouts."""
    from tpudct.models.color import roundtrip_color_auto, supports_color_u8

    rng = np.random.default_rng(400 + seed)
    h = 64 * int(rng.integers(1, 4))
    w = 256 * int(rng.integers(1, 3))
    rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    p = get_pipeline("hp")
    cfg = CodecConfig(interpret=True)
    assert supports_color_u8(p, cfg, h, w)
    pi, mi, r1 = roundtrip_color_auto(p, jnp.asarray(rgb), cfg)
    _pp, _mp, r2 = roundtrip_color_auto(p, jnp.moveaxis(jnp.asarray(rgb), -1, 0), cfg)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    assert np.asarray(pi["y"]).dtype == np.int8


@pytest.mark.parametrize("seed", range(6))
def test_custom_qtable_stream_fuzz(seed):
    """Adversarial bytes against the custom-q-table container path: random
    tables through encode->bytes->decode with a wiped registry, then
    mutations of the embedded table block must raise ValueError (never
    crash, never register garbage)."""
    from tpudct.constants import Q_TABLES, register_q_table
    from tpudct.utils import serialize

    rng = np.random.default_rng(500 + seed)
    tbl = rng.uniform(1.0, 255.0, (8, 8)).astype(np.float32)
    name = register_q_table(tbl)
    c = rng.integers(-90, 90, (32, 64)).astype(np.float32)
    data = serialize.coefficients_to_bytes(c, q_table=name)
    snap = dict(Q_TABLES)
    try:
        del Q_TABLES[name]
        out, _qs, _k, _sh, _tr, qt = serialize.bytes_to_coefficients(
            data, True, True, True
        )
        np.testing.assert_array_equal(out, c)
        assert qt == name
        # corrupt one byte inside the 256-byte table block -> must raise or
        # decode under a DIFFERENT content name (never the original name
        # with wrong values)
        import struct

        hl = struct.calcsize(serialize._HEADER4)
        pos = hl + int(rng.integers(0, 256))
        bad = bytearray(data)
        bad[pos] ^= 0xFF
        del Q_TABLES[name]
        try:
            _o, _q, _k2, _s2, _t2, qt2 = serialize.bytes_to_coefficients(
                bytes(bad), True, True, True
            )
            assert qt2 != name or np.array_equal(Q_TABLES[qt2], tbl)
        except ValueError:
            pass  # NaN/negative table entries correctly refused
        # truncate inside the table block
        with pytest.raises(ValueError):
            serialize.bytes_to_coefficients(data[: hl + 100])
    finally:
        Q_TABLES.clear()
        Q_TABLES.update(snap)


def test_fuzz_jpeg_marker_walker(rng):
    """The TDCM marker walker/splicer (utils/jpegcoef.py) must never
    crash on arbitrary bytes, and on real JPEG headers the splice must
    be a fixed point: splicing a file's own markers back reproduces a
    file whose markers read identically."""
    from tpudct.utils import jpegcoef

    for n in (0, 1, 2, 3, 4, 16, 64, 300):
        for _ in range(20):
            blob = bytes(rng.integers(0, 256, n, dtype=np.uint8))
            jpegcoef._jpeg_markers(blob)  # must not raise
            jpegcoef._splice_markers(blob, b"\xff\xe1\x00\x04ab")
        # SOI-prefixed garbage too (exercises the segment loop)
        blob = b"\xff\xd8" + bytes(rng.integers(0, 256, n, dtype=np.uint8))
        jpegcoef._jpeg_markers(blob)
        jpegcoef._splice_markers(blob, b"")

    if not jpegcoef.coef_io_available():
        return
    import tempfile

    from tpudct.utils import imageio

    img = (rng.normal(128, 40, (24, 24)).clip(0, 255)).astype(np.uint8)
    with tempfile.TemporaryDirectory() as d:
        p = f"{d}/x.jpg"
        imageio.save_jpeg(p, img, quality=85)
        jpg = open(p, "rb").read()
        markers = jpegcoef._jpeg_markers(jpg)
        respliced = jpegcoef._splice_markers(jpg, markers)
        assert jpegcoef._jpeg_markers(respliced) == markers
        # pixel stream untouched by splicing
        q = f"{d}/y.jpg"
        open(q, "wb").write(respliced)
        np.testing.assert_array_equal(imageio.load_jpeg(p), imageio.load_jpeg(q))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fuzz_banded_partial_walkers(seed):
    """Byte-mutation fuzz of the round-5 partial-decode surface: the
    banded segment walker, the spectral-prefix reader, and the preview
    path must either return valid data or raise ValueError — never
    crash, hang, or return out-of-contract shapes (the same contract the
    C coders' ASan fuzz enforces, applied to the Python framing
    layer)."""
    from tpudct.utils import serialize

    rng = np.random.default_rng(seed)
    c = rng.integers(-90, 90, (96, 128)).astype(np.int16)
    for codec in ("banded:3:spectral", "banded:3:raw", "banded:2:auto"):
        data = bytearray(serialize.coefficients_to_bytes(
            c, orig_shape=(90, 121), codec=codec
        ))
        # valid stream first: all three walkers succeed
        assert serialize.partial_coefficients(bytes(data), 4)["coeffs"].shape == (96, 128)
        assert serialize.preview_from_bytes(bytes(data)).shape == (12, 16)
        for _ in range(60):
            mut = bytearray(data)
            for _k in range(rng.integers(1, 8)):
                mut[rng.integers(0, len(mut))] = rng.integers(0, 256)
            if rng.integers(0, 4) == 0:
                mut = mut[: rng.integers(1, len(mut))]  # truncation
            blob = bytes(mut)
            for fn in (
                lambda b: serialize.partial_coefficients(b, 4),
                serialize.preview_from_bytes,
                lambda b: serialize.bytes_to_coefficients(b),
            ):
                try:
                    fn(blob)
                except ValueError:
                    pass  # the only acceptable failure mode
