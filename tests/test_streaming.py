"""Streamed serialization: banded container <-> band-by-band device work
(VERDICT r3 #5 — beyond-HBM images through the CLI with bounded memory)."""

import json

import numpy as np
import pytest

from tpudct import CodecConfig, get_pipeline
from tpudct.cli import main
from tpudct.utils import serialize, streaming
from tpudct.utils.streaming import (
    decode_gray_streamed,
    encode_gray_streamed_bytes,
)


@pytest.fixture
def hp():
    return get_pipeline("hp")


def test_streamed_encode_decode_bit_identical_to_in_memory(hp, rng):
    """The streamed encode's decoded output equals the in-memory encode's
    decode bit-for-bit, at several band sizes incl. non-dividing ones."""
    import jax.numpy as jnp

    from tpudct.models.dispatch import decode_gray_auto, encode_gray_auto

    cfg = CodecConfig()
    img = rng.integers(0, 256, (200, 312), dtype=np.uint8)  # ragged size
    c_ref, (h, w) = encode_gray_auto(hp, img, cfg)
    rec_ref = decode_gray_auto(hp, c_ref, cfg, (h, w))
    for band_rows in (32, 96, 64, 4096):
        data, (h2, w2) = encode_gray_streamed_bytes(
            hp, img, cfg, band_rows=band_rows
        )
        assert (h2, w2) == (200, 312)
        # the container parses through the ordinary loader too
        back, _qs, _k, (oh, ow) = serialize.bytes_to_coefficients(
            data, with_orig_shape=True
        )
        assert (oh, ow) == (200, 312)
        np.testing.assert_array_equal(
            np.asarray(back, np.int16), np.asarray(c_ref, np.int16)
        )
        rec = decode_gray_streamed(hp, data, band_rows=band_rows)
        np.testing.assert_array_equal(rec, rec_ref)


def test_streamed_decode_nonbanded_stream(hp, rng):
    """Non-banded codecs still decode streamed (host entropy decode, device
    in bands) — bit-identical to the plain decode."""
    from tpudct.models.dispatch import decode_gray_auto, encode_gray_auto

    cfg = CodecConfig()
    img = rng.integers(0, 256, (128, 128), dtype=np.uint8)
    c, (h, w) = encode_gray_auto(hp, img, cfg)
    data = serialize.coefficients_to_bytes(
        np.asarray(c), orig_shape=(h, w), codec="rans"
    )
    rec = decode_gray_streamed(hp, data, band_rows=32)
    np.testing.assert_array_equal(rec, decode_gray_auto(hp, c, cfg, (h, w)))


def test_streamed_encode_validates(hp, rng):
    img = rng.integers(0, 256, (64, 128), dtype=np.uint8)
    with pytest.raises(ValueError, match="uint8"):
        encode_gray_streamed_bytes(hp, img.astype(np.float32), CodecConfig())
    with pytest.raises(ValueError, match="int8-safe"):
        encode_gray_streamed_bytes(hp, img, CodecConfig(q_scale=0.01))
    with pytest.raises(ValueError, match="255-segment"):
        encode_gray_streamed_bytes(
            hp, rng.integers(0, 256, (255 * 32 + 32, 128), dtype=np.uint8),
            CodecConfig(), band_rows=32,
        )


def test_streamed_decode_rejects_corrupt_banded(hp, rng):
    img = rng.integers(0, 256, (96, 128), dtype=np.uint8)
    data, _ = encode_gray_streamed_bytes(hp, img, CodecConfig(), band_rows=32)
    with pytest.raises(ValueError):
        decode_gray_streamed(hp, data[:-4])


def test_cli_band_rows_streams_partial_modes(tmp_path, rng, capsys):
    """--band-rows now STREAMS the partial-decode modes (round 5 — the
    round-4 refusal meant the archival layout could not be thumbnailed,
    previewed, ROI- or scale-decoded at all): each streamed mode's
    pixels equal its in-memory twin's bit-for-bit."""
    from tpudct.utils import imageio

    img = rng.integers(0, 256, (160, 136), dtype=np.uint8)
    src = tmp_path / "in.png"
    imageio.save_image(src, img)
    tdc = tmp_path / "g.tdc"
    assert main(["encode", "--band-rows", "64", str(src), str(tdc)]) == 0
    capsys.readouterr()
    for flags in (["--scale", "1/2"], ["--planes", "4"], ["--rows", "37:141"]):
        o1, o2 = tmp_path / "mem.png", tmp_path / "str.png"
        assert main(["decode", *flags, str(tdc), str(o1)]) == 0
        assert main(["decode", "--band-rows", "64", *flags,
                     str(tdc), str(o2)]) == 0
        capsys.readouterr()
        np.testing.assert_array_equal(
            imageio.load_image(o1), imageio.load_image(o2), err_msg=str(flags)
        )


def test_streamed_partial_modes_bit_identical(hp, rng):
    """decode_gray_streamed's n_planes / scale_m / row_range modes equal
    their in-memory twins bit-for-bit on banded AND non-banded streams
    (VERDICT r4 #1)."""
    from tpudct.models.dispatch import (
        decode_gray_auto, decode_gray_scaled_auto,
    )

    cfg = CodecConfig()
    img = rng.integers(0, 256, (200, 312), dtype=np.uint8)
    data, _ = encode_gray_streamed_bytes(hp, img, cfg, band_rows=64)
    coeffs, _qs, _k, (oh, ow) = serialize.bytes_to_coefficients(
        data, with_orig_shape=True
    )
    c16 = np.asarray(coeffs, np.int16)
    nonbanded = serialize.coefficients_to_bytes(
        c16, orig_shape=(oh, ow), codec="rans"
    )
    for blob in (data, nonbanded):
        # progressive
        ref = decode_gray_auto(
            hp, serialize._zero_high_planes(c16.copy(), 4), cfg, (oh, ow)
        )
        np.testing.assert_array_equal(
            decode_gray_streamed(hp, blob, band_rows=96, n_planes=4), ref
        )
        # fractional scale (one integer, one non-integer numerator)
        for m in (2, 3):
            ref = decode_gray_scaled_auto(hp, c16, cfg, (oh, ow), m)
            np.testing.assert_array_equal(
                decode_gray_streamed(hp, blob, band_rows=96, scale_m=m), ref
            )
        # ROI: only the covering block rows decode
        a, b = 37, 141
        a8, b8 = 32, 144
        ref = decode_gray_auto(
            hp, c16[a8:b8], cfg, (b8 - a8, ow)
        )[a - a8 : b - a8]
        got = decode_gray_streamed(hp, blob, band_rows=64, row_range=(a, b))
        assert got.shape == (b - a, ow)
        np.testing.assert_array_equal(got, ref)


def test_streamed_roi_skips_out_of_range_segments(hp, rng, monkeypatch):
    """ROI decode must not entropy-decode segments outside the range —
    the point of banded ROI on a beyond-HBM archive (VERDICT r4 #1)."""
    img = rng.integers(0, 256, (256, 128), dtype=np.uint8)
    data, _ = encode_gray_streamed_bytes(hp, img, CodecConfig(), band_rows=32)
    seen = []
    orig = serialize._decode_payload

    def spy(raw, code, h, w):
        seen.append(h)
        return orig(raw, code, h, w)

    monkeypatch.setattr(serialize, "_decode_payload", spy)
    decode_gray_streamed(hp, data, band_rows=32, row_range=(64, 96))
    assert sum(seen) == 32  # exactly one 32-row segment decoded


def test_banded_partial_coefficients_and_preview(rng):
    """serialize-level: partial_coefficients and preview_from_bytes accept
    banded streams with every inner stage, equal to the spectral stream's
    answers (VERDICT r4 #1)."""
    from tpudct.utils.entropy import native_entropy_available

    c = rng.integers(-90, 90, (96, 128)).astype(np.int16)
    spec = serialize.coefficients_to_bytes(c, orig_shape=(90, 121), codec="spectral")
    ref4 = serialize.partial_coefficients(spec, n_planes=4)["coeffs"]
    ref_pv = serialize.preview_from_bytes(spec)
    inners = ["spectral", "raw", "auto"]
    if native_entropy_available():
        inners += ["rans", "huffman"]
    for inner in inners:
        data = serialize.coefficients_to_bytes(
            c, orig_shape=(90, 121), codec=f"banded:3:{inner}"
        )
        np.testing.assert_array_equal(
            serialize.partial_coefficients(data, n_planes=4)["coeffs"], ref4,
            err_msg=inner,
        )
        np.testing.assert_array_equal(
            serialize.preview_from_bytes(data), ref_pv, err_msg=inner
        )
    # whole-stream interleaved codecs decode whole and mask: same answer
    # (no truncatable prefix exists, but the progressive contract holds)
    np.testing.assert_array_equal(
        serialize.partial_coefficients(
            serialize.coefficients_to_bytes(c, orig_shape=(90, 121), codec="raw"),
            n_planes=4,
        )["coeffs"],
        ref4,
    )


def test_streamed_color_partial_modes_bit_identical(hp, rng):
    """decode_color_streamed's n_planes / scale_m / row_range modes equal
    the in-memory CLI semantics bit-for-bit, incl. the h%16==8
    chroma-tail case (VERDICT r4 #1, color side)."""
    from tpudct.models.color import (
        decode_color, decode_color_scaled, normalize_subsample,
    )
    from tpudct.utils.streaming import (
        decode_color_streamed, encode_color_streamed_bytes,
    )

    cfg = CodecConfig(interpret=True)
    for (h, w) in ((200, 312), (104, 260)):  # 104 % 16 == 8: chroma tail
        first = (h, w) == (200, 312)
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        data, _ = encode_color_streamed_bytes(hp, img, cfg, band_rows=64)
        planes, meta = serialize.bytes_to_color(data)
        dcfg = CodecConfig(q_scale=meta["q_scale"], transform=meta["transform"])
        # progressive (first size only — the tail case exercises geometry,
        # which progressive shares with the plain path; keeps the suite
        # inside its 15-minute flag)
        if first:
            pl, pm = serialize.partial_color_coefficients(data, n_planes=4)
            ref = np.asarray(decode_color(hp, pl, pm, dcfg))
            np.testing.assert_array_equal(
                decode_color_streamed(hp, data, band_rows=64, n_planes=4), ref
            )
        # fractional scale: integer factor everywhere, the einsum M/8
        # numerator on the first size only (same cost argument)
        for m, fac in ((2, 4), (3, None)) if first else ((2, 4),):
            ref = np.asarray(decode_color_scaled(
                hp, planes, meta, dcfg, fac, m=None if fac else m
            ))
            got = decode_color_streamed(hp, data, band_rows=64, scale_m=m)
            np.testing.assert_array_equal(got, ref, err_msg=f"m={m}")
        # ROI, same slicing as the in-memory `decode --rows` path
        a, b = 37, 90
        mode = normalize_subsample(meta["subsample"])
        align = 16 if mode == "420" else 8
        a0 = a - a % align
        y1 = min(planes["y"].shape[0], -(-b // align) * align)
        c0 = a0 // 2
        c1 = (planes["cb"].shape[0]
              if y1 >= planes["y"].shape[0] else y1 // 2)
        sl = {"y": planes["y"][a0:y1],
              "cb": planes["cb"][c0:c1], "cr": planes["cr"][c0:c1]}
        smeta = {
            **meta,
            "orig_shape": (min(h, y1) - a0, w),
            "chroma_shape": (
                min(meta["chroma_shape"][0], c1) - c0,
                meta["chroma_shape"][1],
            ),
        }
        ref = np.asarray(decode_color(hp, sl, smeta, dcfg))[a - a0 : b - a0]
        got = decode_color_streamed(hp, data, band_rows=64, row_range=(a, b))
        np.testing.assert_array_equal(got, ref)


def test_streamed_color_bounded_residency(hp, rng, monkeypatch):
    """The color streamed decode's host residency is bounded: plane
    readers buffer at most ~one band + one segment of decoded rows, and
    segments arrive lazily (VERDICT r4 #2 — the round-4 version decoded
    all three planes whole before any device work)."""
    from tpudct.utils import streaming as st
    from tpudct.utils.streaming import (
        decode_color_streamed, encode_color_streamed_bytes,
    )

    cfg = CodecConfig(interpret=True)
    img = rng.integers(0, 256, (512, 256, 3), dtype=np.uint8)
    data, _ = encode_color_streamed_bytes(hp, img, cfg, band_rows=64)
    max_buf = []
    orig_pull = st._PlaneRows.pull

    def spy(self, nrows):
        out = orig_pull(self, nrows)
        max_buf.append(self._buf_rows)
        return out

    monkeypatch.setattr(st._PlaneRows, "pull", spy)
    rec = decode_color_streamed(hp, data, band_rows=64)
    # leftover buffered rows never exceed one segment (64 luma rows)
    assert max(max_buf) <= 64
    planes, meta = serialize.bytes_to_color(data)
    from tpudct.models.color import decode_color_auto

    np.testing.assert_array_equal(rec, np.asarray(decode_color_auto(
        hp, planes, meta,
        CodecConfig(q_scale=meta["q_scale"], transform=meta["transform"]),
    )))


def test_streamed_npy_output(hp, rng, tmp_path):
    """A .npy output writes the raster through a disk memmap band by band
    (bounded host output residency, VERDICT r4 #2) and loads back equal
    to the in-memory decode; the CLI path exercises the same flag."""
    from tpudct.models.dispatch import decode_gray_auto
    from tpudct.utils import imageio

    img = rng.integers(0, 256, (128, 136), dtype=np.uint8)
    data, _ = encode_gray_streamed_bytes(hp, img, CodecConfig(), band_rows=32)
    npy = tmp_path / "o.npy"
    rec = decode_gray_streamed(
        hp, data, band_rows=32, out_npy=str(npy)
    )
    assert isinstance(rec, np.memmap)
    rec.flush()
    coeffs = serialize.bytes_to_coefficients(data)[0]
    ref = decode_gray_auto(hp, coeffs, CodecConfig(), (128, 136))
    np.testing.assert_array_equal(np.load(npy), ref)
    # imageio round-trips .npy (save + mmap load)
    p2 = tmp_path / "r.npy"
    imageio.save_image(p2, ref)
    np.testing.assert_array_equal(imageio.load_image(p2, force_gray=False), ref)


def test_streamed_color_all_modes_bit_identical(hp, rng):
    """Streamed color encode emits plane-identical coefficients to the
    in-memory encode, and the streamed decode reproduces the in-memory
    reconstruction bit-for-bit — for every chroma mode, ragged sizes."""
    import jax.numpy as jnp

    from tpudct.models.color import decode_color_auto, encode_color_u8
    from tpudct.utils.streaming import (
        decode_color_streamed,
        encode_color_streamed_bytes,
    )

    cfg = CodecConfig(interpret=True)
    for mode, (h, w) in (("420", (200, 312)), ("422", (192, 256)),
                         (False, (130, 200))):
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        data, _ = encode_color_streamed_bytes(
            hp, img, cfg, band_rows=64, subsample=mode
        )
        planes_ref, meta_ref = encode_color_u8(
            hp, jnp.asarray(img), cfg, subsample=mode
        )
        planes, _meta = serialize.bytes_to_color(data)
        for k in ("y", "cb", "cr"):
            np.testing.assert_array_equal(
                np.asarray(planes[k], np.int16),
                np.asarray(planes_ref[k], np.int16),
            )
        rec_ref = np.asarray(decode_color_auto(hp, planes_ref, meta_ref, cfg))
        rec = decode_color_streamed(hp, data, band_rows=64)
        np.testing.assert_array_equal(rec, rec_ref)


def test_streamed_color_decode_f32_path_stream(hp, rng):
    """A .tdcc from the f32 encode path (non-integer-core transform)
    streams through decode_color_streamed on the f32 decode for EVERY
    band — one global path decision, identical to decode_color_auto
    (review finding: per-band path choice could mix int8/f32 decodes)."""
    import jax.numpy as jnp

    from tpudct.models.color import decode_color_auto, encode_color
    from tpudct.utils.serialize import bytes_to_color, color_to_bytes
    from tpudct.utils.streaming import decode_color_streamed

    cfg = CodecConfig(transform="dct")  # f32-only: u8 gate fails globally
    img = rng.integers(0, 256, (192, 256, 3), dtype=np.uint8)
    planes, meta = encode_color(hp, jnp.asarray(img, jnp.float32), cfg)
    data = color_to_bytes(planes, meta, cfg.q_scale, cfg.retain_k, cfg.transform)
    pl2, m2 = bytes_to_color(data)
    rec_ref = np.asarray(decode_color_auto(hp, pl2, m2, CodecConfig(
        q_scale=m2["q_scale"], transform=m2["transform"])))
    rec = decode_color_streamed(hp, data, band_rows=64)
    np.testing.assert_array_equal(rec, rec_ref)


def test_streamed_encode_rejects_banded_inner(hp, rng):
    """inner='banded' would nest containers every decoder rejects —
    refuse at WRITE time, both gray and color (review finding: silent
    permanent data loss)."""
    from tpudct.utils.streaming import (
        encode_color_streamed_bytes,
        encode_gray_streamed_bytes,
    )

    img = rng.integers(0, 256, (64, 128), dtype=np.uint8)
    with pytest.raises(ValueError, match="banded"):
        encode_gray_streamed_bytes(hp, img, CodecConfig(), inner="banded")
    rgb = rng.integers(0, 256, (64, 256, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="banded"):
        encode_color_streamed_bytes(
            hp, rgb, CodecConfig(interpret=True), inner="banded:4"
        )


def test_cli_color_auto_threshold_falls_back_for_f32_configs(
    tmp_path, rng, capsys, monkeypatch
):
    """The auto-stream size threshold must not turn a non-u8-eligible
    color encode (f32 transform) into an error: it falls back to the
    in-memory path; only an EXPLICIT --band-rows errors (review
    finding)."""
    from tpudct.utils import imageio, streaming

    img = rng.integers(0, 256, (128, 256, 3), dtype=np.uint8)
    src = tmp_path / "in.png"
    imageio.save_image(src, img)
    monkeypatch.setattr(streaming, "STREAM_PIXELS", 1000)  # force threshold
    out = tmp_path / "o.tdcc"
    assert main(["encode", "--color", "--transform", "dct",
                 str(src), str(out)]) == 0
    rep = json.loads(capsys.readouterr().out.strip())
    assert "streamed" not in rep  # in-memory f32 path took it
    assert main(["decode", str(out), str(tmp_path / "o.png")]) == 0
    capsys.readouterr()
    # eligible configs still stream past the threshold
    out2 = tmp_path / "o2.tdcc"
    assert main(["encode", "--color", str(src), str(out2)]) == 0
    rep2 = json.loads(capsys.readouterr().out.strip())
    assert rep2["streamed"] is True


def test_streamed_color_edge_cases(hp, rng):
    """Tiny images (below one band), planar input layout, and dtype/shape
    validation on the streamed color path."""
    import jax.numpy as jnp

    from tpudct.models.color import decode_color_auto, encode_color_u8
    from tpudct.utils.streaming import (
        decode_color_streamed,
        encode_color_streamed_bytes,
    )

    cfg = CodecConfig(interpret=True)
    # smaller than one 64-row band, planar (3, H, W) layout
    img = rng.integers(0, 256, (3, 40, 150), dtype=np.uint8)
    data, (h, w) = encode_color_streamed_bytes(hp, img, cfg, band_rows=64)
    assert (h, w) == (40, 150)
    pl_ref, meta_ref = encode_color_u8(hp, jnp.asarray(img), cfg)
    rec_ref = np.asarray(decode_color_auto(hp, pl_ref, meta_ref, cfg))
    np.testing.assert_array_equal(
        decode_color_streamed(hp, data, band_rows=64), rec_ref
    )
    with pytest.raises(ValueError, match="uint8"):
        encode_color_streamed_bytes(hp, img.astype(np.float32), cfg)
    with pytest.raises(ValueError, match="RGB"):
        encode_color_streamed_bytes(hp, img[0], cfg)
    # preallocated output validation
    with pytest.raises(ValueError, match="preallocated"):
        decode_color_streamed(hp, data, out=np.empty((40, 150), np.uint8))


def test_cli_streamed_color_roundtrip(tmp_path, rng, capsys):
    """`encode --color --band-rows` streams (round 4) and the result
    decodes — streamed and whole-image paths produce identical pixels."""
    from tpudct.utils import imageio

    img = rng.integers(0, 256, (192, 256, 3), dtype=np.uint8)
    src = tmp_path / "in.png"
    imageio.save_image(src, img)
    t1, t2 = tmp_path / "whole.tdcc", tmp_path / "stream.tdcc"
    assert main(["encode", "--color", str(src), str(t1)]) == 0
    capsys.readouterr()
    assert main(["encode", "--color", "--band-rows", "64",
                 str(src), str(t2)]) == 0
    rep = json.loads(capsys.readouterr().out.strip())
    assert rep["streamed"] is True and rep["color"] is True
    o1, o2, o3 = (tmp_path / f"o{i}.png" for i in range(3))
    assert main(["decode", str(t1), str(o1)]) == 0
    assert main(["decode", str(t2), str(o2)]) == 0
    assert main(["decode", "--band-rows", "64", str(t2), str(o3)]) == 0
    a, b, c = (imageio.load_image(p, force_gray=False) for p in (o1, o2, o3))
    np.testing.assert_array_equal(b, c)  # streamed decode == plain decode
    np.testing.assert_array_equal(a, b)  # streamed encode == whole encode


def test_streamed_encode_every_inner_roundtrips(hp, rng):
    """Every --entropy stage survives the streamed path (regression: the
    int8 device slab fed straight to the `raw` inner wrote 1-byte
    elements its int16 decoder could not parse — a successfully written,
    permanently undecodable archive)."""
    from tpudct.models.dispatch import decode_gray_auto, encode_gray_auto
    from tpudct.utils.entropy import native_entropy_available

    cfg = CodecConfig()
    img = rng.integers(0, 256, (96, 136), dtype=np.uint8)
    c_ref, (h, w) = encode_gray_auto(hp, img, cfg)
    rec_ref = np.asarray(decode_gray_auto(hp, c_ref, cfg, (h, w)))
    inners = ["raw", "spectral", "auto"]
    if native_entropy_available():
        inners += ["rans", "huffman"]
    for inner in inners:
        data, _ = encode_gray_streamed_bytes(
            hp, img, cfg, band_rows=32, inner=inner
        )
        rec = decode_gray_streamed(hp, data, band_rows=32)
        np.testing.assert_array_equal(rec, rec_ref)
        # the ordinary whole-map loader reads it too
        back = serialize.bytes_to_coefficients(data)[0]
        np.testing.assert_array_equal(
            np.asarray(back, np.int16), np.asarray(c_ref, np.int16)
        )


def test_streamed_decode_rejects_oversized_orig_shape(hp, rng):
    """A corrupt header claiming orig_shape beyond the coefficient map
    must raise, not ship uninitialized np.empty rows (regression: the
    streamed parser skipped the bounds check the whole-map parser has)."""
    c = rng.integers(-90, 90, (64, 128)).astype(np.int16)
    _code, payload = serialize._encode_payload(c, "spectral", 6)
    bad = serialize._wrap_v4(
        64, 128, serialize._CODEC_SPECTRAL, payload, 1.0, None,
        (64 + 8, 128), "haweel", "luma",
    )
    with pytest.raises(ValueError, match="exceeds"):
        decode_gray_streamed(hp, bad)


def test_streamed_decode_band_rows_bounds_device_passes(hp, rng, monkeypatch):
    """--band-rows bounds the per-dispatch rows even when the stream's
    segments are larger (regression: a banded:1 stream decoded as one
    whole-image device pass regardless of the requested bound)."""
    from tpudct.models import dispatch

    img = rng.integers(0, 256, (128, 128), dtype=np.uint8)
    data, _ = encode_gray_streamed_bytes(
        hp, img, CodecConfig(), band_rows=4096  # one big segment
    )
    seen = []
    real = dispatch.decode_gray_auto

    def spy(p, c, cfg, shape):
        seen.append(c.shape[0])
        return real(p, c, cfg, shape)

    monkeypatch.setattr(dispatch, "decode_gray_auto", spy)
    rec = decode_gray_streamed(hp, data, band_rows=32)
    assert seen and max(seen) <= 32
    np.testing.assert_array_equal(
        rec, real(hp, serialize.bytes_to_coefficients(data)[0],
                  CodecConfig(), (128, 128))
    )


def test_cli_encode_decode_band_rows(tmp_path, rng, capsys):
    """`encode --band-rows` writes a banded stream; `decode --band-rows`
    reads it; pixels equal the plain encode/decode of the same image."""
    from tpudct.utils import imageio

    img = rng.integers(0, 256, (160, 136), dtype=np.uint8)
    src = tmp_path / "in.png"
    imageio.save_image(src, img)
    t1, t2 = tmp_path / "plain.tdc", tmp_path / "stream.tdc"
    assert main(["encode", str(src), str(t1)]) == 0
    capsys.readouterr()
    assert main(["encode", "--band-rows", "64", str(src), str(t2)]) == 0
    rep = json.loads(capsys.readouterr().out.strip())
    assert rep["streamed"] is True
    info = serialize.inspect_stream(t2.read_bytes())
    assert info["codec"] == "banded" and info["segments"] == 3  # 160/64
    o1, o2 = tmp_path / "plain.png", tmp_path / "stream.png"
    assert main(["decode", str(t1), str(o1)]) == 0
    assert main(["decode", "--band-rows", "64", str(t2), str(o2)]) == 0
    capsys.readouterr()
    np.testing.assert_array_equal(
        imageio.load_image(o1), imageio.load_image(o2)
    )
    # streamed decode of the PLAIN stream also matches
    o3 = tmp_path / "plain_streamed.png"
    assert main(["decode", "--band-rows", "32", str(t1), str(o3)]) == 0
    capsys.readouterr()
    np.testing.assert_array_equal(
        imageio.load_image(o1), imageio.load_image(o3)
    )


def test_cli_auto_stream_threshold(tmp_path, rng, capsys, monkeypatch):
    """Images above STREAM_PIXELS auto-band with no flag (threshold
    monkeypatched down so CI exercises the gate, not 4-gigapixel data)."""
    from tpudct.utils import imageio

    monkeypatch.setattr(streaming, "STREAM_PIXELS", 64 * 64)
    img = rng.integers(0, 256, (96, 128), dtype=np.uint8)
    src = tmp_path / "in.png"
    imageio.save_image(src, img)
    tdc = tmp_path / "auto.tdc"
    assert main(["encode", str(src), str(tdc)]) == 0
    rep = json.loads(capsys.readouterr().out.strip())
    assert rep.get("streamed") is True
    assert serialize.inspect_stream(tdc.read_bytes())["codec"] == "banded"
    out = tmp_path / "out.png"
    assert main(["decode", str(tdc), str(out)]) == 0
    msg = capsys.readouterr().out
    assert "streamed" in msg
    # equality vs the in-memory pipeline on the same stream
    monkeypatch.setattr(streaming, "STREAM_PIXELS", 1 << 32)
    out2 = tmp_path / "out2.png"
    assert main(["decode", str(tdc), str(out2)]) == 0
    capsys.readouterr()
    np.testing.assert_array_equal(
        imageio.load_image(out), imageio.load_image(out2)
    )


def test_batch_streams_oversized_frames(tmp_path, rng, capsys, monkeypatch):
    """`batch` routes frames above the threshold through the streamed
    encoder; the manifest records them and `unbatch` decodes them."""
    from tpudct.utils import imageio

    monkeypatch.setattr(streaming, "STREAM_PIXELS", 64 * 64)
    src = tmp_path / "in"
    dst = tmp_path / "out"
    src.mkdir()
    big = rng.integers(0, 256, (128, 128), dtype=np.uint8)
    small = rng.integers(0, 256, (48, 48), dtype=np.uint8)
    imageio.save_image(src / "big.png", big)
    imageio.save_image(src / "small.png", small)
    assert main(["batch", str(src), str(dst)]) == 0
    rep = json.loads(capsys.readouterr().out.strip())
    assert rep["encoded"] == 2 and rep["failed"] == 0
    recs = [json.loads(l) for l in (dst / "manifest.jsonl").read_text().splitlines()]
    by = {r["file"]: r for r in recs}
    assert by["big.png"].get("streamed") is True
    assert "streamed" not in by["small.png"]
    assert serialize.inspect_stream(
        (dst / "big.png.tdc").read_bytes()
    )["codec"] == "banded"
    jout = tmp_path / "jpgs"
    assert main(["unbatch", "--ext", ".png", str(dst), str(jout)]) == 0
    rep2 = json.loads(capsys.readouterr().out.strip())
    assert rep2["decoded"] == 2 and rep2["failed"] == 0
    # round 5: the oversized archive DECODES streamed too (the wave
    # machinery would load its whole map), marked in the manifest, with
    # pixels identical to the direct streamed decode
    urecs = {json.loads(l)["file"]: json.loads(l)
             for l in (jout / "manifest.jsonl").read_text().splitlines()}
    assert urecs["big.png.tdc"].get("streamed") is True
    assert "streamed" not in urecs["small.png.tdc"]
    direct = streaming.decode_gray_streamed(
        get_pipeline("hp"), (dst / "big.png.tdc").read_bytes()
    )
    np.testing.assert_array_equal(
        imageio.load_image(jout / "big.png.tdc.png"), direct
    )


def test_streamed_color_rejects_corrupt_trailing_payload(hp, rng):
    """A banded plane payload with junk trailing bytes (valid prefix
    still covers every declared row) must raise from the streamed color
    decoder too — the band loop's pulls exactly consume the rows, so the
    readers are explicitly drained to run the end-of-payload framing
    validation (review finding, round 5)."""
    import struct

    from tpudct.utils.streaming import (
        decode_color_streamed, encode_color_streamed_bytes,
    )

    cfg = CodecConfig(interpret=True)
    rgb = rng.integers(0, 256, (128, 256, 3), dtype=np.uint8)
    data, _ = encode_color_streamed_bytes(hp, rgb, cfg, band_rows=64)
    # corrupt the Y plane: append junk inside its banded payload and fix
    # the plane header's payload size + the container's plane length
    hsizec = struct.calcsize(serialize._HEADERC)
    (ylen,) = struct.unpack("<I", data[hsizec : hsizec + 4])
    y = bytearray(data[hsizec + 4 : hsizec + 4 + ylen])
    hdr = serialize._parse_plane_header(bytes(y))
    psize, hsize = hdr[9], hdr[10]
    y[hsize + psize : hsize + psize] = b"JUNK!"
    struct.pack_into("<I", y, struct.calcsize(serialize._HEADER4) - 4, psize + 5)
    bad = (data[:hsizec] + struct.pack("<I", len(y)) + bytes(y)
           + data[hsizec + 4 + ylen :])
    with pytest.raises(ValueError, match="banded payload"):
        serialize.bytes_to_color(bad)  # the in-memory parser raises...
    with pytest.raises(ValueError, match="banded payload"):
        decode_color_streamed(hp, bad, band_rows=64)  # ...and now so do we


def test_streamed_color_rejects_inconsistent_chroma_geometry(hp, rng):
    """A .tdcc whose chroma planes declare a geometry inconsistent with
    the subsample mode must be refused by the streamed decoder (the
    in-memory parser decodes per the declared shape; the streamed band
    loop derives chroma geometry from luma, so silently proceeding would
    produce different output — refuse instead; review finding)."""
    import jax.numpy as jnp

    from tpudct.models.color import encode_color_auto
    from tpudct.utils.streaming import decode_color_streamed

    rgb = rng.integers(0, 256, (128, 256, 3), dtype=np.uint8)
    planes, meta = encode_color_auto(hp, jnp.asarray(rgb), CodecConfig(interpret=True))
    planes = {k: np.asarray(v) for k, v in planes.items()}
    bad_meta = {**meta, "chroma_shape": (meta["chroma_shape"][0] - 2,
                                         meta["chroma_shape"][1])}
    # planes stay at their real (8-aligned) shapes; only the declared
    # chroma orig_shape lies
    data = serialize.color_to_bytes(planes, bad_meta, 1.0, None, "haweel",
                                    codec="raw")
    with pytest.raises(ValueError, match="chroma"):
        decode_color_streamed(hp, data, band_rows=64)
