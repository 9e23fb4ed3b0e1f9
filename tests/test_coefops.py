"""Lossless coefficient-domain geometric edits (utils/coefops.py).

Beyond-parity: the reference's only persisted artifact is a lossy
quality-100 pixel re-encode (utils.cu:98-147) — any geometric edit there
costs a generation.  These tests pin the jpegtran-grade guarantees:

- algebra: every registry transform has exact row reversal-parity, so
  the flip sign diagonal exists; edits compose and invert exactly on the
  stored integers (hflip² = vflip² = transpose² = rot90⁴ = id);
- pixel-domain agreement: decode(edit(stream)) equals op(decode(stream))
  bit-exactly for flips/crops (reordered-but-identical FP dot products)
  and within float-association ulps for transposing ops;
- q-table handling: transposes ride a transposed (embedded custom)
  table, canonicalized back to builtin names when values match;
- jpegtran -perfect semantics: misaligned edits refuse loudly;
- metadata: the TDCM chunk survives an edit.
"""

import numpy as np
import pytest

from tpudct import CodecConfig, get_pipeline
from tpudct.constants import TRANSFORMS, get_q_table
from tpudct.ops.padding import pad_to_blocks
from tpudct.utils import coefops, serialize


def _gray_stream(shape=(64, 48), transform="haweel", seed=0, q_table="luma"):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, shape).astype(np.float32)
    x, (h, w) = pad_to_blocks(img)
    cfg = CodecConfig(transform=transform, q_table=q_table)
    p = get_pipeline("hp")
    c = np.asarray(p.dct(np.asarray(x), cfg))
    data = serialize.coefficients_to_bytes(
        c, orig_shape=(h, w), transform=transform, q_table=q_table
    )
    return data, c, (h, w), p, cfg


def _color_stream(shape=(64, 32), subsample=True, seed=1):
    from tpudct.models.color import encode_color

    rng = np.random.default_rng(seed)
    rgb = rng.integers(0, 256, (*shape, 3)).astype(np.float32)
    p = get_pipeline("hp")
    cfg = CodecConfig()
    planes, meta = encode_color(p, rgb, cfg, subsample=subsample)
    return serialize.color_to_bytes(planes, meta), planes, meta, p, cfg


# ---- algebra -----------------------------------------------------------------


@pytest.mark.parametrize("name", sorted(TRANSFORMS))
def test_every_transform_has_flip_parity(name):
    d = coefops.flip_sign_diag(name)
    # all shipped bases share the DCT-II parity pattern (-1)^k
    assert np.array_equal(d, np.array([1, -1] * 4, np.float32))


def test_flip_involutions_exact():
    rng = np.random.default_rng(2)
    c = rng.integers(-100, 101, (24, 40)).astype(np.float32)
    for f in (
        lambda a: coefops.hflip_map(a, "haweel"),
        lambda a: coefops.vflip_map(a, "haweel"),
        coefops.transpose_map,
    ):
        assert np.array_equal(f(f(c)), c)


def test_rot90_four_times_is_identity_stream_level():
    data, c, _orig, _p, _cfg = _gray_stream()
    cur = data
    for _ in range(4):
        cur = coefops.edit_stream(cur, ["rot90"])
    plane, _ = serialize._parse_plane(cur)
    assert np.array_equal(plane["coeffs"], c)
    assert plane["q_table"] == "luma"  # canonicalized back to the builtin


def test_rot90_rot270_inverse_and_composition():
    data, c, _orig, _p, _cfg = _gray_stream(shape=(40, 56))
    back = coefops.edit_stream(coefops.edit_stream(data, ["rot90"]), ["rot270"])
    plane, _ = serialize._parse_plane(back)
    assert np.array_equal(plane["coeffs"], c)
    # rot180 == hflip+vflip in either order
    a = serialize._parse_plane(coefops.edit_stream(data, ["rot180"]))[0]
    b = serialize._parse_plane(coefops.edit_stream(data, ["hflip", "vflip"]))[0]
    assert np.array_equal(a["coeffs"], b["coeffs"])


# ---- pixel-domain agreement ---------------------------------------------------


@pytest.mark.parametrize("transform", ["haweel", "rdct", "wht", "bas", "dct"])
def test_flip_decodes_to_flipped_pixels_exactly(transform):
    data, c, (h, w), p, cfg = _gray_stream(transform=transform)
    rec0 = np.asarray(p.idct(c, cfg))
    for op, pix in (("hflip", lambda a: a[:, ::-1]), ("vflip", lambda a: a[::-1])):
        plane, _ = serialize._parse_plane(coefops.edit_stream(data, [op]))
        rec = np.asarray(p.idct(plane["coeffs"], cfg))
        # same FP dot products in permuted positions -> bit-exact
        assert np.array_equal(rec, pix(rec0)), op


def test_transpose_decodes_to_transposed_pixels():
    data, c, (h, w), p, cfg = _gray_stream()
    plane, _ = serialize._parse_plane(coefops.edit_stream(data, ["transpose"]))
    assert plane["orig_shape"] == (w, h)
    cfg_t = CodecConfig(q_table=plane["q_table"])
    rec = np.asarray(p.idct(plane["coeffs"], cfg_t))
    rec0 = np.asarray(p.idct(c, cfg))
    # transposed contraction reassociates the FP sums -> ulp-level only
    np.testing.assert_allclose(rec, rec0.T, atol=1e-4)


def test_crop_decodes_to_cropped_pixels_exactly():
    data, c, (h, w), p, cfg = _gray_stream(shape=(50, 41))
    out = coefops.edit_stream(data, [], crop=(8, 16, 30, 20))
    plane, _ = serialize._parse_plane(out)
    assert plane["orig_shape"] == (30, 20)
    rec = np.asarray(p.idct(plane["coeffs"], cfg))[:30, :20]
    rec0 = np.asarray(p.idct(c, cfg))
    assert np.array_equal(rec, rec0[8:38, 16:36])


@pytest.mark.parametrize("subsample", [True, "422", False])
def test_color_flips_decode_to_flipped_pixels(subsample):
    from tpudct.models.color import decode_color

    data, planes, meta, p, cfg = _color_stream(subsample=subsample)
    rec0 = np.asarray(decode_color(p, planes, meta, cfg))
    for op, pix in (("hflip", lambda a: a[:, ::-1]),
                    ("vflip", lambda a: a[::-1]),
                    ("rot180", lambda a: a[::-1, ::-1])):
        p2, m2 = serialize.bytes_to_color(coefops.edit_stream(data, [op]))
        rec = np.asarray(decode_color(p, p2, m2, cfg))
        assert np.array_equal(rec, pix(rec0)), (op, subsample)


def test_color_rot90_420():
    from tpudct.models.color import decode_color

    data, planes, meta, p, cfg = _color_stream()
    rec0 = np.asarray(decode_color(p, planes, meta, cfg))
    p2, m2 = serialize.bytes_to_color(coefops.edit_stream(data, ["rot90"]))
    assert m2["orig_shape"] == (meta["orig_shape"][1], meta["orig_shape"][0])
    rec = np.asarray(decode_color(p, p2, m2, cfg))
    want = rec0.transpose(1, 0, 2)[:, ::-1]
    # chroma ride through a transposed table + reassociated sums: u8 output
    # may move by 1 on reassociation-adjacent values only
    diff = np.abs(rec.astype(int) - want.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() <= 0.005


# ---- refusals (jpegtran -perfect semantics) -----------------------------------


def test_misaligned_flip_refuses():
    data, *_ = _gray_stream(shape=(50, 41))
    with pytest.raises(ValueError, match="multiple of 8"):
        coefops.edit_stream(data, ["hflip"])
    with pytest.raises(ValueError, match="multiple of 8"):
        coefops.edit_stream(data, ["vflip"])
    # transpose of a ragged image is always representable
    coefops.edit_stream(data, ["transpose"])


def test_420_flip_needs_16_alignment():
    data, *_ = _color_stream(shape=(56, 32))  # h = 56 = 8 mod 16
    with pytest.raises(ValueError, match="multiple of 16"):
        coefops.edit_stream(data, ["vflip"])
    coefops.edit_stream(data, ["hflip"])  # w = 32 is fine


def test_422_transpose_refuses():
    data, *_ = _color_stream(subsample="422")
    for op in ("transpose", "rot90", "rot270"):
        with pytest.raises(ValueError, match="4:4:0"):
            coefops.edit_stream(data, [op])


def test_crop_misalignment_and_bounds_refuse():
    data, *_ = _gray_stream()
    with pytest.raises(ValueError, match="8-aligned"):
        coefops.edit_stream(data, [], crop=(4, 0, 16, 16))
    with pytest.raises(ValueError, match="outside"):
        coefops.edit_stream(data, [], crop=(0, 0, 100, 16))


def test_unknown_op_refuses():
    data, *_ = _gray_stream()
    with pytest.raises(ValueError, match="unknown op"):
        coefops.edit_stream(data, ["rot45"])


# ---- container plumbing -------------------------------------------------------


def test_metadata_chunk_survives_edit():
    from tpudct.utils import jpegcoef

    data, *_ = _gray_stream()
    blob = b"\xffexif-ish payload\x00\x01"
    data_m = jpegcoef._attach_metadata(data, blob)
    out = coefops.edit_stream(data_m, ["hflip"])
    assert jpegcoef._extract_metadata(out) == blob
    # and the edited stream still parses
    serialize._parse_plane(out)


def test_metadata_not_duplicated_on_passthrough():
    # grayscale-only edit of an already-gray metadata-bearing stream is a
    # passthrough: the TDCM chunk must appear exactly once and repeat
    # edits must be byte-stable (regression: the tail was re-attached on
    # top of the embedded copy, growing every pass)
    from tpudct.utils import jpegcoef

    data, *_ = _gray_stream()
    blob = b"meta!"
    data_m = jpegcoef._attach_metadata(data, blob)
    out1 = coefops.edit_stream(data_m, [], grayscale=True)
    out2 = coefops.edit_stream(out1, [], grayscale=True)
    assert out1 == out2
    assert out1.count(b"TDCM") == 1
    assert jpegcoef._extract_metadata(out1) == blob


def test_custom_q_table_transposes_with_the_data():
    rng = np.random.default_rng(7)
    qt = rng.integers(1, 60, (8, 8)).astype(np.float32)
    from tpudct.constants import register_q_table

    name = register_q_table(qt)
    data, c, _orig, p, _cfg = _gray_stream(q_table=name)
    plane, _ = serialize._parse_plane(coefops.edit_stream(data, ["transpose"]))
    assert np.array_equal(get_q_table(plane["q_table"]), qt.T)


def test_mcu_padded_map_trims_before_edit():
    # a foreign stream may pad beyond ceil8(orig) (JPEG 4:2:0 MCUs pad
    # luma to 16s) — the extra pad blocks must not survive a transpose
    data, c, (h, w), p, cfg = _gray_stream(shape=(24, 24))
    cpad = np.zeros((32, 32), np.float32)
    cpad[:24, :24] = c
    padded = serialize.coefficients_to_bytes(cpad, orig_shape=(24, 24))
    plane, _ = serialize._parse_plane(coefops.edit_stream(padded, ["hflip"]))
    ref, _ = serialize._parse_plane(coefops.edit_stream(data, ["hflip"]))
    assert np.array_equal(plane["coeffs"], ref["coeffs"])


_needs_native = pytest.mark.skipif(
    not __import__("tpudct.utils.jpegcoef", fromlist=["x"]).coef_io_available(),
    reason="native coefficient I/O unavailable (make -C csrc)",
)


@_needs_native
def test_full_jpegtran_loop_color(tmp_path):
    """jpg → import → rot90 → export → jpg: the literal jpegtran workflow.
    The coefficient op is bit-exact (proven via reimport); pixel output is
    within ±1 of the pixel-domain rotation — libjpeg's own IDCT rounding
    on the rotated layout, the same property real jpegtran has."""
    from tpudct.utils import imageio, jpegcoef

    rng = np.random.default_rng(13)
    rgb = rng.integers(0, 256, (128, 160, 3)).astype(np.uint8)
    src = tmp_path / "c.jpg"
    imageio.save_jpeg(str(src), rgb, quality=90)
    data = jpegcoef.import_jpeg(str(src))
    out = coefops.edit_stream(data, ["rot90"])
    dst = tmp_path / "r.jpg"
    jpegcoef.export_jpeg(out, str(dst))
    # coefficient-level: reimport of the exported file is bit-equal
    pa, ma = serialize.bytes_to_color(out)
    pb, mb = serialize.bytes_to_color(jpegcoef.import_jpeg(str(dst)))
    for k in ("y", "cb", "cr"):
        a, b = np.asarray(pa[k]), np.asarray(pb[k])
        hh, ww = min(a.shape[0], b.shape[0]), min(a.shape[1], b.shape[1])
        assert np.array_equal(a[:hh, :ww], b[:hh, :ww]), k
    assert ma["orig_shape"] == mb["orig_shape"] == (160, 128)
    # pixel-level: within libjpeg's IDCT rounding of the true rotation
    a = np.asarray(imageio.load_image(str(src)))
    b = np.asarray(imageio.load_image(str(dst)))
    assert (np.abs(b.astype(int) - a.swapaxes(0, 1)[:, ::-1].astype(int)) <= 1).all()


@_needs_native
def test_jpegtran_loop_ragged_420(tmp_path):
    """Odd-sized 4:2:0 JPEG: flips refuse at 16-alignment (the MCU pad
    would move off the trailing edge), transpose stays representable and
    exports a valid file."""
    from tpudct.utils import imageio, jpegcoef

    rng = np.random.default_rng(14)
    rgb = rng.integers(0, 256, (130, 161, 3)).astype(np.uint8)
    src = tmp_path / "rag.jpg"
    imageio.save_jpeg(str(src), rgb, quality=90)
    data = jpegcoef.import_jpeg(str(src))
    with pytest.raises(ValueError, match="multiple of 16"):
        coefops.edit_stream(data, ["hflip"])
    out = coefops.edit_stream(data, ["transpose"])
    dst = tmp_path / "t.jpg"
    jpegcoef.export_jpeg(out, str(dst))
    a = np.asarray(imageio.load_image(str(src)))
    b = np.asarray(imageio.load_image(str(dst)))
    assert b.shape[:2] == (161, 130)
    assert (np.abs(b.astype(int) - a.swapaxes(0, 1).astype(int)) <= 1).all()


def test_grayscale_drops_chroma_losslessly():
    data, planes, meta, p, cfg = _color_stream()
    out = coefops.edit_stream(data, [], grayscale=True)
    assert not serialize.is_color_stream(out)
    plane, _ = serialize._parse_plane(out)
    assert np.array_equal(plane["coeffs"], np.asarray(planes["y"]))
    assert plane["orig_shape"] == tuple(meta["orig_shape"])
    assert plane["q_table"] == meta.get("y_q_table", "luma")
    # on a gray stream it's a no-op passthrough
    assert coefops.edit_stream(out, [], grayscale=True) == out
    # grayscale then flip runs under the laxer 8-alignment rules
    data56, *_ = _color_stream(shape=(56, 32))  # 4:2:0 vflip would refuse
    coefops.edit_stream(data56, ["vflip"], grayscale=True)


@_needs_native
def test_cli_edit_jpg_direct(tmp_path):
    """`edit in.jpg out.jpg --op rot90` — the jpegtran one-liner."""
    from tpudct.cli import main
    from tpudct.utils import imageio

    rng = np.random.default_rng(22)
    rgb = rng.integers(0, 256, (64, 96, 3)).astype(np.uint8)
    src = tmp_path / "c.jpg"
    imageio.save_jpeg(str(src), rgb, quality=90)
    dst = tmp_path / "r.jpg"
    assert main(["edit", str(src), str(dst), "--op", "rot90"]) == 0
    a = np.asarray(imageio.load_image(str(src)))
    b = np.asarray(imageio.load_image(str(dst)))
    assert b.shape[:2] == (96, 64)
    assert (np.abs(b.astype(int) - a.swapaxes(0, 1)[:, ::-1].astype(int)) <= 1).all()
    # --grayscale to a .tdc destination passes the container-type check
    assert main(["edit", str(src), str(tmp_path / "y.tdc"), "--grayscale"]) == 0
    # without it, a .tdc destination for a color jpg refuses
    assert main(["edit", str(src), str(tmp_path / "n.tdc"), "--op", "hflip"]) == 1


def test_cli_edit_roundtrip(tmp_path):
    from tpudct.cli import main

    data, c, _orig, _p, _cfg = _gray_stream()
    src = tmp_path / "a.tdc"
    dst = tmp_path / "b.tdc"
    src.write_bytes(data)
    assert main(["edit", str(src), str(dst), "--op", "rot90"]) == 0
    assert main(["edit", str(dst), str(dst), "--op", "rot270"]) == 0
    plane, _ = serialize._parse_plane(dst.read_bytes())
    assert np.array_equal(plane["coeffs"], c)
    # nothing to do refuses
    assert main(["edit", str(src), str(dst)]) == 1
    # container-type mismatch refuses
    assert main(["edit", str(src), str(tmp_path / "x.tdcc"), "--op", "hflip"]) == 1
