"""Transform registry tests (beyond parity: the reference hardcodes one
transform in 9 translation units; the framework is transform-pluggable)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpudct import CodecConfig, get_pipeline
from tpudct.constants import TRANSFORMS, get_transform
from tests.golden import golden_roundtrip


def test_registry_orthogonality():
    for name, tr in TRANSFORMS.items():
        err = np.abs(tr.t.astype(np.float64) @ tr.t.T.astype(np.float64) - np.eye(8)).max()
        assert err < 1e-6, name
        if tr.has_integer_core:
            # T = diag(d) @ Ts must hold exactly
            np.testing.assert_allclose(
                tr.d[:, None] * tr.ts.astype(np.float32), tr.t, atol=1e-6
            )


def test_unknown_transform_rejected():
    with pytest.raises(ValueError):
        get_transform("fft")


@pytest.mark.parametrize("transform", ["haweel", "rdct", "wht", "bas", "dct"])
@pytest.mark.parametrize("name", ["hp", "batched"])
def test_roundtrip_matches_golden_per_transform(rng, transform, name):
    img = rng.integers(0, 256, (128, 256)).astype(np.float32)
    cfg = CodecConfig(transform=transform)
    c, r = get_pipeline(name).roundtrip(jnp.asarray(img), cfg)
    gc, gr = golden_roundtrip(img, t=get_transform(transform).t)
    c = np.asarray(c)
    assert np.abs(c - gc).max() <= 1.0, (name, transform)
    assert int((c != gc).sum()) <= max(4, c.size // 100)
    assert np.abs(np.asarray(r).astype(int) - gr.astype(int)).max() <= 64


def test_fast_requires_integer_core(rng):
    img = rng.integers(0, 256, (64, 128)).astype(np.float32)
    with pytest.raises(ValueError):
        get_pipeline("fast").dct(jnp.asarray(img), CodecConfig(transform="dct"))
    # rdct has a {0,+-1} core: the int8 path must work
    c, r = get_pipeline("fast").roundtrip(jnp.asarray(img), CodecConfig(transform="rdct"))
    gc, _ = golden_roundtrip(img, t=get_transform("rdct").t)
    assert np.abs(np.asarray(c) - gc).max() <= 1.0


def test_exact_dct_beats_approximations(rng):
    # The exact DCT-II must compact energy at least as well as the
    # approximations on a smooth image (the reason approximations exist is
    # speed, not quality).
    x = np.linspace(0, 255, 128)[:, None] + np.linspace(0, 64, 128)[None, :]
    img = x.astype(np.float32)
    mses = {}
    for t in ("dct", "haweel", "rdct"):
        _, r = get_pipeline("hp").roundtrip(jnp.asarray(img), CodecConfig(transform=t, retain_k=6))
        mses[t] = ((np.asarray(r).astype(float) - img) ** 2).mean()
    assert mses["dct"] <= mses["haweel"] * 1.05 and mses["dct"] <= mses["rdct"] * 1.05


def test_tdc_records_transform(tmp_path, rng):
    from tpudct.utils import serialize

    c = rng.integers(-50, 50, (64, 64)).astype(np.float32)
    path = tmp_path / "x.tdc"
    serialize.save_coefficients(path, c, transform="rdct")
    back, qs, k, tname = serialize.load_coefficients(path, with_transform=True)
    assert tname == "rdct"
    np.testing.assert_array_equal(back, c)


def test_tdc_v2_backcompat(tmp_path, rng):
    # Hand-build a v2 stream; it must load with transform defaulting haweel.
    import struct, zlib

    c = rng.integers(-50, 50, (16, 16)).astype(np.int16)
    payload = zlib.compress(c.tobytes(), 6)
    header = struct.pack("<4sIIIIfiI", b"TDC2", 16, 16, 0, 0, 1.0, -1, len(payload))
    p = tmp_path / "old.tdc"
    p.write_bytes(header + payload)
    from tpudct.utils import serialize

    back, qs, k, (h, w), tname = serialize.load_coefficients(
        p, with_orig_shape=True, with_transform=True
    )
    assert tname == "haweel" and (h, w) == (16, 16)
    np.testing.assert_array_equal(back, c.astype(np.float32))


def test_wht_core_is_sequency_ordered_hadamard():
    tr = get_transform("wht")
    ts = tr.ts.astype(np.int64)
    # +-1 entries, exactly orthogonal, rows in increasing sequency order.
    assert set(np.unique(ts)) == {-1, 1}
    np.testing.assert_array_equal(ts @ ts.T, 8 * np.eye(8, dtype=np.int64))
    seq = (np.diff(ts, axis=1) != 0).sum(axis=1)
    assert list(seq) == list(range(8))


def test_cb2011_is_rdct_alias():
    """The Cintra-Bayer 2011 transform is DEFINED as round(2*DCT8)
    (arXiv 1402.6034), which is exactly the derived rdct core — the
    registry exposes it as an alias of the same Transform object, and
    streams encoded under either name decode identically."""
    assert get_transform("cb2011") is get_transform("rdct")
    cb = get_transform("cb2011").ts.astype(np.int64)
    np.testing.assert_array_equal(cb @ cb.T, np.diag([8, 6, 4, 6, 8, 6, 4, 6]))
    assert int((cb != 0).sum()) == 48


def test_bas_low_complexity_core(rng):
    """bas: {0,+-1} core, sparser than every other integer core in the
    registry; every row is a sparsification of the matching rdct row
    (entries zeroed, never flipped) with the exact row Gram preserved.
    The int8 MXU path must round-trip within the .5-tie class of the
    f64 golden."""
    tr = get_transform("bas")
    ts = tr.ts.astype(np.int64)
    rd = get_transform("rdct").ts.astype(np.int64)
    assert set(np.unique(ts)) <= {-1, 0, 1}
    assert int((ts != 0).sum()) == 36
    assert ((ts == rd) | (ts == 0)).all()
    np.testing.assert_array_equal(ts @ ts.T, np.diag([8, 4, 4, 2, 8, 4, 4, 2]))
    img = rng.integers(0, 256, (64, 128)).astype(np.float32)
    cfg = CodecConfig(interpret=True, transform="bas")
    c, _ = get_pipeline("fast").roundtrip(jnp.asarray(img), cfg)
    gc, _ = golden_roundtrip(img, t=tr.t)
    assert np.abs(np.asarray(c) - gc).max() <= 1.0


def test_wht_runs_every_integer_path(rng):
    img = rng.integers(0, 256, (64, 128)).astype(np.uint8)
    cfg = CodecConfig(interpret=True, transform="wht")
    # int8 MXU einsum path
    cf, rf = get_pipeline("fast").roundtrip(jnp.asarray(img, jnp.float32), cfg)
    # fused u8 Pallas kernels incl. butterfly decode
    cu, ru = get_pipeline("hp").roundtrip_u8(jnp.asarray(img), cfg)
    for r in (rf, ru):
        mse = ((np.asarray(r).astype(float) - img) ** 2).mean()
        assert mse < 600  # lossy but sane on noise at standard Q
    d = np.abs(np.asarray(cf) - np.asarray(cu).astype(np.float32))
    assert d.max() <= 1.0 and (d > 0).mean() < 0.01  # .5-tie class only
