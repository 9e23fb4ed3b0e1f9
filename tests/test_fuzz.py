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
