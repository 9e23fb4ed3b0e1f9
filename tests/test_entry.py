"""Driver-contract tests for __graft_entry__.py and bench harness."""

import sys
import pathlib

import jax
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import __graft_entry__ as ge


def test_entry_compiles_and_runs():
    fn, args = ge.entry()
    coeffs, recon = jax.jit(fn)(*args)
    assert coeffs.shape == args[0].shape
    assert np.asarray(recon).dtype == np.uint8


def test_dryrun_multichip_8():
    ge.dryrun_multichip(8)


def test_dryrun_multichip_2():
    ge.dryrun_multichip(2)


def test_benchmark_harness_small():
    from tpudct.benchmark import bench_pipeline, synthetic_image

    a = synthetic_image(64)
    b = synthetic_image(64)
    np.testing.assert_array_equal(a, b)  # deterministic (srand(42) analog)
    row = bench_pipeline("batched", 64, reps=1, k_pair=(2, 6))
    # CPU timing at this size is noise-dominated; only sanity-check fields.
    assert row["pair_ms"] >= 0.0 and row["dct_ms"] >= 0.0
    assert row["size"] == 64 and row["pipeline"] == "batched"


def test_bench_correctness_gate_passes_and_catches_wrong_kernels():
    """bench.py's pre-timing gate: passes on the real pipelines, fails
    loudly on a wrong-but-plausible kernel (the automated stage-corner
    check, main_cublass.cu:121-128)."""
    import pytest

    from bench import correctness_gate
    from tpudct import CodecConfig, get_pipeline

    p = get_pipeline("hp")
    rep = correctness_gate(p, CodecConfig(), size=128)
    assert rep["gate"] == "pass" and rep["coeff_ties"] <= 128 * 128 * 0.005 + 4

    class WrongPipeline:
        """Coefficients off by one quant step everywhere — the kind of
        subtle miscompile the tolerance class must NOT absorb."""

        def roundtrip(self, image, cfg):
            c, r = p.roundtrip(image, cfg)
            return c + 1.0, r

        def roundtrip_u8(self, image_u8, cfg):
            c, r = p.roundtrip_u8(image_u8, cfg)
            return c + 1, r

    with pytest.raises(AssertionError):
        correctness_gate(WrongPipeline(), CodecConfig(), size=128)


def test_accuracy_table_shape(image256):
    from tpudct.benchmark import accuracy_table

    rows = accuracy_table(image256, "batched", ks=(6, None))
    assert len(rows) == 2 and rows[0]["k"] == 6 and rows[1]["k"] == "std"


def test_bench_color_serving_smoke():
    from tpudct.benchmark import bench_color_serving

    row = bench_color_serving(256, 2, reps=3, k_pair=(1, 2))
    assert row["batch"] == 2 and row["pipeline"] == "hp-color-serving"
    # CPU slope timing at k_pair=(1,2) can go negative under warm-cache
    # noise (test-order dependent); the bench reports None then — only
    # check positivity when a slope materialized.
    if row["images_per_s"] is not None:
        assert row["images_per_s"] > 0

    import pytest

    with pytest.raises(ValueError):
        bench_color_serving(100, 2)  # misaligned
