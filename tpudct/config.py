"""Runtime configuration.

The reference has no runtime config at all — block size is a compile-time
``#define BLOCK_SIZE 8`` re-defined per TU (utils_kernels.cuh:4,
main_cublass.cu:31), T/Q are hardcoded literals and argv carries only two
filenames (main_cublass.cu:41-44) or one size (benchmark_newAppr.cu:35-38).
Here a single frozen dataclass drives every pipeline, the CLI, the
benchmarks and the sharded paths.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class CodecConfig:
    """Configuration for one codec run.

    Attributes:
      transform: which 8x8 transform to run (constants.TRANSFORMS).
        "haweel" (default) = the reference's exact matrix; "rdct" = the
        derived rounded-DCT {0,+-1} approximation (PAPERS.md family);
        "dct" = the exact DCT-II (quality ceiling; f32 paths only — no
        integer core exists, so `fast` rejects it and hp uses its f32
        kernel with "highest" decode). Beyond parity: the reference
        hardcodes one transform in 9 translation units.
      q_scale: multiplier applied to the JPEG luminance table Q (1.0 = the
        reference's "Standard Q" column, README.md:67-69).
      q_table: which base quantization table to scale: "luma" (default;
        the reference's only table) or "chroma" (ITU-T T.81 Table K.2,
        used by the color extension for Cb/Cr planes).
      retain_k: optional zonal coefficient retention. Keeps coefficient
        (u, v) iff u + v < retain_k (anti-diagonal / zonal mask), the codec
        analog of the README's k=6..10 sweep (README.md:62-69; the reference
        computed these externally — no retention code exists in-repo).
        None = keep all 64 (the "Standard Q" configuration).
      interpret: force Pallas kernels into interpreter mode (used on
        non-TPU backends, e.g. the forced-CPU test mesh).
      exact_int_core: run the hp forward transform as the exact int8
        Haweel contraction (Ts X Ts^T on the MXU with int32 accumulation;
        requires integral pixel values, i.e. u8-sourced images — the
        codec's domain). False bit-mimics the reference's f32 GEMM inputs.
        Either way results differ only at true .5 quantizer ties.
      decode_precision: inverse-transform strategy.
        "butterfly" (default) = hybrid exact inverse: sublane-direction
        Haweel butterfly (broadcast-FMA VPU ops; every product is
        x0/+-1/+-2, exact in f32) + lane-direction matmul as an exact
        3-way bf16 split against the bf16-representable Ts. f32-class
        accuracy (~4e-5 vs f64 — tighter than "highest"'s own ~4.1e-5)
        AND the fastest tier measured (8192^2 u8 roundtrip 0.92 ms vs
        0.98 bf16x3 / 1.47 f32-emulation).
        "highest" = 12-pass f32 MXU emulation of the reference's f32
        GEMM inputs, max 5e-4 gray-level error vs f64 — the
        bit-faithfulness tier for cross-checking against the reference.
        "high" = manual bf16x3: ~0.01% of pixels shift by +-1 after
        truncation (MSE delta ~1e-4, inside the <=1e-3 budget).
        Superseded by "butterfly" (faster AND exact); kept for
        comparison.
      band_rows: sublane rows per Pallas grid step (multiple of 8).
        None (default) = each kernel's measured-best geometry: the u8
        kernels run (128, 4096), the f32 kernels (256, 2048) — the two
        paths prefer OPPOSITE geometries by ~3% each in same-session
        A/Bs at 8192² on v5e (benchmarks/RESULTS_v5e.md variant study).
        Set explicitly to override both paths.
      tile_cols: lane columns per Pallas grid step (multiple of 128);
        None (default) = per-kernel measured best, see band_rows.
    """

    # NOTE: the 8x8 block edge is structural (constants.BLOCK_SIZE), not a
    # config knob — every transform, kernel and container assumes it; a
    # former block_size field was dead and misleading, so it was removed.
    transform: str = "haweel"
    q_scale: float = 1.0
    q_table: str = "luma"
    retain_k: Optional[int] = None
    #: AC quantizer rounding offset (round 5): 0.5 = round-half-away (the
    #: reference rule, bit-parity default); theta < 0.5 = deadzone
    #: quantization — AC magnitudes round at |y|/Q + theta, so near-edge
    #: coefficients fall toward zero, trading distortion for cheaper rANS
    #: symbols.  Measured BD-rate vs the 0.5 baseline (photo/circuit 512²,
    #: benchmarks/deadzone_study.py): theta=0.35 -> -5.3% / -0.6%;
    #: theta=0.40 -> -5.0% / -1.4%.  DC always rounds half-away (it is
    #: delta-coded and dense; a DC deadzone buys nothing and shifts block
    #: means).  Encode-side only: dequantization is unchanged, so streams
    #: decode identically everywhere and the header needs no new field.
    #: Non-default values ride the einsum quantizer (hp/batched fall back;
    #: the fused u8 kernels bake the 0.5 rule and demote via dispatch).
    deadzone: float = 0.5
    interpret: bool = False
    exact_int_core: bool = True
    decode_precision: str = "butterfly"
    band_rows: Optional[int] = None
    tile_cols: Optional[int] = None
