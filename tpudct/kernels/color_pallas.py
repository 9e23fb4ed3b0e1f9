"""Fused Pallas color kernels: YCbCr split/merge with MXU 2x2 resampling.

The color extension's conversion + 4:2:0 resampling is pure HBM-bound
elementwise work, but XLA's lowerings for the resampling step are
catastrophic at production sizes on TPU (measured at 8192² on v5e):
``jnp.repeat`` interleave lowers to a 342 ms gather; a
``broadcast_to(..., (H/2, 2, W/2, 2))`` form pads the trailing 2-wide dims
to full (8, 128) tiles — a 64x memory expansion that OOMs the chip.  These
kernels do the whole stage in one VMEM pass per tile:

  split:  (3, H, W) u8 RGB -> y (H, W) u8 + cb, cr (H/2, W/2) u8
  merge:  y + cb + cr -> (3, H, W) u8 RGB

Mosaic cannot lower stride-2 vector slices, and regroup reshapes on
computed vector values measured ~3 ms/plane of relayout at 8192² — so the
2x2 resampling maps onto the MXU, where it is both fast and EXACT:

* split pooling: the 2x2 mean commutes with the affine RGB->YCbCr map, so
  the kernel pools the level-shifted u8 INTEGERS on the int8 MXU
  (``P_l @ (c-128) @ P_r`` with 0/1-valued int8 matrices, int32
  accumulation — each output sums exactly 4 integer products: exact), then
  color-transforms the pooled RGB.  Equivalent to utils/color.py's
  transform-then-pool order up to f32 rounding order (the same .5-tie
  equivalence class as the codec itself);
* merge upsample: lanes via one bf16 MXU dot against a 1.0-valued
  replication matrix (u8-valued integers are bf16-exact; one product per
  output — exact), rows via a broadcast-reshape (which, unlike the regroup
  form, lowers cleanly).

No reference analog: the reference is grayscale-only (utils.cu:70-72).
Measured at 8192² on v5e: split+merge pair 17.0 (XLA) -> 1.64 ms at the
default (512, 256) geometry after the round-4 V6 adoption (truncating
add-form merge rounding + fixed-point integer luma + half-res chroma
shift; was 1.94 round 3, 2.34 with the compare-form round — the pair is
VPU-bound, so per-plane pass count shows up ~1:1; full variant grid in
benchmarks/RESULTS_v5e.md).  Fusing these stages INTO the codec kernels measured WORSE
despite 40% less HBM traffic (benchmarks/color_fused_ab.py — launches
are additive and per-stage-optimal geometries win); composition is the
production path.  See benchmarks/RESULTS_v5e.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpudct.utils.color import (
    _KB,
    _KG,
    _KR,
    rgb_from_ycbcr_planes,
    ycbcr_from_rgb_planes,
)



def supports(h: int, w: int) -> bool:
    """Tiles must hold whole 2x2 pools and int8-friendly sublane counts."""
    return h % 64 == 0 and w % 256 == 0


def _geometry(h: int, w: int, band_rows: int, tile_cols: int):
    if h <= 0 or w <= 0 or not supports(h, w):
        raise ValueError(
            f"color kernels need H % 64 == 0 and W % 256 == 0 (H, W > 0), got {h}x{w}"
        )
    if band_rows < 64 or tile_cols < 256:
        raise ValueError(
            f"color kernels need band_rows >= 64 and tile_cols >= 256, "
            f"got ({band_rows}, {tile_cols})"
        )
    br = min(band_rows, h)
    br -= br % 64
    tc = min(tile_cols, w)
    tc -= tc % 256
    while h % br:
        br -= 64
    while w % tc:
        tc -= 256
    return br, tc


@functools.lru_cache(maxsize=16)
def _pool_mats(br: int, tc: int):
    """0/1-valued int8 pooling matrices: PL (br/2, br), PL[i, 2i] =
    PL[i, 2i+1] = 1; PR (tc, tc/2) the transpose pattern."""
    plm = np.zeros((br // 2, br), np.int8)  # int8: left dot runs on the int MXU
    plm[np.arange(br // 2), 2 * np.arange(br // 2)] = 1
    plm[np.arange(br // 2), 2 * np.arange(br // 2) + 1] = 1
    prm = np.zeros((tc, tc // 2), np.float32)  # f32: consumed as bf16 directly
    prm[2 * np.arange(tc // 2), np.arange(tc // 2)] = 1.0
    prm[2 * np.arange(tc // 2) + 1, np.arange(tc // 2)] = 1.0
    return plm, prm


@functools.lru_cache(maxsize=16)
def _up_mat(tc: int):
    """1.0-valued replication matrix UR (tc/2, tc): UR[j, 2j] = UR[j, 2j+1] = 1."""
    ur = np.zeros((tc // 2, tc), np.float32)
    ur[np.arange(tc // 2), 2 * np.arange(tc // 2)] = 1.0
    ur[np.arange(tc // 2), 2 * np.arange(tc // 2) + 1] = 1.0
    return ur


def _to_u8(z):
    """clip(round_half_away(z), 0, 255) -> u8, clip-FIRST: once z is
    clamped non-negative the sign/abs legs of the compare-form round
    drop out (z <= 0 rounds-and-clips to 0 either way, z >= 0 is its own
    abs), and the trunc rides the mandatory f32->i32 convert — 5 VPU
    passes instead of ~12.  Bit-identical to the composed form (verified
    on hardware); via int32 because Mosaic has no f32 <-> u8 lowering.
    Used where the value set is NOT finite-enumerable (split chroma);
    the merge kernels use the cheaper provable `_to_u8_trunc`."""
    zp = jnp.minimum(jnp.maximum(z, 0.0), 255.0)
    f = jnp.floor(zp)
    u = f + (zp - f >= 0.5).astype(jnp.float32)
    return u.astype(jnp.int32).astype(jnp.uint8)


def _to_u8_trunc(z):
    """clip + round-half-away as ONE truncating add-form cast:
    trunc(clip(z) + 0.5) via the f32->i32 convert — 4 VPU ops vs the
    compare form's ~8 (round-4 color study, benchmarks/color_variants2.py:
    merge pair 1.92 -> 1.78 ms at 8192² from this alone).

    The add form can in principle deviate where the f32 addition of 0.5
    rounds across an integer boundary (fractions within half an ulp
    below .5).  Evidence it does not for the BT.601 inverse's value set:
    all three output channels swept over the ENTIRE 256³ (y, cb, cr)
    input domain against the compare form — zero mismatches (merge
    outputs depend only on that triple because chroma upsampling is 0/1
    replication) — plus on-chip agreement max-diff 0 on random images.
    The sweep runs the same f32 graph on the host, so a last-ulp
    platform difference could in principle surface a boundary case the
    sweep missed; any such flip is a ±1 on a measure-zero input set,
    inside the codec's documented ±1 tie class.  Merge-side only: split
    chroma keeps `_to_u8` — the 4:2:0/4:2:2 pooled domains are not
    practically enumerable, and the 4:4:4 sweep's worst margin
    (7.6e-6 below a .5 boundary) is exactly at the half-ulp edge, too
    thin to adopt."""
    zp = jnp.minimum(jnp.maximum(z, 0.0), 255.0)
    return (zp + jnp.float32(0.5)).astype(jnp.int32).astype(jnp.uint8)


def _luma_fx(ri, gi, bi):
    """BT.601 luma in 16-bit fixed point straight off the loaded i32
    channels: round(.299r + .587g + .114b) with integer weights summing
    exactly to 65536, so the result is already an integer in [0, 255] —
    direct u8 store, replacing three i32->f32 casts + the FMA chain +
    the whole rounding chain (round-4 study: split side -4.4% of the
    pair).  Differs from the f32 form by ±1 at rounding boundaries
    (~0.05% of pixels on noise content) — inside the same ±1 class as
    the pool-order delta the split contract already documents."""
    y_fx = (19595 * ri + 38470 * gi + 7471 * bi + 32768) >> 16
    return y_fx.astype(jnp.uint8)


def _rgb_from_shifted(y, cbc, crc):
    """utils.color.rgb_from_ycbcr_planes with the -128 chroma level shift
    PRE-APPLIED (the merge kernels shift at chroma resolution before the
    upsample dot — (c-128) in [-128,127] is bf16-exact and 0/1
    replication commutes with the shift, so the values are bit-identical
    while the two full-res subtract passes drop to quarter/half res)."""
    r = y + (2.0 - 2.0 * _KR) * crc
    b = y + (2.0 - 2.0 * _KB) * cbc
    g = (y - _KR * r - _KB * b) / _KG
    return r, g, b


def _f32(u8_val):
    return u8_val.astype(jnp.int32).astype(jnp.float32)


def _k_split(rgb_ref, pl_ref, pr_ref, y_ref, cb_ref, cr_ref):
    ri, gi, bi = (rgb_ref[i].astype(jnp.int32) for i in range(3))
    y_ref[...] = _luma_fx(ri, gi, bi)

    # Exact integer 2x2 pooling on the MXU (level shift keeps the u8 range
    # inside int8), THEN the color transform on the pooled quarter-res
    # planes — the affine map commutes with the mean (module docstring).
    # Rows pool as an int8 dot; the intermediate row sums are integers in
    # [-256, 254] — bf16-exact — so the lane dot against the 0/1 matrix is
    # exact in one bf16 pass (Mosaic cannot chain i32 @ i8 dots directly).
    pr_bf = pr_ref[...].astype(jnp.bfloat16)

    def pool(ch_i32):
        # level shift in the integer domain straight off the loaded i32 —
        # one fewer full-res f32 pass per channel than shifting the f32
        c8 = (ch_i32 - 128).astype(jnp.int8)
        rows = jax.lax.dot(pl_ref[...], c8, preferred_element_type=jnp.int32)
        quad = jax.lax.dot(
            rows.astype(jnp.float32).astype(jnp.bfloat16), pr_bf,
            preferred_element_type=jnp.float32,
        )
        return quad * 0.25 + 128.0

    _yp, cbp, crp = ycbcr_from_rgb_planes(pool(ri), pool(gi), pool(bi))
    cb_ref[...] = _to_u8(cbp)
    cr_ref[...] = _to_u8(crp)


def _k_merge(y_ref, cb_ref, cr_ref, ur_ref, o_ref):
    y = _f32(y_ref[...])
    ur_bf = ur_ref[...].astype(jnp.bfloat16)

    # Nearest-neighbor 2x2 replication: lanes via one bf16 MXU dot
    # (u8-valued integers are bf16-exact; one product per output), rows
    # via the free sublane broadcast-reshape.  The -128 level shift rides
    # the half-res plane BEFORE the dot (`_rgb_from_shifted`) and the
    # outputs round via the provably-identical trunc form — together the
    # round-4 V6 merge (benchmarks/color_variants2.py).
    def up_shifted(c_u8):
        c = (c_u8.astype(jnp.int32) - 128).astype(jnp.bfloat16)  # [-128,127]: exact
        wide = jax.lax.dot(c, ur_bf, preferred_element_type=jnp.float32)
        h2, w = wide.shape
        return jnp.broadcast_to(wide[:, None, :], (h2, 2, w)).reshape(2 * h2, w)

    r, g, b = _rgb_from_shifted(y, up_shifted(cb_ref[...]), up_shifted(cr_ref[...]))
    o_ref[0] = _to_u8_trunc(r)
    o_ref[1] = _to_u8_trunc(g)
    o_ref[2] = _to_u8_trunc(b)


def _jit(*names):
    return functools.partial(jax.jit, static_argnames=names)


@_jit("band_rows", "tile_cols", "interpret")
def color_split_420_u8(
    rgb_planar_u8,
    band_rows: int = 512,
    tile_cols: int = 256,
    interpret: bool = False,
):
    """(3, H, W) u8 RGB -> (y (H, W), cb, cr (H/2, W/2)) u8, one kernel."""
    _c, h, w = rgb_planar_u8.shape
    br, tc = _geometry(h, w, band_rows, tile_cols)
    grid = (h // br, w // tc)
    full = pl.BlockSpec((br, tc), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    half = pl.BlockSpec((br // 2, tc // 2), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)
    plm, prm = _pool_mats(br, tc)
    const = lambda a: pl.BlockSpec(a.shape, lambda i, j: (0, 0),
                                   memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        _k_split,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, br, tc), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
            const(plm), const(prm),
        ],
        out_specs=(full, half, half),
        out_shape=(
            jax.ShapeDtypeStruct((h, w), jnp.uint8),
            jax.ShapeDtypeStruct((h // 2, w // 2), jnp.uint8),
            jax.ShapeDtypeStruct((h // 2, w // 2), jnp.uint8),
        ),
        interpret=interpret,
    )
    return fn(rgb_planar_u8, plm, prm)


@_jit("band_rows", "tile_cols", "interpret")
def color_merge_420_u8(
    y_u8,
    cb_u8,
    cr_u8,
    band_rows: int = 512,
    tile_cols: int = 256,
    interpret: bool = False,
):
    """(y (H, W), cb, cr (H/2, W/2)) u8 -> (3, H, W) u8 RGB, one kernel."""
    h, w = y_u8.shape
    if cb_u8.shape != (h // 2, w // 2) or cr_u8.shape != (h // 2, w // 2):
        # All geometry derives from the luma plane; a mismatched chroma
        # plane would index blocks past its bounds, which Mosaic CLAMPS
        # (silent garbage RGB) rather than rejects.
        raise ValueError(
            f"chroma planes must be ({h // 2}, {w // 2}) for a ({h}, {w}) "
            f"luma plane, got {cb_u8.shape} / {cr_u8.shape}"
        )
    br, tc = _geometry(h, w, band_rows, tile_cols)
    urm = _up_mat(tc)
    grid = (h // br, w // tc)
    full = pl.BlockSpec((br, tc), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    half = pl.BlockSpec((br // 2, tc // 2), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)
    const = lambda a: pl.BlockSpec(a.shape, lambda i, j: (0, 0),
                                   memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        _k_merge,
        grid=grid,
        in_specs=[full, half, half, const(urm)],
        out_specs=pl.BlockSpec((3, br, tc), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, h, w), jnp.uint8),
        interpret=interpret,
    )
    return fn(y_u8, cb_u8, cr_u8, urm)


# ---------------------------------------------------------------------------
# 4:2:2 and 4:4:4 variants (the other two JPEG chroma modes, u8-native)
# ---------------------------------------------------------------------------
#
# 4:2:2 pools/replicates in the LANE direction only (chroma (H, W/2)); the
# row-direction machinery drops out.  4:4:4 has no resampling at all —
# the kernels are just the BT.601 transform fused with the u8 rounding,
# which still pays off vs XLA because the planes never materialize in f32
# (u8 in/out, one VMEM pass).  Same value chains as the 4:2:0 kernels.


def _k_split_422(rgb_ref, pr_ref, y_ref, cb_ref, cr_ref):
    ri, gi, bi = (rgb_ref[i].astype(jnp.int32) for i in range(3))
    y_ref[...] = _luma_fx(ri, gi, bi)

    # 1x2 lane pooling: one int8 MXU dot against the 0/1 matrix (each
    # output sums exactly 2 integer products in int32 — exact), mean of
    # the level-shifted pair.
    def pool(ch_i32):
        c8 = (ch_i32 - 128).astype(jnp.int8)
        pairs = jax.lax.dot(c8, pr_ref[...], preferred_element_type=jnp.int32)
        return pairs.astype(jnp.float32) * 0.5 + 128.0

    _yp, cbp, crp = ycbcr_from_rgb_planes(pool(ri), pool(gi), pool(bi))
    cb_ref[...] = _to_u8(cbp)
    cr_ref[...] = _to_u8(crp)


def _k_merge_422(y_ref, cb_ref, cr_ref, ur_ref, o_ref):
    y = _f32(y_ref[...])
    ur_bf = ur_ref[...].astype(jnp.bfloat16)

    # Same V6 form as `_k_merge`: half-res shift + trunc round (the
    # per-pixel (y, cb, cr) -> RGB function is identical, so the 256³
    # exhaustive proof carries over; replication is lane-only here).
    def up_shifted(c_u8):
        c = (c_u8.astype(jnp.int32) - 128).astype(jnp.bfloat16)
        return jax.lax.dot(c, ur_bf, preferred_element_type=jnp.float32)

    r, g, b = _rgb_from_shifted(y, up_shifted(cb_ref[...]), up_shifted(cr_ref[...]))
    o_ref[0] = _to_u8_trunc(r)
    o_ref[1] = _to_u8_trunc(g)
    o_ref[2] = _to_u8_trunc(b)


def _k_split_444(rgb_ref, y_ref, cb_ref, cr_ref):
    ri, gi, bi = (rgb_ref[i].astype(jnp.int32) for i in range(3))
    y_ref[...] = _luma_fx(ri, gi, bi)
    r, g, b = (v.astype(jnp.float32) for v in (ri, gi, bi))
    _y, cb, cr = ycbcr_from_rgb_planes(r, g, b)
    cb_ref[...] = _to_u8(cb)
    cr_ref[...] = _to_u8(cr)


def _k_merge_444(y_ref, cb_ref, cr_ref, o_ref):
    # Trunc round is safe here by the same 256³ sweep: the per-pixel
    # inverse function is the one proven for the 4:2:0 merge.
    r, g, b = rgb_from_ycbcr_planes(
        _f32(y_ref[...]), _f32(cb_ref[...]), _f32(cr_ref[...])
    )
    o_ref[0] = _to_u8_trunc(r)
    o_ref[1] = _to_u8_trunc(g)
    o_ref[2] = _to_u8_trunc(b)


@functools.lru_cache(maxsize=16)
def _pool_mat_lane_i8(tc: int):
    """int8 view of `_pool_mats`' lane pooling matrix (tc, tc/2), for the
    4:2:2 integer-MXU dot (same 0/1 pattern, different consuming core)."""
    return _pool_mats(2, tc)[1].astype(np.int8)


@_jit("band_rows", "tile_cols", "interpret")
def color_split_422_u8(
    rgb_planar_u8,
    band_rows: int = 512,
    tile_cols: int = 256,
    interpret: bool = False,
):
    """(3, H, W) u8 RGB -> (y (H, W), cb, cr (H, W/2)) u8, one kernel."""
    _c, h, w = rgb_planar_u8.shape
    br, tc = _geometry(h, w, band_rows, tile_cols)
    grid = (h // br, w // tc)
    full = pl.BlockSpec((br, tc), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    half = pl.BlockSpec((br, tc // 2), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)
    prm = _pool_mat_lane_i8(tc)
    const = lambda a: pl.BlockSpec(a.shape, lambda i, j: (0, 0),
                                   memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        _k_split_422,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, br, tc), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
            const(prm),
        ],
        out_specs=(full, half, half),
        out_shape=(
            jax.ShapeDtypeStruct((h, w), jnp.uint8),
            jax.ShapeDtypeStruct((h, w // 2), jnp.uint8),
            jax.ShapeDtypeStruct((h, w // 2), jnp.uint8),
        ),
        interpret=interpret,
    )
    return fn(rgb_planar_u8, prm)


@_jit("band_rows", "tile_cols", "interpret")
def color_merge_422_u8(
    y_u8,
    cb_u8,
    cr_u8,
    band_rows: int = 512,
    tile_cols: int = 256,
    interpret: bool = False,
):
    """(y (H, W), cb, cr (H, W/2)) u8 -> (3, H, W) u8 RGB, one kernel."""
    h, w = y_u8.shape
    if cb_u8.shape != (h, w // 2) or cr_u8.shape != (h, w // 2):
        raise ValueError(
            f"chroma planes must be ({h}, {w // 2}) for a ({h}, {w}) "
            f"luma plane, got {cb_u8.shape} / {cr_u8.shape}"
        )
    br, tc = _geometry(h, w, band_rows, tile_cols)
    urm = _up_mat(tc)
    grid = (h // br, w // tc)
    full = pl.BlockSpec((br, tc), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    half = pl.BlockSpec((br, tc // 2), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)
    const = lambda a: pl.BlockSpec(a.shape, lambda i, j: (0, 0),
                                   memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        _k_merge_422,
        grid=grid,
        in_specs=[full, half, half, const(urm)],
        out_specs=pl.BlockSpec((3, br, tc), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, h, w), jnp.uint8),
        interpret=interpret,
    )
    return fn(y_u8, cb_u8, cr_u8, urm)


@_jit("band_rows", "tile_cols", "interpret")
def color_split_444_u8(
    rgb_planar_u8,
    band_rows: int = 512,
    tile_cols: int = 256,
    interpret: bool = False,
):
    """(3, H, W) u8 RGB -> three full-res u8 YCbCr planes, one kernel."""
    _c, h, w = rgb_planar_u8.shape
    br, tc = _geometry(h, w, band_rows, tile_cols)
    grid = (h // br, w // tc)
    full = pl.BlockSpec((br, tc), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        _k_split_444,
        grid=grid,
        in_specs=[pl.BlockSpec((3, br, tc), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=(full, full, full),
        out_shape=tuple(jax.ShapeDtypeStruct((h, w), jnp.uint8) for _ in range(3)),
        interpret=interpret,
    )
    return fn(rgb_planar_u8)


@_jit("band_rows", "tile_cols", "interpret")
def color_merge_444_u8(
    y_u8,
    cb_u8,
    cr_u8,
    band_rows: int = 512,
    tile_cols: int = 256,
    interpret: bool = False,
):
    """Three full-res u8 YCbCr planes -> (3, H, W) u8 RGB, one kernel."""
    h, w = y_u8.shape
    if cb_u8.shape != (h, w) or cr_u8.shape != (h, w):
        raise ValueError(
            f"4:4:4 planes must all be ({h}, {w}), got "
            f"{cb_u8.shape} / {cr_u8.shape}"
        )
    br, tc = _geometry(h, w, band_rows, tile_cols)
    grid = (h // br, w // tc)
    full = pl.BlockSpec((br, tc), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        _k_merge_444,
        grid=grid,
        in_specs=[full, full, full],
        out_specs=pl.BlockSpec((3, br, tc), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, h, w), jnp.uint8),
        interpret=interpret,
    )
    return fn(y_u8, cb_u8, cr_u8)
