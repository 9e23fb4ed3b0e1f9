"""Fused color-codec kernel experiment — measured NEGATIVE result.

Hypothesis: the composed u8 color pass (split kernel -> per-plane codec
kernels -> merge kernel) round-trips the intermediate YCbCr planes
through HBM (an extra 2x96 MB each way at 8192²); fusing the color stage
INTO the codec kernels (RGB tiles -> coefficients entirely in VMEM, 576
vs 960 MB total traffic) should win.

Measured on v5e (same-session A/B at 8192², after the clip-first _to_u8
adoption in the production kernels):

    composed                 3.33 ms     <- production path
    fused (128, 1024)        4.16 ms
    fused (256, 1024)        4.08 ms
    fused (128, 2048)        5.70 ms (pre-adoption session: vs 4.88 composed)
    split+merge pair alone   2.10 ms
    luma u8 roundtrip        0.87 ms
    stacked-chroma roundtrip 0.36 ms    (2.10 + 0.87 + 0.36 = 3.33 exactly)

Two findings: (1) kernel launches compose ADDITIVELY through the Pallas
pipeline — the composed total is exactly the sum of its parts, so there
is no launch overhead to fuse away; (2) the pass is VPU-compute-bound,
not HBM-bound (3.33 ms over 960 MB ≈ 290 GB/s < the ~590 GB/s u8 stream
rate), so removing 384 MB of traffic buys nothing while the fusion
FORCES one compromise tile geometry: the codec stage wants (128, 4096)
tiles (wide K=128 lane chunks), the color stage wants small tiles, and
four f32 planes of a (128, 4096) tile (8 MB) cannot coexist in VMEM —
so the fused kernel runs every stage at a worse geometry.  Bitwise
equality with the composed path held everywhere (checked per run here).

The kernels are kept HERE (not in the library) per the repo convention
for measured-worse variants (u8_variants.py, enc_variants.py).

Run from repo root:  python benchmarks/color_fused_ab.py [size]
"""

import functools
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpudct.kernels.color_pallas import (
    _f32,
    _geometry,
    _pool_mats,
    _to_u8,
    _up_mat,
    color_merge_420_u8,
    color_split_420_u8,
)
from tpudct.kernels.hp_pallas import (
    _consts_bf,
    _consts_int,
    _fwd_tile_int,
    _inv_tile_bf,
    hp_decode_u8,
    hp_encode_u8,
)
from tpudct.utils.color import rgb_from_ycbcr_planes, ycbcr_from_rgb_planes
from tpudct.utils.timing import device_time_ms


def _jit(*names):
    return functools.partial(jax.jit, static_argnames=names)

def _shifted_u8(plane_f32):
    # clip+round to the u8 grid (what the split kernel stores) and level
    # shift to int8 (what the encode kernel's xor-flip computes) in one
    # chain — bitwise the composed pair, in the clip-first few-pass form
    # (see _to_u8).
    zp = jnp.minimum(jnp.maximum(plane_f32, 0.0), 255.0)
    f = jnp.floor(zp)
    u = f + (zp - f >= 0.5).astype(jnp.float32)
    return (u.astype(jnp.int32) - 128).astype(jnp.int8)


def _k_color_enc(rgb_ref, pl_ref, pr_ref, ya_ref, yl_ref, ys_ref,
                 cs_ref, y_ref, cb_ref, cr_ref):
    from tpudct.kernels.hp_pallas import _fwd_tile_int

    r = _f32(rgb_ref[0])
    g = _f32(rgb_ref[1])
    b = _f32(rgb_ref[2])
    y, _cb_full, _cr_full = ycbcr_from_rgb_planes(r, g, b)
    y_ref[...] = _fwd_tile_int(
        _shifted_u8(y), ya_ref[...], yl_ref[...], ys_ref[...], out_i8=True
    )

    # 2x2 pooling exactly as _k_split (int8 MXU rows dot, bf16 lane dot)
    pr_bf = pr_ref[...].astype(jnp.bfloat16)

    def pool(ch_f32):
        c8 = (ch_f32 - 128.0).astype(jnp.int32).astype(jnp.int8)
        rows = jax.lax.dot(pl_ref[...], c8, preferred_element_type=jnp.int32)
        quad = jax.lax.dot(
            rows.astype(jnp.float32).astype(jnp.bfloat16), pr_bf,
            preferred_element_type=jnp.float32,
        )
        return quad * 0.25 + 128.0

    _yp, cbp, crp = ycbcr_from_rgb_planes(pool(r), pool(g), pool(b))
    # Stack the two chroma tiles vertically and transform them in ONE
    # K=br contraction: block-diag transforms act per 8-row block, so the
    # stacked result equals the per-plane results exactly, and the full-K
    # MXU mapping beats two half-K passes (same reason the composed path
    # concatenates cb|cr; K=64 contractions map poorly).
    c2 = jnp.concatenate([_shifted_u8(cbp), _shifted_u8(crp)], axis=0)
    cc = _fwd_tile_int(c2, ya_ref[...], yl_ref[...], cs_ref[...], out_i8=True)
    half = cc.shape[0] // 2
    cb_ref[...] = cc[:half]
    cr_ref[...] = cc[half:]


def _k_color_dec(yc_ref, cb_ref, cr_ref, yq_ref, ts_ref, yw_ref,
                 cq_ref, ur_ref, o_ref):
    from tpudct.kernels.hp_pallas import _inv_tile_bf

    # _recon_f32 == _f32(hp._to_u8(x)) by value, without the f32->i32->
    # u8->i32->f32 hop chain: clip-then-trunc commutes with the codec's
    # trunc-then-clip (both saturate outside [0, 255]; inside, trunc is
    # the same floor) and the result stays in f32 for the color math.
    def _recon_f32(x):
        return jnp.trunc(jnp.clip(x, 0.0, 255.0))

    y = _recon_f32(_inv_tile_bf(
        yc_ref[...].astype(jnp.float32), yq_ref[...], ts_ref[...], yw_ref[...]
    ))
    # decode both chroma tiles stacked (one full-K inverse, exact per
    # 8-row block), then upsample each half
    c2 = jnp.concatenate(
        [cb_ref[...], cr_ref[...]], axis=0
    ).astype(jnp.float32)
    p2 = _recon_f32(_inv_tile_bf(c2, cq_ref[...], ts_ref[...], yw_ref[...]))
    half = p2.shape[0] // 2
    ur_bf = ur_ref[...].astype(jnp.bfloat16)

    def up(c_f32):
        wide = jax.lax.dot(c_f32.astype(jnp.bfloat16), ur_bf,
                           preferred_element_type=jnp.float32)
        h2, w = wide.shape
        return jnp.broadcast_to(wide[:, None, :], (h2, 2, w)).reshape(2 * h2, w)

    r, g, b = rgb_from_ycbcr_planes(y, up(p2[:half]), up(p2[half:]))
    o_ref[0] = _to_u8(r)
    o_ref[1] = _to_u8(g)
    o_ref[2] = _to_u8(b)


_FUSED_GEOM = (128, 1024)


def _fused_geometry(h: int, w: int, band_rows, tile_cols):
    br, tc = _geometry(
        h, w,
        band_rows if band_rows is not None else _FUSED_GEOM[0],
        tile_cols if tile_cols is not None else _FUSED_GEOM[1],
    )
    return br, tc


@_jit("q_scale", "retain_k", "transform", "y_q_table", "c_q_table",
      "band_rows", "tile_cols", "interpret")
def color_encode_420_u8(
    rgb_planar_u8,
    q_scale: float = 1.0,
    retain_k=None,
    transform: str = "haweel",
    y_q_table: str = "luma",
    c_q_table: str = "chroma",
    band_rows=None,
    tile_cols=None,
    interpret: bool = False,
):
    """(3, H, W) u8 RGB -> (y (H,W), cb, cr (H/2,W/2)) int8 coefficient
    planes, ONE kernel: YCbCr conversion, 4:2:0 pooling, level shift,
    transform and quantization never leave VMEM."""
    from tpudct.kernels.hp_pallas import _consts_int

    _c, h, w = rgb_planar_u8.shape
    br, tc = _fused_geometry(h, w, band_rows, tile_cols)
    plm, prm = _pool_mats(br, tc)
    ya, yl, ys = _consts_int(br, q_scale, retain_k, transform, y_q_table)
    # the stacked (cb|cr) tile is br rows, so the chroma transform shares
    # ya/yl with luma — only the quantizer scale differs
    _ca, _cl, cs = _consts_int(br, q_scale, retain_k, transform, c_q_table)
    consts = (plm, prm, ya, yl, ys, cs)
    grid = (h // br, w // tc)
    full = pl.BlockSpec((br, tc), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    half = pl.BlockSpec((br // 2, tc // 2), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)
    const = lambda a: pl.BlockSpec(a.shape, lambda i, j: (0, 0),
                                   memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        _k_color_enc,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, br, tc), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
            *(const(a) for a in consts),
        ],
        out_specs=(full, half, half),
        out_shape=(
            jax.ShapeDtypeStruct((h, w), jnp.int8),
            jax.ShapeDtypeStruct((h // 2, w // 2), jnp.int8),
            jax.ShapeDtypeStruct((h // 2, w // 2), jnp.int8),
        ),
        interpret=interpret,
    )
    return fn(rgb_planar_u8, *consts)


@_jit("q_scale", "transform", "y_q_table", "c_q_table",
      "band_rows", "tile_cols", "interpret")
def color_decode_420_u8(
    y_i8,
    cb_i8,
    cr_i8,
    q_scale: float = 1.0,
    transform: str = "haweel",
    y_q_table: str = "luma",
    c_q_table: str = "chroma",
    band_rows=None,
    tile_cols=None,
    interpret: bool = False,
):
    """(y, cb, cr) int8 coefficient planes -> (3, H, W) u8 RGB, ONE kernel:
    butterfly decode of all three planes, 2x2 upsample and the YCbCr
    merge never leave VMEM."""
    from tpudct.kernels.hp_pallas import _consts_bf

    h, w = y_i8.shape
    if cb_i8.shape != (h // 2, w // 2) or cr_i8.shape != (h // 2, w // 2):
        raise ValueError(
            f"chroma planes must be ({h // 2}, {w // 2}) for a ({h}, {w}) "
            f"luma plane, got {cb_i8.shape} / {cr_i8.shape}"
        )
    br, tc = _fused_geometry(h, w, band_rows, tile_cols)
    yq, ts, yw = _consts_bf(br, q_scale, transform, y_q_table)
    # stacked (cb|cr) decode is br rows too: wts/ts shared with luma
    cq, _ts2, _cw = _consts_bf(br, q_scale, transform, c_q_table)
    urm = _up_mat(tc)
    consts = (yq, ts, yw, cq, urm)
    grid = (h // br, w // tc)
    full = pl.BlockSpec((br, tc), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    half = pl.BlockSpec((br // 2, tc // 2), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)
    const = lambda a: pl.BlockSpec(a.shape, lambda i, j: (0, 0),
                                   memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        _k_color_dec,
        grid=grid,
        in_specs=[full, half, half, *(const(a) for a in consts)],
        out_specs=pl.BlockSpec((3, br, tc), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, h, w), jnp.uint8),
        interpret=interpret,
    )
    return fn(y_i8, cb_i8, cr_i8, *consts)


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    cache = pathlib.Path.home() / ".cache" / "jax-tpudct"
    cache.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    rng = np.random.default_rng(5)
    rgb = jnp.asarray(rng.integers(0, 256, (3, size, size), dtype=np.uint8))

    def fused_rt(br, tc):
        def f(x):
            y, cb, cr = color_encode_420_u8(x, band_rows=br, tile_cols=tc)
            return color_decode_420_u8(y, cb, cr, band_rows=br, tile_cols=tc)
        return f

    def composed_rt(x):
        y8, cb8, cr8 = color_split_420_u8(x)
        cy = hp_encode_u8(y8, q_table="luma")
        cc = hp_encode_u8(jnp.concatenate([cb8, cr8], axis=0), q_table="chroma")
        ph = cb8.shape[0]
        yd = hp_decode_u8(cy, q_table="luma")
        cd = hp_decode_u8(cc, q_table="chroma")
        return color_merge_420_u8(yd, cd[:ph], cd[ph:])

    small = rgb[:, :512, :512]
    ref = np.asarray(composed_rt(small))
    for br, tc in ((128, 1024), (256, 1024)):
        assert np.array_equal(np.asarray(fused_rt(br, tc)(small)), ref), (br, tc)
    print("bitwise fused == composed: ok")
    print("composed:", round(device_time_ms(composed_rt, rgb, k_pair=(8, 72), reps=3), 3))
    for br, tc in ((128, 1024), (256, 1024)):
        ms = device_time_ms(fused_rt(br, tc), rgb, k_pair=(8, 72), reps=3)
        print(f"fused ({br},{tc}):", round(ms, 3))


if __name__ == "__main__":
    main()
