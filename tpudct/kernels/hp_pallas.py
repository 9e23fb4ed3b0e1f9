"""HpApprDCT fused Pallas TPU kernels — the flagship compute path.

The reference's proposed kernel (main_newAppr.cu:177-211) maps one 8x8
thread block to one 8x8 image block with T and X staged in shared memory.
A literal translation would be a terrible TPU program: an 8x8 tile occupies
1/16 of one (8,128) native register tile and starves the 128x128 MXU.

TPU-first formulation instead:

  * A (128, 128) image tile holds a 16x16 grid of DCT blocks.  With
    ``BDT = blockdiag_16(T)`` (128x128, from constants.block_diag_T — the
    lane-sized reincarnation of upgrade_T_matrix, utils_kernels.cu:60-69),
    the blockwise 2-D transform of the whole tile is

        Y = BDT @ X @ BDT.T

    i.e. two MXU-shaped (128-contraction) matmuls process 256 DCT blocks.
    The zeros in BDT cost nothing extra: the systolic array is 128x128
    regardless, and the op is HBM-bandwidth-bound.

  * Level shift, transform, quantize (and on the inverse: dequantize,
    inverse transform, unshift) are fused into ONE kernel, so each pixel
    crosses HBM exactly twice per direction — the fusion main_newAppr.cu
    approximates with shared memory, done at VMEM scope instead.

  * ``hp_roundtrip`` fuses the ENTIRE codec (DCT+quant+dequant+IDCT) in a
    single kernel: one read of the image, one write of coefficients, one
    write of the reconstruction.  The reference cannot express this — it
    must round-trip through global memory between its 6 kernel launches
    (main_newAppr.cu:273-279, 314-320).

Constants (BDT, BDT^T, tiled Q) ride VMEM for the whole grid; the grid
sweeps (band_rows, tile_cols) tiles with Pallas' implicit double-buffered
HBM->VMEM pipeline.  Quantization uses true division + half-away-from-zero
rounding to match CUDA round(A/Q) semantics (utils_kernels.cu:42).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpudct.constants import BLOCK_SIZE, LEVEL_SHIFT, Q, block_diag_T

LANE = 128


def supports(h: int, w: int) -> bool:
    """Kernel constraints: lane dim must tile by 128, sublanes by 8."""
    return h % BLOCK_SIZE == 0 and w % LANE == 0 and h >= BLOCK_SIZE and w >= LANE


def _geometry(h: int, w: int, band_rows: int, tile_cols: int):
    br = min(band_rows, h)
    br -= br % BLOCK_SIZE
    tc = min(tile_cols, w)
    tc -= tc % LANE
    assert h % br == 0 or True
    # Shrink until they divide the image (all bench sizes are powers of two).
    while h % br:
        br -= BLOCK_SIZE
    while w % tc:
        tc -= LANE
    return br, tc


def _consts(br: int, dtype):
    bdt = block_diag_T(br // BLOCK_SIZE).astype(dtype)  # (br, br) left operand
    bdl = block_diag_T(LANE // BLOCK_SIZE).astype(dtype)  # (128, 128) right operand
    qt = np.tile(Q, (br // BLOCK_SIZE, LANE // BLOCK_SIZE)).astype(dtype)  # (br, 128)
    return bdt, bdl, qt


def _fwd_tile(x, bdt, bdl, qt, q_scale):
    """levelshift -> BDT @ X @ BDT^T -> round(Y/Q) for one (br, tc) tile."""
    f32 = jnp.float32
    x = x - LEVEL_SHIFT
    y = jax.lax.dot(bdt, x, precision=jax.lax.Precision.HIGHEST, preferred_element_type=f32)
    tc = x.shape[1]
    cols = []
    for t in range(tc // LANE):
        z = jax.lax.dot(
            y[:, t * LANE : (t + 1) * LANE],
            bdl.T,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=f32,
        )
        q = qt * q_scale
        cols.append(jnp.sign(z) * jnp.floor(jnp.abs(z / q) + 0.5))
    return jnp.concatenate(cols, axis=1) if len(cols) > 1 else cols[0]


def _inv_tile(c, bdt, bdl, qt, q_scale):
    """dequant -> BDT^T @ Y @ BDT -> unshift for one (br, tc) tile."""
    f32 = jnp.float32
    tc = c.shape[1]
    cols = []
    for t in range(tc // LANE):
        y = c[:, t * LANE : (t + 1) * LANE] * (qt * q_scale)
        cols.append(
            jax.lax.dot(y, bdl, precision=jax.lax.Precision.HIGHEST, preferred_element_type=f32)
        )
    y = jnp.concatenate(cols, axis=1) if len(cols) > 1 else cols[0]
    x = jax.lax.dot(bdt.T, y, precision=jax.lax.Precision.HIGHEST, preferred_element_type=f32)
    return x + LEVEL_SHIFT


def _dct_kernel(x_ref, bdt_ref, bdl_ref, qt_ref, o_ref, *, q_scale):
    o_ref[:] = _fwd_tile(x_ref[:], bdt_ref[:], bdl_ref[:], qt_ref[:], q_scale)


def _idct_kernel(c_ref, bdt_ref, bdl_ref, qt_ref, o_ref, *, q_scale):
    o_ref[:] = _inv_tile(c_ref[:], bdt_ref[:], bdl_ref[:], qt_ref[:], q_scale)


def _rt_kernel(x_ref, bdt_ref, bdl_ref, qt_ref, mask_ref, c_ref, r_ref, *, q_scale):
    bdt, bdl, qt = bdt_ref[:], bdl_ref[:], qt_ref[:]
    c = _fwd_tile(x_ref[:], bdt, bdl, qt, q_scale) * mask_ref[:]
    c_ref[:] = c
    r_ref[:] = _inv_tile(c, bdt, bdl, qt, q_scale)


def _grid_call(kernel, h, w, br, tc, n_out, interpret, dtype, extra_consts=()):
    grid = (h // br, w // tc)
    img_spec = pl.BlockSpec((br, tc), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    const_specs = [
        pl.BlockSpec((s0, s1), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
        for (s0, s1) in ((br, br), (LANE, LANE), (br, LANE), *extra_consts)
    ]
    out = jax.ShapeDtypeStruct((h, w), dtype)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[img_spec] + const_specs,
        out_specs=img_spec if n_out == 1 else (img_spec,) * n_out,
        out_shape=out if n_out == 1 else (out,) * n_out,
        interpret=interpret,
    )


@functools.partial(jax.jit, static_argnames=("q_scale", "band_rows", "tile_cols", "interpret"))
def hp_dct(image, q_scale: float = 1.0, band_rows: int = 128, tile_cols: int = 512, interpret: bool = False):
    """(H, W) float32 image -> (H, W) quantized coefficients, one fused kernel."""
    h, w = image.shape
    br, tc = _geometry(h, w, band_rows, tile_cols)
    bdt, bdl, qt = _consts(br, np.float32)
    call = _grid_call(
        functools.partial(_dct_kernel, q_scale=q_scale), h, w, br, tc, 1, interpret, image.dtype
    )
    return call(image, bdt, bdl, qt)


@functools.partial(jax.jit, static_argnames=("q_scale", "band_rows", "tile_cols", "interpret"))
def hp_idct(coeffs, q_scale: float = 1.0, band_rows: int = 128, tile_cols: int = 512, interpret: bool = False):
    """(H, W) quantized coefficients -> (H, W) float32 reconstruction."""
    h, w = coeffs.shape
    br, tc = _geometry(h, w, band_rows, tile_cols)
    bdt, bdl, qt = _consts(br, np.float32)
    call = _grid_call(
        functools.partial(_idct_kernel, q_scale=q_scale), h, w, br, tc, 1, interpret, coeffs.dtype
    )
    return call(coeffs, bdt, bdl, qt)


@functools.partial(
    jax.jit, static_argnames=("q_scale", "retain_k", "band_rows", "tile_cols", "interpret")
)
def hp_roundtrip(
    image,
    q_scale: float = 1.0,
    retain_k=None,
    band_rows: int = 128,
    tile_cols: int = 512,
    interpret: bool = False,
):
    """Fully fused codec pass: image -> (coefficients, float reconstruction).

    One kernel, one HBM read of the image, one write per output. Zonal
    retention (the README k-sweep) folds into the same kernel as a
    VMEM-resident mask multiply.
    """
    from tpudct.ops.quant import retention_mask

    h, w = image.shape
    br, tc = _geometry(h, w, band_rows, tile_cols)
    bdt, bdl, qt = _consts(br, np.float32)
    mask = np.tile(
        retention_mask(retain_k), (br // BLOCK_SIZE, tc // BLOCK_SIZE)
    ).astype(np.float32)
    call = _grid_call(
        functools.partial(_rt_kernel, q_scale=q_scale),
        h, w, br, tc, 2, interpret, image.dtype,
        extra_consts=((br, tc),),
    )
    return call(image, bdt, bdl, qt, mask)
