"""Core functional ops: blocking, transforms, quantization, rounding."""

from tpudct.ops.rounding import round_half_away
from tpudct.ops.blocks import blockify, deblockify, num_blocks
from tpudct.ops.transform import level_shift, level_unshift, dct2_blocks, idct2_blocks, to_uint8
from tpudct.ops.quant import quantize, dequantize, retention_mask, apply_retention

__all__ = [
    "round_half_away",
    "blockify",
    "deblockify",
    "num_blocks",
    "level_shift",
    "level_unshift",
    "dct2_blocks",
    "idct2_blocks",
    "to_uint8",
    "quantize",
    "dequantize",
    "retention_mask",
    "apply_retention",
]
