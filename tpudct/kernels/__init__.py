"""Pallas/Mosaic TPU kernels (the hand-written device-code tier)."""

from tpudct.kernels.hp_pallas import (
    hp_dct,
    hp_idct,
    hp_roundtrip,
    hp_encode_u8,
    hp_decode_u8,
    hp_roundtrip_u8,
    supports,
    supports_u8,
)

__all__ = [
    "hp_dct",
    "hp_idct",
    "hp_roundtrip",
    "hp_encode_u8",
    "hp_decode_u8",
    "hp_roundtrip_u8",
    "supports",
    "supports_u8",
]
