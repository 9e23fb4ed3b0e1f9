"""Pallas/Mosaic TPU kernels (the hand-written device-code tier)."""

from tpudct.kernels.hp_pallas import hp_dct, hp_idct, hp_roundtrip, supports

__all__ = ["hp_dct", "hp_idct", "hp_roundtrip", "supports"]
