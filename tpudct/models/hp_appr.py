"""`hp`: flagship pipeline backed by the fused Pallas kernels.

TPU re-design of main_newAppr.cu's HpApprDCT (kernels at
main_newAppr.cu:177-250, wrappers :252-332).  See
tpudct.kernels.hp_pallas for the kernel formulation.  On non-TPU backends
(e.g. the forced-8-device CPU test mesh) the kernels run in Pallas
interpreter mode; images whose width doesn't tile by 128 lanes fall back to
the mathematically identical `batched` einsum path.
"""

from __future__ import annotations

import jax

from tpudct.config import CodecConfig
from tpudct.kernels import hp_pallas
from tpudct.models.base import Pipeline, register
from tpudct.models.batched import BatchedPipeline

_batched = BatchedPipeline()


def _interpret(cfg: CodecConfig) -> bool:
    return cfg.interpret or jax.default_backend() != "tpu"


class HpApprPipeline(Pipeline):
    name = "hp"

    def dct(self, image, cfg: CodecConfig):
        h, w = image.shape
        if not hp_pallas.supports(h, w):
            return _batched.dct(image, cfg)
        return hp_pallas.hp_dct(
            image,
            q_scale=cfg.q_scale,
            band_rows=cfg.band_rows,
            tile_cols=cfg.tile_cols,
            interpret=_interpret(cfg),
        )

    def idct(self, coeffs, cfg: CodecConfig):
        h, w = coeffs.shape
        if not hp_pallas.supports(h, w):
            return _batched.idct(coeffs, cfg)
        return hp_pallas.hp_idct(
            coeffs,
            q_scale=cfg.q_scale,
            band_rows=cfg.band_rows,
            tile_cols=cfg.tile_cols,
            interpret=_interpret(cfg),
        )

    def roundtrip(self, image, cfg: CodecConfig):
        """Single fully fused kernel when supported (see hp_pallas.hp_roundtrip)."""
        from tpudct.ops.transform import to_uint8

        h, w = image.shape
        if not hp_pallas.supports(h, w):
            return super().roundtrip(image, cfg)
        c, r = hp_pallas.hp_roundtrip(
            image,
            q_scale=cfg.q_scale,
            retain_k=cfg.retain_k,
            band_rows=cfg.band_rows,
            tile_cols=cfg.tile_cols,
            interpret=_interpret(cfg),
        )
        return c, to_uint8(r)


register(HpApprPipeline())
