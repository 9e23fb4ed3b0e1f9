"""`hp`: flagship pipeline backed by the fused Pallas kernels.

TPU re-design of main_newAppr.cu's HpApprDCT (kernels at
main_newAppr.cu:177-250, wrappers :252-332).  See tpudct.kernels.hp_pallas
for the kernel formulation and the measured perf rationale (int8 exact
core, buffer aliasing, u8-native variants).  On non-TPU backends (e.g. the
forced-8-device CPU test mesh) the kernels run in Pallas interpreter mode;
images whose width doesn't tile by 128 lanes fall back to the
mathematically identical `batched` einsum path.
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


def _int_core(cfg: CodecConfig) -> bool:
    """exact_int_core, demoted when the transform has no integer core
    (e.g. the exact 'dct' — f32 kernels only)."""
    from tpudct.constants import get_transform

    return cfg.exact_int_core and get_transform(cfg.transform).has_integer_core


def _decode_prec(cfg: CodecConfig) -> str:
    """butterfly needs the integer core's bf16-exact Ts; transforms without
    one decode at 'highest' (the reference-faithful f32 tier)."""
    from tpudct.constants import get_transform

    if (
        cfg.decode_precision == "butterfly"
        and not get_transform(cfg.transform).has_integer_core
    ):
        return "highest"
    return cfg.decode_precision


class HpApprPipeline(Pipeline):
    name = "hp"

    def dct(self, image, cfg: CodecConfig):
        import jax.numpy as jnp

        if not jnp.issubdtype(image.dtype, jnp.floating):
            image = image.astype(jnp.float32)
        h, w = image.shape
        if not hp_pallas.supports(h, w) or cfg.deadzone != 0.5:
            # deadzone quantization (encode-side rate knob) rides the
            # einsum quantizer; the fused kernels bake the 0.5 rule
            return _batched.dct(image, cfg)
        return hp_pallas.hp_dct(
            image,
            q_scale=cfg.q_scale,
            q_table=cfg.q_table,
            band_rows=cfg.band_rows,
            tile_cols=cfg.tile_cols,
            interpret=_interpret(cfg),
            int_core=_int_core(cfg),
            transform=cfg.transform,
        )

    def idct(self, coeffs, cfg: CodecConfig):
        h, w = coeffs.shape
        if not hp_pallas.supports(h, w):
            return _batched.idct(coeffs, cfg)
        return hp_pallas.hp_idct(
            coeffs,
            q_scale=cfg.q_scale,
            q_table=cfg.q_table,
            band_rows=cfg.band_rows,
            tile_cols=cfg.tile_cols,
            interpret=_interpret(cfg),
            decode_precision=_decode_prec(cfg),
            transform=cfg.transform,
        )

    def roundtrip(self, image, cfg: CodecConfig):
        """Single fully fused kernel when supported (see hp_pallas)."""
        import jax.numpy as jnp

        from tpudct.ops.transform import to_uint8

        if not jnp.issubdtype(image.dtype, jnp.floating):
            image = image.astype(jnp.float32)
        h, w = image.shape
        if not hp_pallas.supports(h, w) or cfg.deadzone != 0.5:
            return super().roundtrip(image, cfg)  # deadzone: einsum path
        c, r = hp_pallas.hp_roundtrip(
            image,
            q_scale=cfg.q_scale,
            q_table=cfg.q_table,
            retain_k=cfg.retain_k,
            band_rows=cfg.band_rows,
            tile_cols=cfg.tile_cols,
            interpret=_interpret(cfg),
            int_core=_int_core(cfg),
            decode_precision=_decode_prec(cfg),
            transform=cfg.transform,
        )
        return c, to_uint8(r)

    # ---- u8-native fast path (no reference analog: the reference stages
    # everything through f32 on the host, utils.cu:10-15) ----------------

    def encode_u8(self, image_u8, cfg: CodecConfig):
        """uint8 image -> int8 coefficient map (4x less HBM traffic)."""
        h, w = image_u8.shape
        if not hp_pallas.supports_u8(h, w, cfg.q_scale, cfg.transform, cfg.q_table):
            bound = hp_pallas._max_coeff(cfg.transform, cfg.q_table)
            why = (
                f"transform {cfg.transform!r} has no integer core"
                if bound == float("inf")
                else f"q_scale>={bound / 127.0:.2f} for int8 coefficients"
            )
            raise ValueError(
                f"u8 path needs h%32==0, w%128==0 and {why} "
                f"(got {h}x{w}, q_scale={cfg.q_scale}, transform={cfg.transform})"
            )
        return hp_pallas.hp_encode_u8(
            image_u8, q_scale=cfg.q_scale, q_table=cfg.q_table, retain_k=cfg.retain_k,
            band_rows=cfg.band_rows, tile_cols=cfg.tile_cols,
            interpret=_interpret(cfg), transform=cfg.transform,
        )

    def decode_u8(self, coeffs_i8, cfg: CodecConfig):
        """int8 coefficient map -> uint8 reconstruction."""
        h, w = coeffs_i8.shape
        if h % 32 or w % 128:
            raise ValueError(
                f"u8 decode path needs h%32==0 and w%128==0, got {h}x{w}; "
                "use idct() + to_uint8 for other shapes"
            )
        return hp_pallas.hp_decode_u8(
            coeffs_i8, q_scale=cfg.q_scale, q_table=cfg.q_table,
            band_rows=cfg.band_rows, tile_cols=cfg.tile_cols,
            interpret=_interpret(cfg),
            decode_precision=_decode_prec(cfg),
            transform=cfg.transform,
        )

    def roundtrip_u8(self, image_u8, cfg: CodecConfig):
        """Fully fused u8-native pass: uint8 -> (int8 coeffs, uint8 recon)."""
        h, w = image_u8.shape
        if hp_pallas._max_coeff(cfg.transform, cfg.q_table) / cfg.q_scale > 127.0:
            # int8 coefficients would wrap around (or the transform has no
            # integer core) — refuse rather than silently corrupt.
            raise ValueError(
                f"transform={cfg.transform} has no integer core; use roundtrip()"
                if hp_pallas._max_coeff(cfg.transform, cfg.q_table)
                == float("inf")
                else f"q_scale={cfg.q_scale} with transform={cfg.transform} "
                "does not fit int8 coefficients; use roundtrip()"
            )
        if not hp_pallas.supports_u8(h, w, cfg.q_scale, cfg.transform, cfg.q_table):
            import jax.numpy as jnp

            c, r = self.roundtrip(jnp.asarray(image_u8, jnp.float32), cfg)
            return c.astype(jnp.int8), r
        return hp_pallas.hp_roundtrip_u8(
            image_u8, q_scale=cfg.q_scale, q_table=cfg.q_table, retain_k=cfg.retain_k,
            band_rows=cfg.band_rows, tile_cols=cfg.tile_cols,
            interpret=_interpret(cfg),
            decode_precision=_decode_prec(cfg),
            transform=cfg.transform,
        )


register(HpApprPipeline())
