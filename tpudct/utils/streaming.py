"""Host-staged streaming codec for images larger than device memory.

The reference is bounded by one GPU's memory (16 GB T4; it simply
allocates whole-image buffers, main_newAppr.cu:94-95).  The TPU kernels
here are row-band independent (8x8 blocks; zero halo — the same property
the multi-chip sharding exploits), so an image of ANY height streams
through the chip band by band: host slice -> device -> fused u8 kernel ->
host assembly.  Peak device memory is one band's working set regardless
of image size; outputs may be preallocated (e.g. numpy memmaps) so the
HOST footprint can stay bounded too.

Measured context: the fused u8 roundtrip runs ~85 Gpix/s on-device
(RESULTS_v5e.md scale ladder up to 65536²); streaming throughput is
bounded by host<->device transfer instead — the price of exceeding HBM.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from tpudct.config import CodecConfig


def roundtrip_u8_streamed(
    pipeline,
    image_u8: np.ndarray,
    cfg: Optional[CodecConfig] = None,
    band_rows: int = 8192,
    out_coeffs: Optional[np.ndarray] = None,
    out_recon: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """(H, W) uint8 image -> (int8 coefficients, uint8 reconstruction),
    processed in row bands of `band_rows` through the fused u8 kernels.

    Bitwise identical to the whole-image `roundtrip_u8` (bands align to
    32-row multiples, and blockwise math never crosses band edges).
    `out_coeffs`/`out_recon` accept preallocated arrays (memmap-friendly).
    Requires the u8 path's geometry (H % 32 == 0, W % 128 == 0) and an
    int8-safe config — same gate as the in-memory kernel."""
    import jax.numpy as jnp

    from tpudct.kernels import hp_pallas

    cfg = cfg or CodecConfig()
    img = np.asarray(image_u8)
    if img.dtype != np.uint8 or img.ndim != 2:
        raise ValueError(f"expected a (H, W) uint8 image, got {img.dtype} {img.shape}")
    h, w = img.shape
    if not hp_pallas.supports_u8(h, w, cfg.q_scale, cfg.transform, cfg.q_table):
        raise ValueError(
            f"u8 streaming needs H % 32 == 0, W % 128 == 0 and an int8-safe "
            f"config; got {h}x{w}, q_scale={cfg.q_scale}, "
            f"transform={cfg.transform}"
        )
    band_rows = max(32, band_rows - band_rows % 32)
    if not hasattr(pipeline, "roundtrip_u8"):
        raise ValueError(
            f"streaming needs a u8-native pipeline (hp), got {pipeline.name!r}"
        )
    if out_coeffs is None:
        out_coeffs = np.empty((h, w), np.int8)
    if out_recon is None:
        out_recon = np.empty((h, w), np.uint8)
    if out_coeffs.shape != (h, w) or out_recon.shape != (h, w):
        raise ValueError("preallocated outputs must match the image shape")
    if out_coeffs.dtype != np.int8 or out_recon.dtype != np.uint8:
        # a u8 coefficient buffer would silently WRAP negative int8
        # coefficients on assignment (-5 -> 251) — refuse, don't corrupt
        raise ValueError(
            f"preallocated outputs must be int8 coefficients / uint8 recon, "
            f"got {out_coeffs.dtype} / {out_recon.dtype}"
        )

    for a in range(0, h, band_rows):
        b = min(a + band_rows, h)
        # tail bands below 32 rows merge into the previous slice by
        # construction (h and band_rows are 32-multiples)
        c, r = pipeline.roundtrip_u8(jnp.asarray(img[a:b]), cfg)
        out_coeffs[a:b] = np.asarray(c)
        out_recon[a:b] = np.asarray(r)
    return out_coeffs, out_recon


def roundtrip_color_u8_streamed(
    pipeline,
    rgb_planar_u8: np.ndarray,
    cfg: Optional[CodecConfig] = None,
    band_rows: int = 4096,
) -> Tuple[dict, dict, np.ndarray]:
    """(3, H, W) planar uint8 RGB -> (coefficient planes, meta, (H, W, 3)
    uint8 reconstruction), streamed in row bands through the fused u8
    color path (models/color.py).

    Bands align to 64 rows so YCbCr conversion (pixel-local), 4:2:0
    pooling (2x2-local) and blockwise coding never cross band edges —
    results are identical to the whole-image pass.  Device memory is
    bounded by one band's planes."""
    import jax.numpy as jnp

    from tpudct.models.color import roundtrip_color_u8, supports_color_u8

    cfg = cfg or CodecConfig()
    rgb = np.asarray(rgb_planar_u8)
    if rgb.dtype != np.uint8 or rgb.ndim != 3 or rgb.shape[0] != 3:
        raise ValueError(
            f"expected a (3, H, W) uint8 planar image, got {rgb.dtype} {rgb.shape}"
        )
    _c, h, w = rgb.shape
    band_rows = max(64, band_rows - band_rows % 64)
    if h == 0 or h % 64 or not supports_color_u8(pipeline, cfg, h, w):
        raise ValueError(
            f"u8 color streaming needs H % 64 == 0, W % 256 == 0 and an "
            f"int8-safe config; got {h}x{w}"
        )
    ys, cbs, crs, recs = [], [], [], []
    for a in range(0, h, band_rows):
        b = min(a + band_rows, h)
        planes, _meta, rec = roundtrip_color_u8(
            pipeline, jnp.asarray(rgb[:, a:b]), cfg
        )
        ys.append(np.asarray(planes["y"]))
        cbs.append(np.asarray(planes["cb"]))
        crs.append(np.asarray(planes["cr"]))
        recs.append(np.asarray(rec))
    out_planes = {
        "y": np.concatenate(ys, axis=0),
        "cb": np.concatenate(cbs, axis=0),
        "cr": np.concatenate(crs, axis=0),
    }
    meta = {"orig_shape": (h, w), "chroma_shape": (h // 2, w // 2), "subsample": "420"}
    return out_planes, meta, np.concatenate(recs, axis=0)


def roundtrip_u8_streamed_sharded(
    pipeline,
    image_u8: np.ndarray,
    mesh,
    cfg: Optional[CodecConfig] = None,
    band_rows: int = 8192,
    out_coeffs: Optional[np.ndarray] = None,
    out_recon: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Streaming COMPOSED with multi-chip sharding (VERDICT r2 #8): each
    host row-band is itself band-sharded over `mesh`, so the per-DEVICE
    working set is band_rows/n — together the two axes decode images
    bounded by neither one chip's HBM nor the host band size.

    Every host band reuses ONE compiled sharded step (band heights are
    uniform by construction below).  Bitwise identical to the in-memory
    `pipeline.roundtrip_u8` of the whole image: bands align to 32-row
    multiples and the blockwise math never crosses band edges — the same
    zero-halo property both streaming and the mesh sharding exploit.
    """
    import jax.numpy as jnp

    from tpudct.kernels import hp_pallas
    from tpudct.parallel.mesh import BAND_AXIS
    from tpudct.parallel.sharding import gather, shard_image

    cfg = cfg or CodecConfig()
    img = np.asarray(image_u8)
    if img.dtype != np.uint8 or img.ndim != 2:
        raise ValueError(f"expected a (H, W) uint8 image, got {img.dtype} {img.shape}")
    h, w = img.shape
    n = mesh.shape[BAND_AXIS]
    unit = 32 * n  # each device band must stay a 32-row multiple
    if h % unit or not hp_pallas.supports_u8(h, w, cfg.q_scale, cfg.transform, cfg.q_table):
        raise ValueError(
            f"sharded u8 streaming needs H % {unit} == 0 (32-row multiple "
            f"per device band), W % 128 == 0 and an int8-safe config; got "
            f"{h}x{w} on a {n}-device mesh"
        )
    band_rows = max(unit, band_rows - band_rows % unit)
    if not hasattr(pipeline, "roundtrip_u8"):
        raise ValueError(
            f"streaming needs a u8-native pipeline (hp), got {pipeline.name!r}"
        )
    if out_coeffs is None:
        out_coeffs = np.empty((h, w), np.int8)
    if out_recon is None:
        out_recon = np.empty((h, w), np.uint8)
    if out_coeffs.dtype != np.int8 or out_recon.dtype != np.uint8:
        raise ValueError(
            f"preallocated outputs must be int8 coefficients / uint8 recon, "
            f"got {out_coeffs.dtype} / {out_recon.dtype}"
        )
    if out_coeffs.shape != (h, w) or out_recon.shape != (h, w):
        raise ValueError("preallocated outputs must match the image shape")

    import jax

    from tpudct.parallel.mesh import band_spec

    def band_fn(x):
        return pipeline.roundtrip_u8(x, cfg)

    step = jax.jit(jax.shard_map(
        band_fn, mesh=mesh, in_specs=band_spec(),
        out_specs=(band_spec(), band_spec()), check_vma=False,
    ))
    # plain band_rows slicing (like roundtrip_u8_streamed): h and band_rows
    # are both `unit` multiples, so the tail band is automatically valid
    # and NO band ever exceeds band_rows (the memory bound this function
    # exists to provide); at most two distinct shapes -> two compiles
    for a in range(0, h, band_rows):
        b = min(a + band_rows, h)
        c, r = step(shard_image(jnp.asarray(img[a:b]), mesh))
        out_coeffs[a:b] = gather(c)
        out_recon[a:b] = gather(r)
    return out_coeffs, out_recon
