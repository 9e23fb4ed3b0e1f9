"""Command-line interface.

One CLI replaces the reference's four single-purpose binaries
(makefile:4: main_cublass, main_cublass_2, main_fastAppr, main_newAppr;
argv contract at main_cublass.cu:41-44) and its four benchmark drivers
(benchmark_*.cu).

  python -m tpudct run    --pipeline hp input.jpg output.jpg
  python -m tpudct encode --pipeline hp input.jpg coeffs.tdc
  python -m tpudct decode coeffs.tdc output.jpg
  python -m tpudct bench  --size 1024 --pipelines hp,fast
  python -m tpudct sweep
  python -m tpudct table  [input.jpg]      # PEEN/MSE/compression k-sweep
  python -m tpudct curve  [input.jpg]      # rate-distortion vs libjpeg
  python -m tpudct batch  in/ out/         # bulk encode (resumable)
  python -m tpudct unbatch out/ jpgs/      # bulk decode (resumable)
  python -m tpudct scale | profile | info
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def _cfg_from(args) -> "CodecConfig":
    from tpudct.config import CodecConfig

    q_scale = args.q_scale
    if getattr(args, "jpeg_quality", None) is not None:
        from tpudct.ops.quant import q_scale_for_quality

        q_scale = q_scale_for_quality(args.jpeg_quality)
    q_table = "luma"
    if getattr(args, "q_table_file", None):
        if getattr(args, "color", False):
            raise SystemExit(
                "error: --q-table-file applies to the grayscale codec; the "
                "color path quantizes with the standard luma/chroma pair "
                "(models/color.py normalizes per plane)"
            )
        q_table = _register_q_table_file(args.q_table_file)
    return CodecConfig(
        q_scale=q_scale,
        retain_k=args.k,
        transform=getattr(args, "transform", "haweel"),
        q_table=q_table,
        deadzone=getattr(args, "deadzone", 0.5),
    )


def _register_q_table_file(path: str) -> str:
    """Load a custom 8x8 quantization table (64 whitespace/comma-separated
    numbers, '#' comments allowed — the format jpegtran/cjpeg -qtables
    uses) and register it; returns the content-derived table name."""
    from tpudct.constants import register_q_table

    vals = []
    with open(path) as f:
        for line in f:
            line = line.split("#", 1)[0].replace(",", " ")
            for tok in line.split():
                try:
                    vals.append(float(tok))
                except ValueError:
                    raise SystemExit(
                        f"error: q-table file {path!r}: non-numeric token {tok!r}"
                    ) from None
    if len(vals) != 64:
        raise SystemExit(
            f"error: q-table file {path!r} holds {len(vals)} values, need 64"
        )
    try:
        return register_q_table(np.array(vals, np.float32).reshape(8, 8))
    except ValueError as e:
        raise SystemExit(f"error: q-table file {path!r}: {e}") from None



_ENTROPY_STAGES = ("auto", "auto-exact", "spectral", "huffman", "rans",
                   "xz", "raw", "banded")


def _entropy_spec(v: str) -> str:
    """--entropy value: a stage name, or the banded spec grammar
    banded[:N[:inner]] (round 5: the full library grammar is CLI-reachable
    — previously a closed choices list rejected the spec forms)."""
    if v in _ENTROPY_STAGES:
        return v
    if v.startswith("banded:"):
        from tpudct.utils.serialize import _parse_banded_spec

        try:
            n, inner = _parse_banded_spec(v)
        except ValueError as e:
            raise argparse.ArgumentTypeError(str(e)) from None
        if inner not in tuple(c for c in _ENTROPY_STAGES if c != "banded"):
            raise argparse.ArgumentTypeError(
                f"unknown banded inner stage {inner!r}"
            )
        if n and not 1 <= n <= 255:
            raise argparse.ArgumentTypeError("banded segment count must be 1..255")
        return v
    raise argparse.ArgumentTypeError(
        f"unknown entropy stage {v!r}; use one of {_ENTROPY_STAGES} or "
        "banded[:N[:inner]]"
    )


def _add_codec_flags(sp):
    sp.add_argument("--pipeline", default="hp", help="cublas|batched|cublas2|fast|hp")
    sp.add_argument("--q-scale", type=float, default=1.0, dest="q_scale")
    sp.add_argument("--jpeg-quality", type=int, default=None, dest="jpeg_quality",
                    help="IJG quality 1-100 -> table scale (overrides --q-scale; 50 = standard table)")
    sp.add_argument("--k", type=int, default=None, help="zonal retention: keep u+v < k")
    sp.add_argument("--transform", default="haweel",
                    help="8x8 transform: haweel (reference) | rdct (rounded-DCT = Cintra-Bayer 2011; alias cb2011) | wht (Walsh-Hadamard) | bas (sparsified-rdct, cheapest core) | dct (exact DCT-II)")
    sp.add_argument("--deadzone", type=float, default=0.5, dest="deadzone",
                    help="AC quantizer rounding offset: 0.5 (default) = the reference's round-half-away; <0.5 = deadzone quantization (rate-aware: near-edge AC magnitudes fall toward zero; theta=0.35 measured -5.3%% photo BD-rate vs the default, benchmarks/deadzone_study.py).  Encode-side only: streams decode unchanged; rides the einsum quantizer (no fused-u8/streamed encode)")
    sp.add_argument("--q-table-file", default=None, dest="q_table_file",
                    help="custom 8x8 luma quantization table: 64 numbers, whitespace/comma separated, '#' comments (cjpeg -qtables format); stored in .tdc so decode is self-contained")
    sp.add_argument("--entropy", default="auto", dest="entropy",
                    type=_entropy_spec,
                    help=".tdc/.tdcc entropy stage: auto (default; smallest of rans/huffman/xz/spectral per file — above 4M coefficients the winner is picked by sampled rate estimation and only it runs) | auto-exact (trial-encode everything, keep the smallest) | spectral (+zlib) | huffman (JPEG-grade) | rans (positional-context rANS) | xz (spectral+lzma) | raw (+zlib) | banded (independent row-band segments, the multi-host archival layout); rans/huffman encode needs the native lib")


def _add_color_flags(sp):
    sp.add_argument("--color", action="store_true",
                    help="code in color (YCbCr, chroma table QC; the reference is grayscale-only)")
    sp.add_argument("--no-subsample", action="store_true",
                    help="with --color: keep chroma at full resolution (4:4:4 instead of 4:2:0)")
    sp.add_argument("--chroma", choices=("420", "422", "444"), default=None,
                    help="with --color: chroma subsampling mode (default 420; overrides --no-subsample)")


def _stream_inner(entropy: str) -> str:
    """The per-segment inner stage for the STREAMED writers: banded specs
    reduce to their inner (the writers band by themselves — a full
    banded spec would nest; review finding: 'banded::xz' errored on
    every streaming path).  An explicit :N is ignored here — the band
    split comes from --band-rows / the auto threshold."""
    if entropy == "banded" or entropy.startswith("banded:"):
        from tpudct.utils.serialize import _parse_banded_spec

        return _parse_banded_spec(entropy)[1]
    return entropy


def _chroma_mode(args):
    """CLI chroma mode: --chroma wins, then --no-subsample, else 4:2:0."""
    if getattr(args, "chroma", None):
        return False if args.chroma == "444" else args.chroma
    return not getattr(args, "no_subsample", False)


def _load_rgb(path) -> "np.ndarray":
    """Load an image as (H, W, 3) uint8, promoting grayscale to 3 channels."""
    from tpudct.utils import imageio

    rgb = imageio.load_image(path, force_gray=False)
    if rgb.ndim == 2:
        rgb = np.stack([rgb] * 3, axis=-1)
    return rgb


def _print_corner(label: str, a, n: int = 8):
    """Stage-corner printing, the reference's manual verification aid
    (main_cublass.cu:63-70, 121-128, ...)."""
    print(f"{label} (top-left {n}x{n}):")
    corner = np.asarray(a)[:n, :n]
    for row in corner:
        print("  " + " ".join(f"{v:8.2f}" for v in np.asarray(row, np.float64)))


def cmd_run(args) -> int:
    import jax.numpy as jnp

    from tpudct.models import get_pipeline
    from tpudct.utils import imageio, metrics, serialize

    from tpudct.ops.padding import crop, pad_to_blocks

    cfg = _cfg_from(args)
    p = get_pipeline(args.pipeline)
    if args.color:
        from tpudct.models.color import roundtrip_color_auto

        if args.corners:
            raise ValueError(
                "--corners reproduces the reference's grayscale stage dumps "
                "(main_cublass.cu:63-167); it does not apply to --color"
            )
        rgb = _load_rgb(args.input)
        # Dispatches to the fused u8 path (Pallas color kernels + int8
        # codec kernels) when the geometry allows it.
        planes, meta, rec = roundtrip_color_auto(
            p, jnp.asarray(rgb), cfg, subsample=_chroma_mode(args)
        )
        rec_u8 = np.asarray(rec)
        imageio.save_image(args.output, rec_u8, quality=args.quality)
        if args.coeffs:
            n = serialize.save_color(
                args.coeffs, planes, meta,
                cfg.q_scale, cfg.retain_k, cfg.transform,
                codec=args.entropy,
            )
            print(f"coefficients -> {args.coeffs} ({n} bytes)")
        mse = float(((rec_u8.astype(np.float64) - rgb) ** 2).mean())
        print(json.dumps({
            "pipeline": p.name, "shape": list(rgb.shape), "color": True,
            "subsample": meta["subsample"], "mse": mse,
            # same perfect-recon cap as metrics.psnr: inf is not valid JSON
            "psnr_db": 10 * np.log10(255.0 ** 2 / max(mse, 1e-30)),
        }))
        return 0
    img = imageio.load_image(args.input)
    h, w = img.shape
    if args.corners:
        # Reference-literal staged verbosity: corners after load, after
        # DCT+quant, after IDCT (f32), and after u8 conversion
        # (main_cublass.cu:63-70, 121-128, 142-149, 160-167) plus
        # per-phase `DCT (w,h): ms` lines (main_newAppr.cu:283-287).
        # Wall times here include dispatch/transfer (~24 ms relay floor on
        # this setup); `bench` owns the pure device-time protocol.
        import time

        from tpudct.ops.transform import to_uint8

        _print_corner("input", img)
        x, _ = pad_to_blocks(jnp.asarray(img, jnp.float32))
        t0 = time.perf_counter()
        c = np.asarray(p.dct(x, cfg))
        print(f"DCT ({w},{h}): {(time.perf_counter() - t0) * 1e3:.3f} ms")
        _print_corner("DCT+quant", c)
        t0 = time.perf_counter()
        rec_f = np.asarray(p.idct(jnp.asarray(c), cfg))
        print(f"IDCT ({w},{h}): {(time.perf_counter() - t0) * 1e3:.3f} ms")
        _print_corner("IDCT", crop(rec_f, h, w))
        rec_u8 = np.asarray(crop(to_uint8(jnp.asarray(rec_f)), h, w))
        _print_corner("u8", rec_u8)
    else:
        # One fused kernel pass; models/dispatch.py owns the shared gate:
        # edge-pad to the kernel grid so arbitrary (camera) sizes ride the
        # fused u8 kernels (int8 coefficients, 4x less HBM traffic), with
        # the coefficient map cropped back to the 8-aligned container shape.
        from tpudct.models.dispatch import roundtrip_gray_auto

        c, rec_u8 = roundtrip_gray_auto(p, img, cfg)
    imageio.save_image(args.output, rec_u8, quality=args.quality)
    if args.coeffs:
        n = serialize.save_coefficients(
            args.coeffs, np.asarray(c), cfg.q_scale, cfg.retain_k,
            orig_shape=(h, w), transform=cfg.transform, codec=args.entropy,
            q_table=cfg.q_table,
        )
        print(f"coefficients -> {args.coeffs} ({n} bytes)")
    rep = metrics.quality_report(img, rec_u8, np.asarray(c))
    print(json.dumps({"pipeline": p.name, "shape": [h, w], **rep}))
    return 0


def cmd_encode(args) -> int:
    """Every record carries an end-to-end "ms" phase decomposition
    (load / device_fetch / entropy / write): a codec framework's real
    number is pixels-to-bytes, not the device stage alone (the reference
    timed only kernels+quant, main_newAppr.cu:266-287 — its wall time
    was undisclosed).  device_fetch is one synchronous dispatch+transfer
    through the axon relay (~24 ms flat RPC floor on this hardware);
    the pure device compute time is the bench headline, 3+ orders of
    magnitude below the host entropy stage at production sizes."""
    import time as _time

    import jax.numpy as jnp

    from tpudct.models import get_pipeline
    from tpudct.utils import imageio, serialize

    cfg = _cfg_from(args)
    if args.color:
        from tpudct.models.color import encode_color_auto
        from tpudct.utils import streaming

        t0 = _time.perf_counter()
        rgb = _load_rgb(args.input)
        if args.band_rows is not None:
            stream_color = True  # explicit ask: unsupported configs error clearly
        elif rgb.size > streaming.STREAM_PIXELS:
            # auto threshold: only when the u8 streamed encoder supports
            # this config — a non-u8 config (f32 transform, loose
            # q_scale) falls through to the in-memory f32 path instead
            # of turning a previously-working encode into an error
            from tpudct.models.color import (
                color_kernel_shape, supports_color_u8,
            )

            h_, w_ = np.asarray(rgb).shape[:2]
            stream_color = supports_color_u8(
                get_pipeline(args.pipeline), cfg,
                *color_kernel_shape(h_, w_), _chroma_mode(args),
            )
        else:
            stream_color = False
        if stream_color:
            # Streamed color encode (round 4): RGB bands ride the device
            # one at a time, each plane's slab entropy-coding into banded
            # segments — the color twin of the gray streamed path.
            t1 = _time.perf_counter()
            data, (h, w) = streaming.encode_color_streamed_bytes(
                get_pipeline(args.pipeline), np.asarray(rgb, np.uint8), cfg,
                band_rows=args.band_rows or 8192,
                inner=_stream_inner(args.entropy),
                subsample=_chroma_mode(args),
            )
            t2 = _time.perf_counter()
            with open(args.output, "wb") as f:
                f.write(data)
            t3 = _time.perf_counter()
            print(json.dumps({
                "bytes": len(data), "raw_bytes": int(rgb.size),
                "factor_vs_raw": rgb.size / len(data), "color": True,
                "streamed": True,
                "ms": {"load": round((t1 - t0) * 1e3, 1),
                       "stream_device_entropy": round((t2 - t1) * 1e3, 1),
                       "write": round((t3 - t2) * 1e3, 1)},
            }))
            return 0
        t1 = _time.perf_counter()
        planes, meta = encode_color_auto(
            get_pipeline(args.pipeline), jnp.asarray(rgb), cfg,
            subsample=_chroma_mode(args),
        )
        planes = {k: np.asarray(v) for k, v in planes.items()}
        t2 = _time.perf_counter()
        data = serialize.color_to_bytes(
            planes, meta, cfg.q_scale, cfg.retain_k, cfg.transform,
            codec=args.entropy,
        )
        t3 = _time.perf_counter()
        with open(args.output, "wb") as f:
            f.write(data)
        t4 = _time.perf_counter()
        print(json.dumps({
            "bytes": len(data), "raw_bytes": int(rgb.size),
            "factor_vs_raw": rgb.size / len(data), "color": True,
            "ms": {"load": round((t1 - t0) * 1e3, 1),
                   "device_fetch": round((t2 - t1) * 1e3, 1),
                   "entropy": round((t3 - t2) * 1e3, 1),
                   "write": round((t4 - t3) * 1e3, 1)},
        }))
        return 0
    t0 = _time.perf_counter()
    img = imageio.load_image(args.input)
    t1 = _time.perf_counter()
    from tpudct.utils import streaming

    if args.band_rows is not None or img.size > streaming.STREAM_PIXELS:
        # Streamed encode (VERDICT r3 #5): taller-than-HBM images (or an
        # explicit --band-rows) ride the device band by band, each band
        # entropy-coded straight into a banded segment — the coefficient
        # map never materializes whole anywhere.  --entropy picks the
        # per-segment inner stage ("banded" = the default auto inner).
        # Device and entropy phases OVERLAP by design here (a band
        # entropy-codes while the next is on the device), so the record
        # reports the fused stream phase instead of a fake split.
        inner = _stream_inner(args.entropy)
        data, (h, w) = streaming.encode_gray_streamed_bytes(
            get_pipeline(args.pipeline), np.asarray(img, np.uint8), cfg,
            band_rows=args.band_rows or 8192, inner=inner,
        )
        t2 = _time.perf_counter()
        with open(args.output, "wb") as f:
            f.write(data)
        t3 = _time.perf_counter()
        print(json.dumps({
            "bytes": len(data), "raw_bytes": img.size,
            "factor_vs_raw": img.size / len(data), "streamed": True,
            "ms": {"load": round((t1 - t0) * 1e3, 1),
                   "stream_device_entropy": round((t2 - t1) * 1e3, 1),
                   "write": round((t3 - t2) * 1e3, 1)},
        }))
        return 0
    # Shared gate (models/dispatch.py): the u8-native kernels engage here
    # exactly as in `run`/`decode` — previously this path staged f32
    # unconditionally, 2x device time on the same image (VERDICT r2 #2).
    from tpudct.models.dispatch import encode_gray_auto

    c, (h, w) = encode_gray_auto(get_pipeline(args.pipeline), img, cfg)
    c_np = np.asarray(c)
    t2 = _time.perf_counter()
    data = serialize.coefficients_to_bytes(
        c_np, cfg.q_scale, cfg.retain_k, orig_shape=(h, w),
        transform=cfg.transform, codec=args.entropy, q_table=cfg.q_table,
    )
    t3 = _time.perf_counter()
    with open(args.output, "wb") as f:
        f.write(data)
    t4 = _time.perf_counter()
    print(json.dumps({
        "bytes": len(data), "raw_bytes": img.size,
        "factor_vs_raw": img.size / len(data),
        "ms": {"load": round((t1 - t0) * 1e3, 1),
               "device_fetch": round((t2 - t1) * 1e3, 1),
               "entropy": round((t3 - t2) * 1e3, 1),
               "write": round((t4 - t3) * 1e3, 1)},
    }))
    return 0



def _parse_rows(spec: str, shown: str = "--rows"):
    """'A:B' -> (a, b) ints; the ONE copy of the ROI grammar (review
    finding: four drifting copies)."""
    try:
        a, b = (int(v) for v in spec.split(":"))
    except Exception:
        raise ValueError(f"{shown} expects A:B, got {spec!r}") from None
    return a, b


def _luma_blob(data: bytes) -> bytes:
    """The Y plane's v4 stream from a .tdcc container (a valid gray .tdc
    blob — what every --grayscale streamed mode decodes)."""
    from tpudct.utils import serialize

    return bytes(serialize._color_plane_slices(data)[1][0])


def _parse_scale(s: str) -> int:
    """``--scale`` string -> numerator M of an M/8 scale (djpeg grammar).

    Accepts "M/8" for M = 1..16 plus the reduced aliases djpeg prints
    ("1/2" = 4/8, "1/4" = 2/8, "3/4" = 6/8, ...).  Returns M."""
    alias = {"1/1": 8, "1/2": 4, "1/4": 2, "1/8": 1, "3/4": 6,
             "5/4": 10, "3/2": 12, "7/4": 14, "2/1": 16}
    if s in alias:
        return alias[s]
    num, _, den = s.partition("/")
    try:
        if den == "8" and 1 <= int(num) <= 16:
            return int(num)
    except ValueError:
        pass
    raise ValueError(
        f"--scale must be M/8 with M in 1..16 (or a reduced alias like "
        f"1/2, 3/4, 2/1), got {s!r}"
    )


def cmd_decode(args) -> int:
    if args.input.lower().endswith((".jpg", ".jpeg")):
        # djpeg drop-in: a .jpg input imports its quantized coefficients
        # LOSSLESSLY (utils/jpegcoef.py, no pixel hop) and decodes through
        # the same machinery — so --scale/--planes/--preview/--rows all
        # work straight on JPEG files.  "raw" import is header + memcpy;
        # the progressive modes ride partial_coefficients' decode-and-
        # mask contract on it (frombuffer + position mask — cheaper than
        # the spectral reorder + zlib round this path used to pay).
        import os
        import tempfile

        from tpudct.utils import jpegcoef

        if not jpegcoef.coef_io_available():
            raise ValueError(
                "decoding .jpg inputs needs the native library (make -C csrc)"
            )
        data = jpegcoef.import_jpeg(args.input, codec="raw")
        fd, tmppath = tempfile.mkstemp(suffix=".tdc")
        try:
            with os.fdopen(fd, "wb") as f:
                f.write(data)
            return _decode_stream(args, tmppath, shown=args.input)
        finally:
            os.remove(tmppath)
    return _decode_stream(args, args.input)


def _decode_stream(args, path: str, shown: "str | None" = None) -> int:
    """Decode the .tdc/.tdcc stream at `path`.

    `shown` is the name printed in messages (the original .jpg for
    imported inputs); args is never mutated.  A non-stream file fails
    with a format hint instead of a parser traceback."""
    import jax.numpy as jnp

    if shown is None:
        shown = path

    from tpudct.config import CodecConfig
    from tpudct.models import get_pipeline
    from tpudct.utils import imageio, serialize

    from tpudct.ops.transform import to_uint8

    with open(path, "rb") as f:
        head = f.read(4)
    if not (serialize.is_color_stream(head) or serialize.is_tdc_stream(head)):
        raise ValueError(
            f"{shown}: not a .tdc/.tdcc stream (magic {head!r}); "
            "JPEG inputs must be named .jpg/.jpeg"
        )
    # Streaming decision, shared by every decode mode (round 5: the
    # partial modes — --scale/--planes/--rows/--grayscale — stream too,
    # so the banded archival layout is partially decodable with bounded
    # memory; round 4 refused --band-rows on all of them).  Streams when
    # asked explicitly (--band-rows) or when the container exceeds the
    # in-memory threshold.  A .npy output writes the raster band by band
    # through a memmap, bounding HOST output residency as well.
    from tpudct.utils import streaming as _streaming

    with open(path, "rb") as fh:
        data = fh.read()
    if serialize.is_color_stream(head):
        _sub0, _slices0, _end0 = serialize._color_plane_slices(data)
        _hdr0 = serialize._parse_plane_header(_slices0[0])
        _n_px = ((_hdr0[2] or _hdr0[0]) * (_hdr0[3] or _hdr0[1])) * 3
    else:
        _hdr0 = serialize._parse_plane_header(data)
        _n_px = _hdr0[0] * _hdr0[1]
    stream = (
        getattr(args, "band_rows", None) is not None
        or _n_px > _streaming.STREAM_PIXELS
    )
    s_band = getattr(args, "band_rows", None) or 8192
    out_npy = args.output if args.output.lower().endswith(".npy") else None

    def _emit(rec) -> None:
        """Write the decoded raster: memmap outputs are already on disk
        (flush), everything else goes through the extension-dispatched
        saver."""
        if isinstance(rec, np.memmap):
            rec.flush()
        else:
            imageio.save_image(args.output, np.asarray(rec), quality=args.quality)
    if args.scale is not None:
        # Fractional-scale decode (djpeg -scale M/8): the scaled basis
        # B = P @ T^T reconstructs straight to ceil(H*M/8) x ceil(W*M/8)
        # — the exact area-resample of the full decode (ops/scaled.py
        # contract; integer 8/M rides the fused u8 kernels).
        if args.planes is not None or args.rows is not None or args.preview:
            raise ValueError("--scale does not combine with --planes/--rows/--preview")
        m = _parse_scale(args.scale)
        fac = 8 // m if 8 % m == 0 else None
        if stream:
            # Streamed fractional-scale decode: the fused scaled kernel
            # rides band by band into the (ceil(H*M/8), ...) raster —
            # beyond-HBM banded archives thumbnail at any M/8 with
            # bounded memory (VERDICT r4 #1).
            if serialize.is_color_stream(head) and not args.grayscale:
                rec = _streaming.decode_color_streamed(
                    get_pipeline(args.pipeline), data, band_rows=s_band,
                    scale_m=m, out_npy=out_npy,
                )
            else:
                blob = (_luma_blob(data)
                        if serialize.is_color_stream(head) else data)
                rec = _streaming.decode_gray_streamed(
                    get_pipeline(args.pipeline), blob, band_rows=s_band,
                    scale_m=m, out_npy=out_npy,
                )
            _emit(rec)
            print(f"decoded {shown} at {m}/8 scale (streamed) -> {args.output}")
            return 0
        if serialize.is_color_stream(head):
            from tpudct.models.color import _luma_cfg, decode_color_scaled

            planes, meta = serialize.load_color(path)
            cfg = CodecConfig(q_scale=meta["q_scale"], transform=meta["transform"])
            if args.grayscale:
                # djpeg -grayscale -scale: luma-only, chroma never decodes
                from tpudct.models.dispatch import decode_gray_scaled_auto

                rec = decode_gray_scaled_auto(
                    get_pipeline(args.pipeline), planes["y"],
                    _luma_cfg(cfg, meta.get("y_q_table", "luma")),
                    meta["orig_shape"], m,
                )
            else:
                rec = decode_color_scaled(
                    get_pipeline(args.pipeline), planes, meta, cfg, fac,
                    m=None if fac else m,
                )
            imageio.save_image(args.output, np.asarray(rec), quality=args.quality)
        else:
            coeffs, q_scale, _k, (h, w), transform, q_table = serialize.load_coefficients(
                path, with_orig_shape=True, with_transform=True, with_q_table=True,
            )
            cfg = CodecConfig(q_scale=q_scale, transform=transform, q_table=q_table)
            # one shared scaled-dispatch gate (models/dispatch.py): fused
            # kernel / composed u8 / einsum area-resample as eligible
            from tpudct.models.dispatch import decode_gray_scaled_auto

            rec_u8 = decode_gray_scaled_auto(
                get_pipeline(args.pipeline), coeffs, cfg, (h, w), m
            )
            imageio.save_image(args.output, rec_u8, quality=args.quality)
        print(f"decoded {shown} at {m}/8 scale -> {args.output}")
        return 0
    if args.preview:
        # Instant 1/8-scale thumbnail: DC-only progressive decode, host
        # arithmetic only (.tdcc streams preview in full color; with
        # --grayscale only the luma plane's DC terms are read).  Banded
        # (archival/streamed) containers walk one segment at a time, so
        # beyond-HBM archives thumbnail with bounded memory.
        if serialize.is_color_stream(head):
            if args.grayscale:
                _sub, slices, _end = serialize._color_plane_slices(data)
                pv = serialize.preview_from_bytes(slices[0])
            else:
                pv = serialize.preview_color_from_bytes(data)
        else:
            pv = serialize.preview_from_bytes(data)
        imageio.save_image(args.output, pv, quality=args.quality)
        print(f"preview (1/8 scale, DC-only) {shown} -> {args.output}")
        return 0
    if args.planes is not None:
        if stream:
            # Streamed progressive decode: only the first N zig-zag
            # planes decode per banded segment (spectral prefix where the
            # inner stage allows, decode+mask otherwise), device work in
            # bounded bands (VERDICT r4 #1).
            if serialize.is_color_stream(head) and not args.grayscale:
                rec = _streaming.decode_color_streamed(
                    get_pipeline(args.pipeline), data, band_rows=s_band,
                    n_planes=args.planes, out_npy=out_npy,
                )
            else:
                blob = (_luma_blob(data)
                        if serialize.is_color_stream(head) else data)
                rec = _streaming.decode_gray_streamed(
                    get_pipeline(args.pipeline), blob, band_rows=s_band,
                    n_planes=args.planes, out_npy=out_npy,
                )
            _emit(rec)
            print(f"decoded {shown} ({args.planes} spectral planes, "
                  f"streamed) -> {args.output}")
            return 0
        if serialize.is_color_stream(head):
            if args.grayscale:
                # Progressive luma-only decode: read the first N spectral
                # planes of the Y stream alone — chroma never decodes.
                _sub, slices, _end = serialize._color_plane_slices(data)
                p = serialize.partial_coefficients(
                    bytes(slices[0]), n_planes=args.planes
                )
                from tpudct.models.dispatch import decode_gray_auto

                cfg = CodecConfig(q_scale=p["q_scale"],
                                  transform=p["transform"],
                                  q_table=p["q_table"])
                rec_u8 = decode_gray_auto(
                    get_pipeline(args.pipeline), p["coeffs"], cfg,
                    p["orig_shape"],
                )
                imageio.save_image(args.output, rec_u8,
                                   quality=args.quality)
                print(f"decoded {shown} ({args.planes} spectral planes, "
                      f"luma only) -> {args.output}")
                return 0
            # Progressive COLOR decode: the first N spectral planes of
            # each .tdcc plane stream (f32 path; partial maps are f32).
            from tpudct.models.color import decode_color

            planes, meta = serialize.partial_color_coefficients(
                data, n_planes=args.planes
            )
            rec = decode_color(
                get_pipeline(args.pipeline), planes, meta,
                CodecConfig(q_scale=meta["q_scale"],
                            transform=meta["transform"]),
            )
            imageio.save_image(args.output, np.asarray(rec), quality=args.quality)
            print(f"decoded {shown} ({args.planes} spectral planes, "
                  f"color) -> {args.output}")
            return 0
        p = serialize.partial_coefficients(data, n_planes=args.planes)
        pipe = get_pipeline(args.pipeline)
        cfg = CodecConfig(q_scale=p["q_scale"], transform=p["transform"],
                          q_table=p["q_table"])
        # shared gate: a spectrally-truncated map is still integer-valued,
        # so progressive decode rides the fused int8 kernels when eligible
        from tpudct.models.dispatch import decode_gray_auto

        h, w = p["orig_shape"]
        rec_u8 = decode_gray_auto(pipe, p["coeffs"], cfg, (h, w))
        imageio.save_image(args.output, rec_u8, quality=args.quality)
        print(f"decoded {shown} ({args.planes} spectral planes) -> {args.output}")
        return 0
    if serialize.is_color_stream(head):
        import time as _time

        from tpudct.models.color import decode_color, decode_color_auto

        t0 = _time.perf_counter()
        if stream and args.rows is not None:
            # Streamed color ROI: only segments covering the requested
            # rows entropy-decode at all (VERDICT r4 #1).
            a, bnd = _parse_rows(args.rows)
            if args.grayscale:
                blob = _luma_blob(data)
                rec = _streaming.decode_gray_streamed(
                    get_pipeline(args.pipeline), blob, band_rows=s_band,
                    row_range=(a, bnd), out_npy=out_npy,
                )
            else:
                rec = _streaming.decode_color_streamed(
                    get_pipeline(args.pipeline), data, band_rows=s_band,
                    row_range=(a, bnd), out_npy=out_npy,
                )
            _emit(rec)
            print(f"decoded rows {a}:{bnd} of {shown} (streamed) -> {args.output}")
            return 0
        if stream and args.grayscale:
            # Streamed luma-only decode: the Y plane blob IS a gray .tdc
            # stream — chroma segments never entropy-decode.
            blob = _luma_blob(data)
            rec = _streaming.decode_gray_streamed(
                get_pipeline(args.pipeline), blob, band_rows=s_band,
                out_npy=out_npy,
            )
            _emit(rec)
            print(f"decoded {shown} (luma only, streamed) -> {args.output}")
            return 0
        if stream:
            rec = _streaming.decode_color_streamed(
                get_pipeline(args.pipeline), data, band_rows=s_band,
                out_npy=out_npy,
            )
            t1 = _time.perf_counter()
            _emit(rec)
            t2 = _time.perf_counter()
            print(f"decoded {shown} (color, streamed) -> {args.output}")
            print(json.dumps({"ms": {
                "entropy_device": round((t1 - t0) * 1e3, 1),
                "save": round((t2 - t1) * 1e3, 1),
            }}))
            return 0
        planes, meta = serialize.bytes_to_color(data)
        t_entropy = _time.perf_counter() - t0
        cfg = CodecConfig(q_scale=meta["q_scale"], transform=meta["transform"])
        if args.rows is not None:
            # Color region-of-interest decode: luma block rows plus the
            # covering chroma block rows.  4:2:0 needs 16-luma-row
            # alignment so the chroma slice stays 8-row-block aligned;
            # replication upsampling is local, so the slice decode equals
            # the same rows of a full decode.
            h, w = meta["orig_shape"]
            a, bnd = _parse_rows(args.rows)
            a, bnd = max(0, a), min(h, bnd)
            if bnd <= a:
                raise ValueError(f"--rows {args.rows}: empty range for height {h}")
            if args.grayscale:
                # Luma-only region decode: only the covering 8-row luma
                # block rows transform; chroma never decodes, so the
                # 16-row 4:2:0 alignment below is irrelevant here.
                from tpudct.models.color import _luma_cfg
                from tpudct.models.dispatch import decode_gray_auto

                a0 = a - a % 8
                y1 = min(planes["y"].shape[0], -(-bnd // 8) * 8)
                rec = decode_gray_auto(
                    get_pipeline(args.pipeline), planes["y"][a0:y1],
                    _luma_cfg(cfg, meta.get("y_q_table", "luma")),
                    (min(h, y1) - a0, w),
                )[a - a0 : bnd - a0]
                imageio.save_image(args.output, rec, quality=args.quality)
                print(f"decoded rows {a}:{bnd} of {shown} (luma only) "
                      f"-> {args.output}")
                return 0
            mode = meta["subsample"]
            align = 16 if mode == "420" else 8
            a0 = a - a % align
            y1 = min(planes["y"].shape[0], -(-bnd // align) * align)
            if mode == "420":
                # Tail slices of images whose PADDED luma height is only
                # 8-aligned (h % 16 == 8, pad_to_blocks pads to 8s) leave
                # y1 // 2 off the chroma block grid — take the whole
                # remaining chroma plane there so both chroma slices stay
                # 8-row block multiples (a half-block slice would make
                # decode_color's cb/cr concatenation span one mixed block).
                c0 = a0 // 2
                c1 = (planes["cb"].shape[0]
                      if y1 >= planes["y"].shape[0] else y1 // 2)
            else:
                c0, c1 = a0, min(y1, planes["cb"].shape[0])
            sl = {"y": planes["y"][a0:y1],
                  "cb": planes["cb"][c0:c1], "cr": planes["cr"][c0:c1]}
            smeta = {
                **meta,
                "orig_shape": (min(h, y1) - a0, w),
                "chroma_shape": (
                    min(meta["chroma_shape"][0], c1) - c0,
                    meta["chroma_shape"][1],
                ),
            }
            rec = np.asarray(decode_color(
                get_pipeline(args.pipeline), sl, smeta, cfg
            ))[a - a0 : bnd - a0]
            imageio.save_image(args.output, rec, quality=args.quality)
            print(f"decoded rows {a}:{bnd} of {shown} (color) -> {args.output}")
            return 0
        if args.grayscale:
            # djpeg -grayscale: decode ONLY the luma plane through the
            # gray fast path — the chroma planes never touch the device
            from tpudct.models.color import _luma_cfg
            from tpudct.models.dispatch import decode_gray_auto

            rec_u8 = decode_gray_auto(
                get_pipeline(args.pipeline), planes["y"],
                _luma_cfg(cfg, meta.get("y_q_table", "luma")),
                meta["orig_shape"],
            )
            imageio.save_image(args.output, rec_u8, quality=args.quality)
            print(f"decoded {shown} (luma only) -> {args.output}")
            return 0
        t1 = _time.perf_counter()
        rec = np.asarray(
            decode_color_auto(get_pipeline(args.pipeline), planes, meta, cfg)
        )
        t2 = _time.perf_counter()
        imageio.save_image(args.output, rec, quality=args.quality)
        t3 = _time.perf_counter()
        print(f"decoded {shown} (color) -> {args.output}")
        print(json.dumps({"ms": {
            "entropy": round(t_entropy * 1e3, 1),
            "device_fetch": round((t2 - t1) * 1e3, 1),
            "save": round((t3 - t2) * 1e3, 1),
        }}))
        return 0
    if stream and args.rows is not None:
        # Streamed gray ROI: only segments covering the requested rows
        # entropy-decode at all (VERDICT r4 #1).
        a, bnd = _parse_rows(args.rows)
        rec = _streaming.decode_gray_streamed(
            get_pipeline(args.pipeline), data, band_rows=s_band,
            row_range=(a, bnd), out_npy=out_npy,
        )
        _emit(rec)
        print(f"decoded rows {a}:{bnd} of {shown} (streamed) -> {args.output}")
        return 0
    if stream:
        # Streamed decode (VERDICT r3 #5): segments entropy-decode and
        # ride the device in bounded bands — neither the coefficient
        # map nor the device working set holds the whole image.
        rec = _streaming.decode_gray_streamed(
            get_pipeline(args.pipeline), data, band_rows=s_band,
            out_npy=out_npy,
        )
        _emit(rec)
        print(f"decoded {shown} (streamed) -> {args.output}")
        return 0
    import time as _time

    t0 = _time.perf_counter()
    coeffs, q_scale, _k, (h, w), transform, q_table = (
        serialize.bytes_to_coefficients(
            data, with_orig_shape=True, with_transform=True, with_q_table=True,
        )
    )
    t_entropy = _time.perf_counter() - t0
    p = get_pipeline(args.pipeline)
    # The header records which quantization table the plane was coded
    # against (luma for every CLI-written gray .tdc; chroma possible via
    # the library API) — dequantize against the SAME one.
    cfg = CodecConfig(q_scale=q_scale, transform=transform, q_table=q_table)
    if args.rows is not None:
        # Region-of-interest decode: 8x8 blocks are independent, so only
        # the covering block rows ride the inverse transform.
        a, bnd = _parse_rows(args.rows)
        a, bnd = max(0, a), min(h, bnd)
        if bnd <= a:
            raise ValueError(f"--rows {args.rows}: empty range for height {h}")
        a8 = a - a % 8
        b8 = min(coeffs.shape[0], -(-bnd // 8) * 8)
        # shared gate on the slice: the covering block rows ride the fused
        # int8 decode when eligible (blocks are independent, so the slice
        # decode equals the same rows of a full decode)
        from tpudct.models.dispatch import decode_gray_auto

        rec_u8 = decode_gray_auto(
            p, coeffs[a8:b8], cfg, (b8 - a8, w)
        )[a - a8 : bnd - a8]
        imageio.save_image(args.output, rec_u8, quality=args.quality)
        print(f"decoded rows {a}:{bnd} of {shown} -> {args.output}")
        return 0
    # Shared gate (models/dispatch.py): zero-pads the map to the kernel
    # grid so 8-aligned streams (JPEG imports, ragged camera sizes) ride
    # the fused int8 decode instead of the einsum fallback.
    from tpudct.models.dispatch import decode_gray_auto

    t1 = _time.perf_counter()
    rec_u8 = np.asarray(decode_gray_auto(p, coeffs, cfg, (h, w)))
    t2 = _time.perf_counter()
    imageio.save_image(args.output, rec_u8, quality=args.quality)
    t3 = _time.perf_counter()
    print(f"decoded {shown} -> {args.output}")
    # bytes-to-pixels phase decomposition, mirroring `encode`'s record
    print(json.dumps({"ms": {
        "entropy": round(t_entropy * 1e3, 1),
        "device_fetch": round((t2 - t1) * 1e3, 1),
        "save": round((t3 - t2) * 1e3, 1),
    }}))
    return 0


def cmd_bench(args) -> int:
    from tpudct.benchmark import (
        bench_fused_roundtrip,
        bench_pipeline,
        bench_serving_throughput,
    )

    if args.host_entropy:
        # Host-only serializer benchmark: no device work at all, so skip
        # the device benches (usable even when the TPU is unreachable).
        from tpudct.benchmark import bench_host_entropy

        for row in bench_host_entropy(
            args.size, _cfg_from(args), reps=args.reps, image=args.image
        ):
            print(json.dumps(row))
        return 0
    if args.e2e:
        # End-to-end wall time, decomposed: load -> device -> entropy ->
        # write for one image, plus the bulk `batch` flow with its
        # chosen-codec histogram (the pixels-to-bytes number the
        # device-only headline deliberately excludes).
        from tpudct.benchmark import bench_e2e_batch, bench_e2e_encode

        print(json.dumps(bench_e2e_encode(
            args.size, _cfg_from(args), image=args.image,
            entropy=args.entropy,
        )))
        if args.batch:
            print(json.dumps(bench_e2e_batch(
                args.batch, min(args.size, 1024), _cfg_from(args),
                entropy=args.entropy,
            )))
        return 0
    for name in args.pipelines.split(","):
        print(json.dumps(bench_pipeline(name.strip(), args.size, _cfg_from(args), reps=args.reps)))
    if args.fused:
        print(json.dumps(bench_fused_roundtrip(args.size, _cfg_from(args), reps=args.reps)))
    if args.batch:
        print(json.dumps(bench_serving_throughput(args.size, args.batch, _cfg_from(args), reps=args.reps)))
    if args.cpu:
        from tpudct.benchmark import bench_cpu_numpy

        print(json.dumps(bench_cpu_numpy(args.size, _cfg_from(args), reps=args.reps)))
    if args.color:
        from tpudct.benchmark import bench_color

        print(json.dumps(bench_color(
            args.size, args.pipelines.split(",")[0].strip(), _cfg_from(args),
            subsample=_chroma_mode(args), reps=args.reps,
        )))
        if args.batch:
            from tpudct.benchmark import bench_color_serving

            print(json.dumps(bench_color_serving(
                args.size, args.batch, _cfg_from(args), reps=args.reps,
            )))
    return 0


def cmd_sweep(args) -> int:
    from tpudct.benchmark import sweep

    sizes = [int(s) for s in args.sizes.split(",")]
    for row in sweep(sizes, [p.strip() for p in args.pipelines.split(",")], _cfg_from(args), reps=args.reps):
        print(json.dumps(row))
    return 0


def cmd_table(args) -> int:
    from tpudct.benchmark import (
        accuracy_table, accuracy_table_color, photographic_image, structured_image,
    )

    gen = photographic_image if args.image == "photo" else structured_image
    if args.color:
        if args.input is None:
            g = gen()
            img = np.stack([g, np.roll(g, 2, 0), np.roll(g, 4, 1)], -1)
        else:
            img = _load_rgb(args.input)
        rows = accuracy_table_color(
            img, args.pipeline, cfg_base=_cfg_from(args),
            subsample=_chroma_mode(args),
        )
    else:
        if args.input is None:
            # Reproducible stand-ins for the reference's 'Circuit' test
            # image (README.md:62-69), which is not shipped in its repo:
            # 'circuit' matches the CONTENT (harsh edge statistics),
            # 'photo' matches the photographic STATISTICS (standard-Q MSE
            # in the published ~18-80 range).
            img = gen()
        else:
            from tpudct.utils import imageio

            img = imageio.load_image(args.input)
        rows = accuracy_table(img, args.pipeline, cfg_base=_cfg_from(args))
    for row in rows:
        print(json.dumps(row))
    return 0


def cmd_curve(args) -> int:
    """Rate-distortion sweep: .tdc/.tdcc bytes+PSNR vs libjpeg per IJG
    quality (gray by default; --color sweeps the color codec against
    libjpeg's COLOR path at equal RGB PSNR — VERDICT r4 #4a)."""
    from tpudct.benchmark import (
        photographic_image, rate_distortion_curve,
        rate_distortion_curve_color, structured_image,
    )

    qs = [int(q) for q in args.qualities.split(",")]
    if args.color:
        if args.input is None:
            g = (photographic_image() if args.image == "photo"
                 else structured_image())
            img = np.stack([g, np.roll(g, 2, 0), np.roll(g, 4, 1)], -1)
        else:
            img = _load_rgb(args.input)
        rows = rate_distortion_curve_color(
            img, args.pipeline, qualities=qs, cfg_base=_cfg_from(args),
            codec=args.entropy, subsample=_chroma_mode(args),
        )
    else:
        if args.input is None:
            img = photographic_image() if args.image == "photo" else structured_image()
        else:
            from tpudct.utils import imageio

            img = imageio.load_image(args.input)
        rows = rate_distortion_curve(
            img, args.pipeline, qualities=qs, cfg_base=_cfg_from(args),
            codec=args.entropy,
        )
    for row in rows:
        print(json.dumps(row))
    if len(rows) >= 4:
        # BD-rate/BD-PSNR summary (Bjøntegaard): the integrated
        # equal-quality rate delta vs libjpeg over the whole curve —
        # negative bd_rate = smaller files at the same PSNR everywhere.
        from tpudct.benchmark import bd_summary

        summary = {"transform": getattr(args, "transform", "haweel")}
        try:
            summary.update(bd_summary(rows))
        except ValueError as e:  # non-monotone/overlap-free curves
            summary["bd_error"] = str(e)
        print(json.dumps(summary))
    return 0


def cmd_unbatch(args) -> int:
    """Bulk decode a directory of .tdc/.tdcc files back to images, resumably
    (the inverse of `batch`, same manifest idempotence and corrupt-file
    tolerance).  --ext picks the output format: .jpg (native libjpeg,
    quality honored) or a lossless one like .png for exact pixels."""
    import pathlib

    import jax.numpy as jnp

    from tpudct.config import CodecConfig
    from tpudct.models import get_pipeline
    from tpudct.ops.transform import to_uint8
    from tpudct.utils import imageio, serialize

    ext = args.ext if args.ext.startswith(".") else "." + args.ext
    ext = ext.lower()
    if ext not in imageio.SUPPORTED_EXTS:
        raise SystemExit(
            f"error: --ext {args.ext!r} not supported; use one of "
            f"{sorted(imageio.SUPPORTED_EXTS)}"
        )
    m_scale = _parse_scale(args.scale) if args.scale is not None else None
    src = pathlib.Path(args.input_dir)
    dst = pathlib.Path(args.output_dir)
    dst.mkdir(parents=True, exist_ok=True)
    manifest = dst / "manifest.jsonl"
    done = set()
    if manifest.exists():
        for line in manifest.read_text().splitlines():
            try:
                rec = json.loads(line)
                # Resume is PER OUTPUT FORMAT and PER SCALE: a re-run with
                # a different --ext or --scale must decode again.  Stream-
                # intrinsic error records stay done (a corrupt stream is
                # corrupt in every format) but I/O-class failures (disk
                # full, NFS hiccup) retry.
                out_name = rec.get("out", rec.get("jpg", ""))  # "jpg": legacy key
                if "error" in rec:
                    if rec.get("error_kind", "stream") != "io":
                        done.add(rec["file"])
                elif out_name.lower().endswith(ext) and rec.get("scale") == m_scale:
                    done.add(rec["file"])
            except (json.JSONDecodeError, KeyError):
                continue

    if args.transcode and ext not in imageio.JPEG_EXTS:
        raise SystemExit(
            "error: --transcode restores .jpg files; use --ext .jpg"
        )
    if (args.optimize or args.progressive or args.arithmetic) and (
        not args.transcode
    ):
        raise SystemExit(
            "error: --optimize/--progressive/--arithmetic re-code the "
            "output JPEG's entropy stage losslessly; they need --transcode "
            "(the plain decode path re-encodes pixels, where only "
            "--quality applies)"
        )
    if m_scale is not None and args.transcode:
        raise SystemExit(
            "error: --scale decodes pixels; it does not combine with the "
            "lossless --transcode export"
        )
    files = sorted(
        q.name for q in src.iterdir() if q.suffix.lower() in (".tdc", ".tdcc")
    )
    todo = [name for name in files if name not in done]
    decoded = failed = 0

    if args.transcode:
        # Lossless export (inverse of `batch --transcode`): entropy-encode
        # each coefficient map straight back into a .jpg — bit-exact, no
        # pixel-domain hop, no device.  Pure C/zlib work that releases the
        # GIL, so a file-level thread pool mirrors batch --transcode.
        import os as _os
        import threading
        from concurrent.futures import ThreadPoolExecutor, as_completed

        from tpudct.utils import jpegcoef

        if not jpegcoef.coef_io_available():
            raise ValueError(
                "unbatch --transcode needs the native library (make -C csrc)"
            )

        def _one(name):
            out = dst / (name + ext)
            try:
                data = (src / name).read_bytes()
            except OSError as e:
                return ("err", "io", str(e))
            try:
                jpegcoef.export_jpeg(data, out, optimize=args.optimize,
                                     progressive=args.progressive,
                                     arithmetic=args.arithmetic)
            except ValueError as e:
                return ("err", "stream", str(e))
            except OSError as e:
                return ("err", "io", str(e))
            return ("ok", out.name)

        lock = threading.Lock()
        jobs = min(_os.cpu_count() or 4, 16)
        with open(manifest, "a") as mf, ThreadPoolExecutor(jobs) as ex:
            futs = {ex.submit(_one, n): n for n in todo}
            for fut in as_completed(futs):
                name = futs[fut]
                res = fut.result()
                with lock:
                    if res[0] == "err":
                        mf.write(json.dumps({
                            "file": name, "error": res[2],
                            "error_kind": res[1],
                        }) + "\n")
                        failed += 1
                    else:
                        mf.write(json.dumps(
                            {"file": name, "out": res[1], "transcode": True}
                        ) + "\n")
                        decoded += 1
                    mf.flush()
        print(json.dumps({
            "decoded": decoded, "skipped": len(files) - len(todo),
            "failed": failed, "total": len(files), "manifest": str(manifest),
        }))
        return 0

    p = get_pipeline(args.pipeline)
    import os as _os
    import threading
    from concurrent.futures import ThreadPoolExecutor, as_completed

    n_threads = min(_os.cpu_count() or 4, 16)
    chunk = n_threads * 4
    lock = threading.Lock()

    def _read(name):
        try:
            return (src / name).read_bytes()
        except OSError as e:
            return ("err", "io", str(e))

    def _mf_error(mf, name, kind, msg):
        """ONE copy of the manifest error record (resume logic keys off
        error_kind; a drifted copy would silently break retry semantics
        for whichever path diverged)."""
        mf.write(json.dumps({
            "file": name, "error": msg, "error_kind": kind,
        }) + "\n")
        mf.flush()

    def _mf_done(mf, name, out_name, shape, streamed=False):
        rec = {"file": name, "out": out_name, "shape": list(shape)}
        if streamed:
            rec["streamed"] = True
        if m_scale is not None:
            rec["scale"] = m_scale
        mf.write(json.dumps(rec) + "\n")
        mf.flush()

    def _parse(data):
        """Entropy-decode one stream's bytes on a host thread (the entropy
        stages are C/zlib/lzma work that releases the GIL)."""
        if isinstance(data, tuple):  # read error, already tagged
            return data
        try:
            if serialize.is_color_stream(data[:4]):
                return ("color", *serialize.bytes_to_color(data))
            coeffs, q_scale, _k, (h, w), transform, q_table = (
                serialize.bytes_to_coefficients(
                    data, with_orig_shape=True, with_transform=True,
                    with_q_table=True,
                )
            )
            return ("gray", coeffs,
                    CodecConfig(q_scale=q_scale, transform=transform,
                                q_table=q_table), (h, w))
        except ValueError as e:
            return ("err", "stream", str(e))
        except OSError as e:
            return ("err", "io", str(e))

    def _map_elems(data) -> int:
        """Decoded-map elements of a stream, from the header only (sizes
        the waves below; parse errors surface later in `_parse`)."""
        if isinstance(data, tuple):
            return 0
        try:
            rep = serialize.inspect_stream(data)
        except ValueError:
            return 0
        if "planes" in rep:
            return sum(int(np.prod(pl["shape"])) for pl in rep["planes"])
        return int(np.prod(rep["shape"]))

    # Residency cap for decoded coefficient maps: the old per-file loop
    # held ONE map at a time; a full 64-name chunk of 8192^2 f32 maps
    # would hold ~16 GB.  Waves keep <=~1 GiB of decoded maps live while
    # still stacking/threading within each wave.
    wave_elems = 1 << 28

    def _process_wave(names, parsed, mf):
        nonlocal decoded, failed
        outputs: list = [None] * len(names)

        def _group_decode(stacked_fn, single_fn, items):
            """Stacked decode with the per-file recovery contract: if the
            stacked launch rejects (one corrupt-but-parseable stream in
            the stack), redo the group per item so only the bad file
            fails — one corrupt stream must not abort the job."""
            try:
                return stacked_fn(items)
            except (ValueError, OSError):
                recs = []
                for it in items:
                    try:
                        recs.append(single_fn(it))
                    except (ValueError, OSError) as e:
                        recs.append((
                            "err",
                            "io" if isinstance(e, OSError) else "stream",
                            str(e),
                        ))
                return recs

        # Full-size gray decodes stack as ONE device dispatch per
        # same-width/same-config group (models/dispatch.py
        # decode_gray_batch_auto, bit-identical to per-stream) — the
        # bulk job stops paying per-image launch overhead; --scale rides
        # the stacked scaled twin.
        gray_idx = [
            j for j, res in enumerate(parsed) if res[0] == "gray"
        ]
        if gray_idx:
            gray_items = [(parsed[j][1], parsed[j][2], parsed[j][3])
                          for j in gray_idx]
            if m_scale is None:
                from tpudct.models.dispatch import (
                    decode_gray_auto, decode_gray_batch_auto,
                )

                recs = _group_decode(
                    lambda items: decode_gray_batch_auto(p, items),
                    lambda it: decode_gray_auto(p, *it),
                    gray_items,
                )
            else:
                from tpudct.models.dispatch import (
                    decode_gray_scaled_auto, decode_gray_scaled_batch_auto,
                )

                recs = _group_decode(
                    lambda items: decode_gray_scaled_batch_auto(
                        p, items, m_scale
                    ),
                    lambda it: decode_gray_scaled_auto(p, *it, m_scale),
                    gray_items,
                )
            for j, r in zip(gray_idx, recs):
                outputs[j] = r
        color_idx = [
            j for j, res in enumerate(parsed) if res[0] == "color"
        ]
        if m_scale is None and color_idx:
            from tpudct.models.color import (
                decode_color_auto, decode_color_batch_auto,
            )

            recs = _group_decode(
                lambda items: decode_color_batch_auto(p, items),
                lambda it: np.asarray(decode_color_auto(p, *it)),
                [(parsed[j][1], parsed[j][2],
                  CodecConfig(q_scale=parsed[j][2]["q_scale"],
                              transform=parsed[j][2]["transform"]))
                 for j in color_idx],
            )
            for j, r in zip(color_idx, recs):
                outputs[j] = r
        for j, res in enumerate(parsed):
            if outputs[j] is not None or res[0] == "err":
                continue
            try:
                if res[0] == "color":  # color at fractional scale
                    _tag, planes, meta = res
                    ccfg = CodecConfig(q_scale=meta["q_scale"],
                                       transform=meta["transform"])
                    from tpudct.models.color import decode_color_scaled

                    fac = 8 // m_scale if 8 % m_scale == 0 else None
                    outputs[j] = np.asarray(decode_color_scaled(
                        p, planes, meta, ccfg, fac,
                        m=None if fac else m_scale,
                    ))
            except (ValueError, OSError) as e:
                outputs[j] = (
                    "err", "io" if isinstance(e, OSError) else "stream",
                    str(e),
                )

        def _save(j):
            res = outputs[j] if outputs[j] is not None else parsed[j]
            if isinstance(res, tuple) and res and res[0] == "err":
                return ("err", res[1], res[2])
            out = dst / (names[j] + ext)
            try:
                imageio.save_image(out, res, quality=args.quality)
            except (ValueError, OSError) as e:
                return ("err", "io" if isinstance(e, OSError) else "stream",
                        str(e))
            return ("ok", out.name, list(res.shape))

        with ThreadPoolExecutor(n_threads) as ex:
            futs = {ex.submit(_save, j): j for j in range(len(names))}
            for fut in as_completed(futs):
                j = futs[fut]
                res = fut.result()
                with lock:
                    if res[0] == "err":
                        # One corrupt stream must not abort the job
                        # (same recovery contract as `batch`); I/O
                        # failures are marked retryable.
                        _mf_error(mf, names[j], res[1], res[2])
                        failed += 1
                    else:
                        _mf_done(mf, names[j], res[1], res[2])
                        decoded += 1

    with open(manifest, "a") as mf:
        for ci in range(0, len(todo), chunk):
            cnames = todo[ci : ci + chunk]
            with ThreadPoolExecutor(n_threads) as ex:
                datas = list(ex.map(_read, cnames))
            from tpudct.models.dispatch import _chunk

            # Beyond-threshold archives stream individually (round 5):
            # the wave machinery loads whole coefficient maps, which for a
            # beyond-HBM banded archive means gigabytes of host residency
            # and a whole-map device dispatch — exactly what the streamed
            # decoders exist to avoid.  Mirrors `batch`'s encode routing;
            # a .npy --ext writes the raster through a disk memmap.
            from tpudct.utils import streaming as _streaming

            bigset = set()
            for j, d in enumerate(datas):
                if isinstance(d, tuple) or _map_elems(d) <= _streaming.STREAM_PIXELS:
                    continue
                bigset.add(j)
                name = cnames[j]
                out = dst / (name + ext)
                try:
                    kw = {"out_npy": str(out)} if ext == ".npy" else {}
                    if serialize.is_color_stream(d[:4]):
                        rec = _streaming.decode_color_streamed(
                            p, d, scale_m=m_scale, **kw
                        )
                    else:
                        rec = _streaming.decode_gray_streamed(
                            p, d, scale_m=m_scale, **kw
                        )
                    if isinstance(rec, np.memmap):
                        rec.flush()
                    else:
                        imageio.save_image(
                            out, np.asarray(rec), quality=args.quality
                        )
                    _mf_done(mf, name, out.name, rec.shape, streamed=True)
                    decoded += 1
                except (ValueError, OSError) as e:
                    _mf_error(mf, name, "io" if isinstance(e, OSError)
                              else "stream", str(e))
                    failed += 1

            rest = [j for j in range(len(datas)) if j not in bigset]
            waves = _chunk(
                rest, [_map_elems(d) for d in datas],
                wave_elems,
            )
            for wave in waves:
                wnames = [cnames[j] for j in wave]
                with ThreadPoolExecutor(n_threads) as ex:
                    parsed = list(ex.map(_parse, (datas[j] for j in wave)))
                _process_wave(wnames, parsed, mf)

    print(json.dumps({
        "decoded": decoded, "skipped": len(files) - len(todo),
        "failed": failed, "total": len(files), "manifest": str(manifest),
    }))
    return 0


def cmd_batch(args) -> int:
    """Bulk encode a directory of JPEGs to .tdc files, resumably.

    The reference persists nothing but one output JPEG per run (SURVEY.md
    §5: checkpoint/resume "none"); production bulk jobs need restartable
    progress.  A manifest (JSONL, one record per completed file) makes the
    command idempotent: re-running skips completed work.
    """
    import pathlib

    import jax.numpy as jnp

    from tpudct.models import get_pipeline
    from tpudct.models.dispatch import encode_gray_batch_auto
    from tpudct.utils import imageio, serialize

    src = pathlib.Path(args.input_dir)
    dst = pathlib.Path(args.output_dir)
    dst.mkdir(parents=True, exist_ok=True)
    manifest = dst / "manifest.jsonl"
    # Resume is PER CONFIGURATION: success records carry a signature of
    # everything that changes the output, so re-running with different
    # flags (--color, --entropy, --q-scale, --transcode, ...) re-encodes
    # instead of silently skipping.  Error records stay done only for
    # stream-intrinsic failures (corrupt inputs); I/O-class errors retry.
    # Legacy records (no cfg/kind fields) keep their old always-done
    # meaning.
    c0 = _cfg_from(args)
    sig = (f"t={c0.transform};q={c0.q_scale};k={c0.retain_k};"
           f"qt={c0.q_table};e={args.entropy};"
           f"c={int(bool(getattr(args, 'color', False)))};"
           f"s={_chroma_mode(args)};"
           f"x={int(bool(getattr(args, 'transcode', False)))}")
    done = set()
    if manifest.exists():
        for line in manifest.read_text().splitlines():
            try:
                rec = json.loads(line)
                name = rec["file"]
            except (json.JSONDecodeError, KeyError):
                continue
            if "error" in rec:
                if rec.get("error_kind", "stream") != "io":
                    done.add(name)
            elif rec.get("cfg", sig) == sig:
                done.add(name)

    if args.transcode:
        # Lossless archival mode: coefficient-level import (utils/jpegcoef),
        # no IDCT/FDCT and no device — every .jpg becomes a bit-exact-
        # recoverable .tdc/.tdcc, typically SMALLER than the source (the
        # rans/xz stages beat JPEG's baseline Huffman on the same
        # symbols).  `unbatch --transcode` restores the .jpg files.
        from tpudct.utils import jpegcoef

        if not jpegcoef.coef_io_available():
            raise ValueError(
                "batch --transcode needs the native library (make -C csrc)"
            )
        files = sorted(
            q.name for q in src.iterdir()
            if q.suffix.lower() in imageio.JPEG_EXTS
        )
        todo = [name for name in files if name not in done]
        coded = failed = 0
        bytes_in = bytes_out = 0
        # File-level thread pool: the whole job is C/zlib/lzma work that
        # releases the GIL (coefficient read, entropy trials), so threads
        # scale with cores.  Results land in the manifest in completion
        # order under a lock — resume semantics are per-file, order-free.
        import os as _os
        import threading
        from concurrent.futures import ThreadPoolExecutor, as_completed

        jobs = args.decode_threads if args.decode_threads > 0 else min(
            _os.cpu_count() or 4, 16
        )

        def _one(name):
            # kind classification is by PHASE, not exception type: a parse
            # failure (jpegcoef raises IOError for those too) is intrinsic
            # to the file and stays skipped on resume; an output-write
            # failure (disk full) is transient and retries.
            try:
                data = jpegcoef.import_jpeg(src / name, codec=args.entropy)
            except (OSError, ValueError) as e:
                return ("err", "stream", str(e))
            ext = ".tdcc" if serialize.is_color_stream(data) else ".tdc"
            out = dst / (name + ext)
            try:
                out.write_bytes(data)
                src_bytes = (src / name).stat().st_size
            except OSError as e:
                return ("err", "io", str(e))
            return ("ok", out.name, len(data), src_bytes)

        lock = threading.Lock()
        with open(manifest, "a") as mf, ThreadPoolExecutor(jobs) as ex:
            futs = {ex.submit(_one, n): n for n in todo}
            for fut in as_completed(futs):
                name = futs[fut]
                res = fut.result()
                if res[0] == "err":
                    _tag, kind, msg = res
                    with lock:
                        mf.write(json.dumps({
                            "file": name, "error": msg, "error_kind": kind,
                        }) + "\n")
                        mf.flush()
                        failed += 1
                    continue
                _tag, out_name, nbytes, src_bytes = res
                with lock:
                    bytes_in += src_bytes
                    bytes_out += nbytes
                    mf.write(json.dumps({
                        "file": name, "tdc": out_name, "bytes": nbytes,
                        "src_bytes": src_bytes, "transcode": True,
                        "cfg": sig,
                    }) + "\n")
                    mf.flush()
                    coded += 1
        rep = {
            "transcoded": coded, "skipped": len(files) - len(todo),
            "failed": failed, "total": len(files), "manifest": str(manifest),
        }
        if bytes_in:
            rep["bytes_in"] = bytes_in
            rep["bytes_out"] = bytes_out
            rep["saved_pct"] = round(100.0 * (1 - bytes_out / bytes_in), 2)
        print(json.dumps(rep))
        return 0

    cfg = _cfg_from(args)
    p = get_pipeline(args.pipeline)
    if args.color:
        from tpudct.models.color import encode_color_batch_auto

    files = sorted(
        q.name for q in src.iterdir()
        if q.suffix.lower() in imageio.SUPPORTED_EXTS
    )
    todo = [name for name in files if name not in done]
    skipped = len(files) - len(todo)
    coded = failed = 0
    import os as _os
    import threading
    from concurrent.futures import ThreadPoolExecutor, as_completed

    n_threads = args.decode_threads if args.decode_threads > 0 else min(_os.cpu_count() or 4, 16)
    chunk = n_threads * 4
    lock = threading.Lock()
    # Residency cap (same contract as unbatch's decoded-map waves): the
    # raw images + padded stacks + coefficient maps of a wave stay within
    # ~3x this element count; header-only probes size the waves so a
    # 64-name chunk of 8192^2 frames doesn't hold ~13 GB at once.
    wave_elems = 1 << 28
    from tpudct.models.dispatch import _chunk as _split_waves

    def _probe_elems(name) -> int:
        hw = imageio.probe_image_size(str(src / name))
        if hw is None:
            return 0
        return hw[0] * hw[1] * (3 if args.color else 1)

    # Phase accounting for the summary record: host image decode vs the
    # (deliberately thread-overlapped) device encode + entropy/serialize
    # block — the bulk analog of `encode`'s per-phase "ms" decomposition.
    import time as _time

    t_wall0 = _time.perf_counter()
    load_s = enc_ser_s = 0.0
    with open(manifest, "a") as mf:
        file_waves = [
            [todo[i + j] for j in wave]
            for i in range(0, len(todo), chunk)
            for wave in _split_waves(
                range(len(todo[i : i + chunk])),
                [_probe_elems(n) for n in todo[i : i + chunk]],
                wave_elems,
            )
        ]
        for names in file_waves:
            t_w0 = _time.perf_counter()
            # Host decode is the bulk bottleneck (device encode ~0.1 ms per
            # image); JPEGs ride the native pthread pool per chunk, any
            # other accepted format loads via PIL one-by-one (same
            # corrupt-file-tolerant None contract).
            jpgs = [
                n for n in names
                if pathlib.Path(n).suffix.lower() in imageio.JPEG_EXTS
            ]
            pooled = dict(zip(jpgs, imageio.load_jpeg_batch(
                [src / n for n in jpgs], n_threads=n_threads, errors="none",
                force_gray=not args.color,
            ))) if jpgs else {}
            images = []
            for n in names:
                if n in pooled:
                    images.append(pooled[n])
                else:
                    try:
                        images.append(imageio.load_image(
                            str(src / n), force_gray=not args.color
                        ))
                    except (OSError, ValueError):
                        images.append(None)
            pairs = []
            for name, img in zip(names, images):
                if img is None:
                    # One corrupt file must not abort the job: record the
                    # failure in the manifest (so re-runs skip it too) and
                    # keep going.  SURVEY.md §5: the reference's only error
                    # handling is print-and-exit; this path is the recovery
                    # story it lacks.
                    mf.write(json.dumps({"file": name, "error": "decode_failed"}) + "\n")
                    mf.flush()
                    failed += 1
                    continue
                pairs.append((name, img))
            load_s += _time.perf_counter() - t_w0
            t_w1 = _time.perf_counter()
            if not pairs:
                continue
            if args.color:
                # Stacked device pass (color twin): same-width frames ride
                # ONE split + luma-codec + chroma-codec launch per chunk
                # (models/color.py encode_color_batch_auto, bit-identical
                # to per-frame); serialization threads like the gray path.
                rgbs = [
                    np.stack([im] * 3, axis=-1) if im.ndim == 2 else im
                    for _, im in pairs
                ]
                encc = encode_color_batch_auto(
                    p, rgbs, cfg, subsample=_chroma_mode(args)
                )

                def _save_color(j):
                    name = pairs[j][0]
                    planes, meta = encc[j]
                    out = dst / (name + ".tdcc")
                    n = serialize.save_color(
                        out, planes, meta, cfg.q_scale, cfg.retain_k,
                        cfg.transform, codec=args.entropy,
                    )
                    return name, out.name, n, meta["orig_shape"]

                with ThreadPoolExecutor(n_threads) as ex:
                    for fut in as_completed(
                        ex.submit(_save_color, j) for j in range(len(pairs))
                    ):
                        name, out_name, n, (h, w) = fut.result()
                        with lock:
                            mf.write(json.dumps({
                                "file": name, "tdc": out_name, "bytes": n,
                                "shape": [h, w, 3], "cfg": sig,
                            }) + "\n")
                            mf.flush()
                            coded += 1
                enc_ser_s += _time.perf_counter() - t_w1
                continue
            # Taller-than-HBM frames in a bulk job stream band-by-band
            # into banded containers instead of risking a whole-image
            # device allocation (same path as `encode --band-rows`).
            from tpudct.utils import streaming as _streaming

            big = [(nm, im) for nm, im in pairs
                   if im.size > _streaming.STREAM_PIXELS]
            if big:
                pairs = [(nm, im) for nm, im in pairs
                         if im.size <= _streaming.STREAM_PIXELS]
                for name, im in big:
                    out = dst / (name + ".tdc")
                    try:
                        data, (h, w) = _streaming.encode_gray_streamed_bytes(
                            p, np.asarray(im, np.uint8), cfg,
                            inner=_stream_inner(args.entropy),
                        )
                        out.write_bytes(data)
                    except (ValueError, OSError) as e:
                        mf.write(json.dumps({
                            "file": name, "error": str(e),
                            "error_kind": "io" if isinstance(e, OSError) else "stream",
                        }) + "\n")
                        mf.flush()
                        failed += 1
                        continue
                    mf.write(json.dumps({
                        "file": name, "tdc": out.name, "bytes": len(data),
                        "shape": [h, w], "cfg": sig, "streamed": True,
                    }) + "\n")
                    mf.flush()
                    coded += 1
                if not pairs:
                    enc_ser_s += _time.perf_counter() - t_w1
                    continue
            # Stacked device pass: same-width images in the chunk ride ONE
            # kernel launch as a taller image (models/dispatch.py
            # encode_gray_batch_auto, bit-identical to per-image), instead
            # of paying per-image dispatch overhead B times.  The entropy/
            # serialize stage is C/zlib work that releases the GIL, so the
            # per-file writes ride the same thread pool as the loads.
            enc = encode_gray_batch_auto(p, [im for _, im in pairs], cfg)

            def _save(j):
                name = pairs[j][0]
                c, (h, w) = enc[j]
                # Full input name in the output avoids a.jpg/a.jpeg collisions.
                out = dst / (name + ".tdc")
                n = serialize.save_coefficients(
                    out, np.asarray(c), cfg.q_scale, cfg.retain_k,
                    orig_shape=(h, w), transform=cfg.transform,
                    codec=args.entropy, q_table=cfg.q_table,
                )
                return name, out.name, n, (h, w)

            with ThreadPoolExecutor(n_threads) as ex:
                for fut in as_completed(ex.submit(_save, j) for j in range(len(pairs))):
                    name, out_name, n, (h, w) = fut.result()
                    with lock:
                        mf.write(json.dumps({
                            "file": name, "tdc": out_name, "bytes": n,
                            "shape": [h, w], "cfg": sig,
                        }) + "\n")
                        mf.flush()
                        coded += 1
            enc_ser_s += _time.perf_counter() - t_w1
    print(json.dumps({
        "encoded": coded, "skipped": skipped, "failed": failed,
        "total": len(files), "manifest": str(manifest),
        "ms": {"load": round(load_s * 1e3, 1),
               "encode_serialize": round(enc_ser_s * 1e3, 1),
               "wall": round((_time.perf_counter() - t_wall0) * 1e3, 1)},
    }))
    return 0


def cmd_scale(args) -> int:
    from tpudct.parallel.scaling import scaling_table

    counts = None
    if args.devices:
        counts = [int(x) for x in args.devices.split(",")]
    k_pair = None
    if args.k_pair:
        k_pair = tuple(int(x) for x in args.k_pair.split(","))
        if len(k_pair) != 2:
            raise ValueError(f"--k-pair expects A,B, got {args.k_pair!r}")
    for row in scaling_table(args.size, args.pipeline, counts, _cfg_from(args),
                             reps=args.reps, k_pair=k_pair):
        print(json.dumps(row))
    return 0


def cmd_profile(args) -> int:
    """Per-kernel device trace of a codec pass (SURVEY.md §5: the TPU
    analog of the reference's cudaEvent phase pairs is slope timing
    [utils.timing] PLUS a jax.profiler timeline; this exposes the latter).
    The trace directory opens in TensorBoard / Perfetto."""
    import jax
    import jax.numpy as jnp

    from tpudct.benchmark import synthetic_image
    from tpudct.models import get_pipeline
    from tpudct.utils import profiling

    cfg = _cfg_from(args)
    p = get_pipeline(args.pipeline)
    x = jnp.asarray(synthetic_image(args.size))
    f = p.jit_roundtrip(cfg)
    jax.block_until_ready(f(x))  # compile outside the trace window
    with profiling.trace(args.out):
        with profiling.annotate(f"{p.name}-roundtrip-{args.size}"):
            r = None
            for _ in range(args.reps):
                r = f(x)
            jax.block_until_ready(r)
    print(json.dumps({
        "trace_dir": args.out, "pipeline": p.name, "size": args.size,
        "reps": args.reps,
    }))
    return 0


def cmd_selftest(args) -> int:
    """On-device correctness gate as a user command: run one image through
    the COMPILED kernels on the current backend and assert against the
    float64 golden model (the automated form of the reference's manual
    stage-corner eyeball, main_cublass.cu:121-128; same gate bench.py
    runs before timing)."""
    import pathlib
    import sys as _sys

    _sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    try:
        from bench import correctness_gate, family_gates
    except ImportError:
        raise ValueError(
            "selftest needs the repo checkout (bench.py + tests/golden.py)"
        ) from None
    from tpudct.config import CodecConfig
    from tpudct.models import get_pipeline

    # The golden model covers the reference configuration (haweel/luma,
    # q_scale 1) — the gate always checks that exact config.
    p = get_pipeline(args.pipeline)
    try:
        rep = correctness_gate(p, CodecConfig(), size=args.size)
        fams = family_gates(p, CodecConfig()) if args.families else []
    except (AssertionError, ValueError, OSError, RuntimeError) as e:
        print(json.dumps({"gate": "FAIL", "reason": str(e)}))
        return 1
    print(json.dumps(rep))
    for f in fams:
        print(json.dumps(f))
    return 0


def cmd_inspect(args) -> int:
    """Header-only introspection of .tdc/.tdcc files (no payload decode):
    container/version, geometry, codec config, entropy stage and payload
    sizes — the stream analog of `info` for the environment."""
    from tpudct.utils import serialize

    rc = 0
    for path in args.files:
        try:
            with open(path, "rb") as f:
                data = f.read()
            rep = serialize.inspect_stream(data)
        except (OSError, ValueError) as e:
            print(json.dumps({"file": path, "error": str(e)}))
            rc = 1
            continue
        print(json.dumps({"file": path, **rep}))
    return rc


def cmd_transcode(args) -> int:
    """Lossless coefficient-domain transcode between .jpg and .tdc — the
    jpegtran idea pointed at the tpudct container.  Direction follows the
    destination extension: `transcode in.jpg out.tdc` imports the JPEG's
    quantized coefficients without any IDCT (transform='dct', the file's
    quantization table embedded); `transcode in.tdc out.jpg` entropy-
    encodes a transform='dct' map straight into a standards-compliant
    JPEG.  jpg -> tdc -> jpg is bit-exact at the coefficient level — the
    reference's save path re-runs the whole lossy pipeline per hop
    (utils.cu:98-147)."""
    import os

    from tpudct.utils import jpegcoef

    def _need_native():
        # Only the jpg <-> tdc directions touch libjpeg; the tdc -> tdc
        # entropy restage is pure host Python and works everywhere.
        if not jpegcoef.coef_io_available():
            raise ValueError(
                "transcode to/from .jpg needs the native library "
                "(make -C csrc); coefficient-level libjpeg access has no "
                "pure-Python fallback"
            )

    dst = args.dst.lower()
    if (args.optimize or args.progressive or args.arithmetic) and not (
        dst.endswith((".jpg", ".jpeg"))
    ):
        raise ValueError(
            "--optimize/--progressive/--arithmetic select the output "
            "JPEG's entropy coding; they need a .jpg destination"
        )
    if dst.endswith((".tdc", ".tdcc")) and args.src.lower().endswith(
        (".tdc", ".tdcc")
    ):
        # Entropy RESTAGE: re-code an existing container with a different
        # entropy stage, no decode and no loss — every header field, the
        # embedded q tables and the TDCM metadata chunk carry over.  Use
        # case: upgrading archives after a codec improvement (e.g.
        # pre-xz auto-coded files).
        from tpudct.utils import serialize

        with open(args.src, "rb") as f:
            data = f.read()
        color = serialize.is_color_stream(data)
        if color != dst.endswith(".tdcc"):
            raise ValueError(
                f"{args.src} is a {'.tdcc' if color else '.tdc'} stream; "
                "the restage destination must keep the container type"
            )
        out = None
        if args.entropy == "banded" or args.entropy.startswith("banded:"):
            n_spec, inner_spec = serialize._parse_banded_spec(args.entropy)
            if n_spec == 0:
                # banded -> banded with the source's own row splits:
                # restage ONE SEGMENT AT A TIME (round 5) — a beyond-HBM
                # archive upgrades its entropy stage without its
                # coefficient map ever materializing.  Non-banded sources
                # (and explicit :N resplits, which need the whole map)
                # fall through to the whole-map path below.
                try:
                    out = (serialize.restage_banded_color(data, inner_spec)
                           if color else
                           serialize.restage_banded_plane(data, inner_spec))
                except ValueError:
                    out = None  # not banded / corrupt: the whole-map path
                    #             re-parses and surfaces any real error
        if out is not None:
            pass
        elif color:
            planes, meta = serialize.bytes_to_color(data)
            out = serialize.color_to_bytes(
                planes, meta, meta["q_scale"], meta["retain_k"],
                meta["transform"], codec=args.entropy,
            )
        else:
            coeffs, q_scale, rk, oshape, transform, q_table = (
                serialize.bytes_to_coefficients(
                    data, with_orig_shape=True, with_transform=True,
                    with_q_table=True,
                )
            )
            out = serialize.coefficients_to_bytes(
                coeffs, q_scale, rk, orig_shape=oshape, transform=transform,
                q_table=q_table, codec=args.entropy,
            )
        out = jpegcoef._attach_metadata(out, jpegcoef._extract_metadata(data))
        with open(args.dst, "wb") as f:
            f.write(out)
        print(json.dumps({
            "direction": "restage", "src": args.src, "dst": args.dst,
            "entropy": args.entropy, "bytes": len(out),
            "src_bytes": len(data),
        }))
        return 0
    if dst.endswith((".tdc", ".tdcc")):
        from tpudct.utils.serialize import inspect_stream, is_color_stream

        _need_native()
        data = jpegcoef.import_jpeg(args.src, codec=args.entropy)
        color = is_color_stream(data)
        if color != dst.endswith(".tdcc"):
            raise ValueError(
                f"{args.src} is a {'color' if color else 'grayscale'} JPEG; "
                f"write it to a {'.tdcc' if color else '.tdc'} destination"
            )
        with open(args.dst, "wb") as f:
            f.write(data)
        rep = inspect_stream(data)
        plane0 = rep["planes"][0] if color else rep
        print(json.dumps({
            "direction": "jpg->tdcc" if color else "jpg->tdc",
            "src": args.src, "dst": args.dst,
            "bytes": len(data), "src_bytes": os.path.getsize(args.src),
            "codec": plane0["codec"], "shape": plane0["orig_shape"],
        }))
        return 0
    if dst.endswith((".jpg", ".jpeg")):
        _need_native()
        with open(args.src, "rb") as f:
            data = f.read()
        jpegcoef.export_jpeg(data, args.dst, optimize=args.optimize,
                             progressive=args.progressive,
                             arithmetic=args.arithmetic)
        print(json.dumps({
            "direction": "tdc->jpg", "src": args.src, "dst": args.dst,
            "bytes": os.path.getsize(args.dst), "src_bytes": len(data),
        }))
        return 0
    raise ValueError(
        f"transcode needs a .tdc or .jpg destination, got {args.dst!r}"
    )


def cmd_edit(args) -> int:
    """Lossless geometric edits on .tdc/.tdcc streams — the jpegtran
    transform set (flip/rotate/transpose/crop) applied directly to the
    quantized coefficients (utils/coefops.py), zero generation loss.
    The reference would have to decode, edit pixels and re-run the whole
    lossy pipeline (utils.cu:98-147).  Ops apply left-to-right after
    --grayscale and the (block-aligned) --crop; edits that would move a
    partial edge block refuse, like `jpegtran -perfect`.  EXIF/ICC
    metadata (TDCM chunk) carries over verbatim.  A .jpg source is
    imported at the coefficient level first and a .jpg destination
    exported the same way, so `edit in.jpg out.jpg --op rot90` is the
    literal jpegtran workflow with no pixel hop."""
    import os

    from tpudct.utils import jpegcoef
    from tpudct.utils.coefops import edit_stream
    from tpudct.utils.serialize import is_color_stream

    def _is_jpg(path):
        return str(path).lower().endswith((".jpg", ".jpeg"))

    ops = args.op or []
    recode = args.optimize or args.progressive or args.arithmetic
    if recode and not _is_jpg(args.dst):
        raise ValueError(
            "--optimize/--progressive/--arithmetic select the output "
            "JPEG's entropy coding; they need a .jpg destination"
        )
    if not ops and args.crop is None and not args.grayscale and not recode:
        raise ValueError(
            "nothing to do: pass --op, --crop, --grayscale and/or "
            "--optimize/--progressive/--arithmetic"
        )
    if (_is_jpg(args.src) or _is_jpg(args.dst)) and not jpegcoef.coef_io_available():
        raise ValueError(
            "edit to/from .jpg needs the native library (make -C csrc); "
            "coefficient-level libjpeg access has no pure-Python fallback"
        )
    # A .jpg destination re-encodes through libjpeg's entropy coder, so any
    # .tdc entropy staging of the intermediates is thrown away — skip the
    # (twice-run) 4-codec 'auto' trials and carry raw payloads instead.
    stage = "raw" if _is_jpg(args.dst) else args.entropy
    if _is_jpg(args.src):
        # `edit in.jpg out.jpg --op rot90` IS jpegtran: import, edit the
        # coefficients, export — never a pixel hop.
        src_bytes = os.path.getsize(args.src)
        data = jpegcoef.import_jpeg(args.src, codec=stage)
    else:
        with open(args.src, "rb") as f:
            data = f.read()
        src_bytes = len(data)
    color_out = is_color_stream(data) and not args.grayscale
    if not _is_jpg(args.dst) and color_out != args.dst.lower().endswith(".tdcc"):
        raise ValueError(
            f"the edited stream is {'.tdcc' if color_out else '.tdc'}; "
            f"write it to a matching destination (or .jpg), got {args.dst!r}"
        )
    crop = tuple(args.crop) if args.crop is not None else None
    out = edit_stream(data, ops, crop=crop, codec=stage,
                      grayscale=args.grayscale)
    if _is_jpg(args.dst):
        jpegcoef.export_jpeg(out, args.dst, optimize=args.optimize,
                             progressive=args.progressive,
                             arithmetic=args.arithmetic)
        nbytes = os.path.getsize(args.dst)
    else:
        with open(args.dst, "wb") as f:
            f.write(out)
        nbytes = len(out)
    print(json.dumps({
        "src": args.src, "dst": args.dst, "ops": ops,
        "crop": list(crop) if crop else None,
        "grayscale": bool(args.grayscale), "entropy": args.entropy,
        "bytes": nbytes, "src_bytes": src_bytes,
    }))
    return 0


def cmd_compare(args) -> int:
    """Tolerance comparison of two images — the user-facing activation of
    the reference's DEAD arrays_are_close comparator (utils.cu:27-35,
    declared but never invoked; here it also reports the full metric
    suite).  Color images compare in their native channels (the diff and
    mse/psnr/peen run on all channels; ssim on BT.601 luma).  Exit code 0
    when max|a-b| <= --tol, 1 when not close, 2 on shape mismatch.

    Two .tdc/.tdcc inputs compare at the COEFFICIENT level instead
    (differing-entry count, max delta, and whether the diff fits the
    documented ±1-on-≤0.5% tie class) — the tool for checking chip-vs-CPU
    encodes or entropy-restaged archives without decoding."""
    from tpudct.utils import imageio, metrics

    def _is_tdc(path):
        return str(path).lower().endswith((".tdc", ".tdcc"))

    if _is_tdc(args.a) and _is_tdc(args.b):
        from tpudct.utils import serialize

        def _planes(path):
            data = open(path, "rb").read()
            if serialize.is_color_stream(data):
                pl, _meta = serialize.bytes_to_color(data)
                return {k: np.asarray(v, np.float64) for k, v in pl.items()}
            c, _qs, _k = serialize.bytes_to_coefficients(data)
            return {"y": np.asarray(c, np.float64)}

        pa, pb = _planes(args.a), _planes(args.b)
        if sorted(pa) != sorted(pb) or any(
            pa[k].shape != pb[k].shape for k in pa
        ):
            print(json.dumps({
                "error": "shape_mismatch",
                "a": {k: list(v.shape) for k, v in pa.items()},
                "b": {k: list(v.shape) for k, v in pb.items()},
            }))
            return 2
        total = sum(v.size for v in pa.values())
        diff = {k: np.abs(pa[k] - pb[k]) for k in pa}
        ndiff = int(sum((d > 0).sum() for d in diff.values()))
        maxd = float(max(d.max() for d in diff.values()))
        rep = {
            "coefficients": True,
            "planes": sorted(pa),
            "total": total,
            "differing": ndiff,
            "differing_pct": round(100.0 * ndiff / total, 4),
            "max_abs_diff": maxd,
            "tol": args.tol,
            # the cross-strategy equivalence class (tests/test_pipelines.py)
            "within_tie_class": bool(maxd <= 1.0 and ndiff <= total * 0.005),
        }
        print(json.dumps(rep))
        return 0 if maxd <= args.tol else 1

    a = imageio.load_image(args.a, force_gray=False).astype(np.float64)
    b = imageio.load_image(args.b, force_gray=False).astype(np.float64)
    if a.shape != b.shape:
        # JSON on stdout + a distinct exit code so scripted callers can
        # tell "wrong dimensions" from "pixels differ".
        print(json.dumps({
            "error": "shape_mismatch", "shape_a": list(a.shape),
            "shape_b": list(b.shape),
        }))
        return 2

    def _luma(x):
        if x.ndim == 2:
            return x
        return 0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]

    maxdiff = float(np.abs(a - b).max())
    rep = {
        "mse": float(metrics.mse(a, b)),
        "psnr_db": float(metrics.psnr(a, b)),
        "peen_pct": float(metrics.peen(a, b)),
        "ssim": float(metrics.ssim(_luma(a), _luma(b))),
    }
    close = maxdiff <= args.tol
    print(json.dumps({
        "shape": list(a.shape), "max_abs_diff": maxdiff, "tol": args.tol,
        "close": close, **rep,
    }))
    return 0 if close else 1


def cmd_info(_args) -> int:
    import jax

    import tpudct
    from tpudct.utils.entropy import native_entropy_available, rans_available
    from tpudct.utils.imageio import native_backend_available

    from tpudct.constants import Q_TABLES, TRANSFORM_ALIASES, TRANSFORMS

    print(json.dumps({
        "version": tpudct.__version__,
        "backend": jax.default_backend(),
        "devices": [str(d) for d in jax.devices()],
        "native_jpeg": native_backend_available(),
        "native_entropy": native_entropy_available(),
        "native_rans": rans_available(),
        "pipelines": tpudct.available_pipelines(),
        "transforms": sorted(TRANSFORMS),
        "transform_aliases": dict(TRANSFORM_ALIASES),
        "q_tables": sorted(Q_TABLES),
    }))
    return 0


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="tpudct", description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = ap.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("run", help="encode+decode one image (the reference driver flow)")
    _add_codec_flags(sp)
    sp.add_argument("input")
    sp.add_argument("output")
    sp.add_argument("--quality", type=int, default=100, help="output JPEG quality (ref: 100)")
    sp.add_argument("--coeffs", default=None, help="also write the .tdc coefficient file")
    sp.add_argument("--corners", action="store_true",
                    help="reference-driver verbosity: 4 stage corners + per-phase ms (staged, not fused)")
    _add_color_flags(sp)
    sp.set_defaults(fn=cmd_run)

    sp = sub.add_parser("encode", help="image -> .tdc (gray) / .tdcc (color) coefficient file")
    _add_codec_flags(sp)
    sp.add_argument("input")
    sp.add_argument("output")
    sp.add_argument("--band-rows", type=int, default=None, dest="band_rows",
                    help="stream the encode in host bands of N rows (bounded device memory, banded container); beyond-2^32-pixel images auto-band at 8192 rows")
    _add_color_flags(sp)
    sp.set_defaults(fn=cmd_encode)

    sp = sub.add_parser("decode", help=".tdc/.tdcc coefficient file (or .jpg: lossless coefficient import, the djpeg drop-in) -> image")
    sp.add_argument("--pipeline", default="hp")
    sp.add_argument("--quality", type=int, default=100)
    sp.add_argument("--planes", type=int, default=None,
                    help="progressive decode: use only the first N zig-zag spectral planes (1-64; spectral/xz streams, gray and color)")
    sp.add_argument("--preview", action="store_true",
                    help="1/8-scale DC-only thumbnail (no transform, no device; works on truncated downloads)")
    sp.add_argument("--rows", default=None,
                    help="region decode: only image rows A:B (blocks are independent, so only covering block rows transform)")
    sp.add_argument("--scale", default=None, metavar="M/8",
                    help="fractional-scale decode (djpeg -scale): reconstruct straight to ceil(H*M/8) x ceil(W*M/8) for M in 1..16 (aliases 1/2, 1/4, 1/8, 3/4, 3/2, 2/1 accepted) — the exact area-resample of the full decode, never materializing the full image (gray and color; subsampled-chroma color caps at M<=8)")
    sp.add_argument("--grayscale", action="store_true",
                    help="decode a color stream luma-only (djpeg -grayscale): the chroma planes never decode; composes with --scale, --rows, --planes and --preview")
    sp.add_argument("--band-rows", type=int, default=None, dest="band_rows",
                    help="stream the decode in device bands of N rows (bounded device memory; banded streams also bound the decoded-map residency); beyond-2^32-pixel maps auto-band at 8192 rows; composes with --scale/--planes/--rows/--grayscale (round 5); --preview is inherently segment-bounded, so the flag is accepted but has no further effect there")
    sp.add_argument("input")
    sp.add_argument("output")
    sp.set_defaults(fn=cmd_decode)

    sp = sub.add_parser("bench", help="one-size benchmark (the benchmark_* driver flow)")
    _add_codec_flags(sp)
    sp.add_argument("--size", type=int, default=1024)
    sp.add_argument("--reps", type=int, default=5)
    sp.add_argument("--pipelines", default="hp")
    sp.add_argument("--fused", action="store_true", help="also time the single-kernel roundtrip")
    sp.add_argument("--batch", type=int, default=0, help="also time serving throughput for a batch of N images")
    sp.add_argument("--cpu", action="store_true", help="also time the host-CPU numpy baseline (reference CPU column analog)")
    sp.add_argument("--color", action="store_true", help="also time the full RGB color codec pass")
    sp.add_argument("--chroma", choices=("420", "422", "444"), default=None,
                    help="with --color: chroma mode for the color bench (default 420)")
    sp.add_argument("--host-entropy", action="store_true", dest="host_entropy",
                    help="benchmark the host entropy stage instead (every .tdc codec's encode/decode on this size; no device work)")
    sp.add_argument("--e2e", action="store_true",
                    help="end-to-end wall-time decomposition instead: load -> device -> entropy -> write for one --size image (+ the bulk batch flow when --batch N is given)")
    sp.add_argument("--image", default="photo", choices=("photo", "circuit", "noise"),
                    help="test-image statistics for --host-entropy (default photo)")
    sp.set_defaults(fn=cmd_bench)

    sp = sub.add_parser("sweep", help="size x pipeline benchmark table (README.md:45-60)")
    _add_codec_flags(sp)
    sp.add_argument("--sizes", default="256,512,1024,2048,4096,8192")
    sp.add_argument("--pipelines", default="batched,fast,hp")
    sp.add_argument("--reps", type=int, default=5)
    sp.set_defaults(fn=cmd_sweep)

    sp = sub.add_parser("table", help="PEEN/MSE/compression k-sweep (README.md:62-69)")
    _add_codec_flags(sp)
    sp.add_argument("input", nargs="?", default=None,
                    help="JPEG input; default: built-in generated image (see --image)")
    sp.add_argument("--image", choices=("circuit", "photo"), default="circuit",
                    help="built-in generator when no input is given: circuit-board content analog | photographic-statistics analog")
    _add_color_flags(sp)
    sp.set_defaults(fn=cmd_table)

    sp = sub.add_parser("batch", help="bulk encode a directory to .tdc/.tdcc, resumable via manifest")
    _add_codec_flags(sp)
    _add_color_flags(sp)
    sp.add_argument("input_dir")
    sp.add_argument("output_dir")
    sp.add_argument("--decode-threads", type=int, default=8,
                    help="native JPEG decode pool size (0 = one per CPU)")
    sp.add_argument("--transcode", action="store_true",
                    help="lossless archival mode: coefficient-level import of every .jpg (no IDCT, bit-exact recoverable via `unbatch --transcode`, typically smaller than the source)")
    sp.set_defaults(fn=cmd_batch)

    sp = sub.add_parser("curve", help="rate-distortion sweep: .tdc vs libjpeg bytes+PSNR per quality")
    _add_codec_flags(sp)
    sp.add_argument("input", nargs="?", default=None,
                    help="JPEG input; default: built-in generated image (see --image)")
    sp.add_argument("--image", choices=("circuit", "photo"), default="photo")
    sp.add_argument("--qualities", default="10,20,30,40,50,60,70,80,90,95")
    # --color: sweep the color codec vs libjpeg COLOR at equal RGB PSNR
    # (round 5, VERDICT r4 #4a); --chroma/--no-subsample pick the mode
    _add_color_flags(sp)
    sp.set_defaults(fn=cmd_curve)

    sp = sub.add_parser("unbatch", help="bulk decode a directory of .tdc/.tdcc back to images, resumable")
    sp.add_argument("--pipeline", default="hp")
    sp.add_argument("--quality", type=int, default=100)
    sp.add_argument("--ext", default=".jpg",
                    help="output extension: .jpg (default, quality applies) or a lossless format like .png")
    sp.add_argument("--scale", default=None, metavar="M/8",
                    help="bulk thumbnailer: decode every stream at M/8 scale (M in 1..16; integer 8/M rides the fused scaled kernel — see decode --scale)")
    sp.add_argument("--transcode", action="store_true",
                    help="lossless export: entropy-encode transform=dct streams straight back to .jpg (inverse of `batch --transcode`)")
    sp.add_argument("--optimize", action="store_true",
                    help="with --transcode: two-pass optimal Huffman tables (jpegtran -optimize)")
    sp.add_argument("--progressive", action="store_true",
                    help="with --transcode: progressive scan script (jpegtran -progressive; implies --optimize)")
    sp.add_argument("--arithmetic", action="store_true",
                    help="with --transcode: T.81 arithmetic entropy coding (jpegtran -arithmetic; smaller, less widely decodable)")
    sp.add_argument("input_dir")
    sp.add_argument("output_dir")
    sp.set_defaults(fn=cmd_unbatch)

    sp = sub.add_parser("scale", help="scaling-efficiency table across device counts")
    _add_codec_flags(sp)
    sp.add_argument("--size", type=int, default=2048)
    sp.add_argument("--devices", default=None, help="comma list, default powers of 2 up to available")
    sp.add_argument("--reps", type=int, default=3)
    sp.add_argument("--k-pair", default=None, dest="k_pair",
                    help="pin the slope-timing chain lengths, e.g. 8,72 (2 compiles per count instead of the adaptive search's 5+; use on the real chip)")
    sp.set_defaults(fn=cmd_scale)

    sp = sub.add_parser("profile", help="capture a per-kernel device trace (TensorBoard/Perfetto)")
    _add_codec_flags(sp)
    sp.add_argument("--size", type=int, default=2048)
    sp.add_argument("--reps", type=int, default=3)
    sp.add_argument("--out", default="/tmp/tpudct-trace", help="trace output directory")
    sp.set_defaults(fn=cmd_profile)

    sp = sub.add_parser("selftest", help="on-device correctness gate vs the f64 golden (what bench.py runs before timing; reference config)")
    sp.add_argument("--pipeline", default="hp")
    sp.add_argument("--size", type=int, default=512)
    sp.add_argument("--families", action="store_true",
                    help="also sweep one tiny case per kernel family "
                         "(color 4:2:0 u8, f32, scaled decode, jpg import)")
    sp.set_defaults(fn=cmd_selftest)

    sp = sub.add_parser("inspect", help="header-only report on .tdc/.tdcc files (codec, geometry, entropy stage, payload bytes; no decode)")
    sp.add_argument("files", nargs="+")
    sp.set_defaults(fn=cmd_inspect)

    sp = sub.add_parser("transcode", help="lossless coefficient-domain jpg <-> .tdc/.tdcc (no IDCT/FDCT; direction by extensions); tdc -> tdc re-codes the entropy stage in place")
    sp.add_argument("src")
    sp.add_argument("dst")
    sp.add_argument("--entropy", default="auto", type=_entropy_spec,
                    help=".tdc entropy stage for jpg->tdc imports and tdc->tdc restages; banded[::inner] on a banded source restages one segment at a time (bounded memory)")
    sp.add_argument("--optimize", action="store_true",
                    help="with a .jpg destination: two-pass optimal Huffman tables (jpegtran -optimize)")
    sp.add_argument("--progressive", action="store_true",
                    help="with a .jpg destination: progressive scan script (jpegtran -progressive; implies --optimize)")
    sp.add_argument("--arithmetic", action="store_true",
                    help="with a .jpg destination: T.81 arithmetic entropy coding (jpegtran -arithmetic; smaller, less widely decodable)")
    sp.set_defaults(fn=cmd_transcode)

    sp = sub.add_parser("edit", help="lossless coefficient-domain flip/rotate/transpose/crop/grayscale on .tdc/.tdcc — or directly jpg->jpg (a jpegtran replacement)")
    sp.add_argument("src")
    sp.add_argument("dst")
    sp.add_argument("--op", action="append",
                    choices=("hflip", "vflip", "rot90", "rot180", "rot270", "transpose"),
                    help="geometric op; repeatable, applied left-to-right (rot90 is clockwise)")
    sp.add_argument("--crop", nargs=4, type=int, metavar=("Y0", "X0", "H", "W"),
                    help="block-aligned lossless crop, applied before ops")
    sp.add_argument("--grayscale", action="store_true",
                    help="drop the chroma planes (jpegtran -grayscale), before crop/ops")
    sp.add_argument("--entropy", default="auto",
                    choices=("auto", "auto-exact", "spectral", "huffman", "rans", "xz", "raw", "banded"),
                    help="entropy stage for the re-serialized output")
    sp.add_argument("--optimize", action="store_true",
                    help="with a .jpg destination: two-pass optimal Huffman tables (jpegtran -optimize)")
    sp.add_argument("--progressive", action="store_true",
                    help="with a .jpg destination: progressive scan script (jpegtran -progressive; implies --optimize)")
    sp.add_argument("--arithmetic", action="store_true",
                    help="with a .jpg destination: T.81 arithmetic entropy coding (jpegtran -arithmetic; smaller, less widely decodable)")
    sp.set_defaults(fn=cmd_edit)

    sp = sub.add_parser("compare", help="tolerance-compare two images + metric suite (the reference's dead arrays_are_close, activated); two .tdc/.tdcc inputs diff at the coefficient level")
    sp.add_argument("a")
    sp.add_argument("b")
    sp.add_argument("--tol", type=float, default=0.0, help="max |a-b| accepted as close (default 0: bit-exact)")
    sp.set_defaults(fn=cmd_compare)

    sp = sub.add_parser("info", help="environment / backend report")
    sp.set_defaults(fn=cmd_info)
    return ap


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    try:
        return args.fn(args)
    except (KeyError, ValueError, OSError) as e:
        # Clean CLI errors (the reference exits via CHECK_* macros with raw
        # prints; we keep the message, drop the traceback).
        print(f"error: {e}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    raise SystemExit(main())
