"""Partial decode of a multi-gigapixel banded archive, on chip, with
measured per-phase host residency (round 5 — the demo behind VERDICT r4
#1's "the operations archives exist for").

A 65536x65536 grayscale image (4.3 Gpix; raster 4.3 GB, coefficient map
8.6 GB int16 — 28x the chip's HBM would hold as f32 intermediates, and
far beyond what the round-4 archival layout could partially decode at
all) is streamed-encoded on the real chip into a banded .tdc, then the
archive is:

  - THUMBNAILED  (preview: DC-only, one segment resident at a time),
  - ROI-DECODED  (rows around 32000: segments outside the range are
                  never entropy-decoded — one of 32),
  - SCALE-DECODED (1/8: the fused scaled kernel band by band into an
                  8192^2 raster).

Each phase runs in its OWN process so `ru_maxrss` is a clean residency
bound; the assertions tie the ROI pixels and the scaled rows to an
independent in-memory encode+decode of the covering band (bands are
independent, so the slab comparison is exact).

Run phases from the repo root (TPU required for gen/enc/roi/scale):
    python - <<'EOF'
    import runpy, sys; sys.argv = ['partial_at_scale.py', '<phase>']
    runpy.run_path('benchmarks/partial_at_scale.py', run_name='__main__')
    EOF
with <phase> in gen | enc | preview | roi | scale (grayscale 4.3 Gpix)
or genc | encc | previewc | roic (the 1-Gpix RGB .tdcc twin).  Measured results
live in RESULTS_v5e.md ("Partial decode at archive scale").
"""

import json
import resource
import sys
import time

import numpy as np

SIZE = 65536
BAND = 2048
PIX = "/tmp/pas_pixels.u8"
TDC = "/tmp/pas_big.tdc"
SIZE_C = 32768  # the color twin: 1 Gpix RGB = 3.2 GB of pixels
RGB = "/tmp/pas_rgb.u8"
TDCC = "/tmp/pas_big.tdcc"


def band_pixels(b: int) -> np.ndarray:
    """Deterministic compressible content for band b: low-frequency
    structure + mild noise (so the archive is a realistic size, not an
    incompressible noise dump)."""
    rng = np.random.default_rng(1000 + b)
    r = (np.arange(b * BAND, (b + 1) * BAND, dtype=np.float32) / 97.0)[:, None]
    c = (np.arange(SIZE, dtype=np.float32) / 113.0)[None, :]
    base = 96.0 + 52.0 * np.sin(r) * np.cos(c) + 28.0 * np.sin(0.31 * r + 0.17 * c)
    return np.clip(
        base + rng.normal(0.0, 6.0, (BAND, SIZE)).astype(np.float32), 0, 255
    ).astype(np.uint8)


def band_rgb(b: int) -> np.ndarray:
    """Deterministic RGB content for color band b (rows of the SIZE_C
    image): channel-shifted variants of the gray generator."""
    rng = np.random.default_rng(5000 + b)
    r = (np.arange(b * BAND, (b + 1) * BAND, dtype=np.float32) / 89.0)[:, None]
    c = (np.arange(SIZE_C, dtype=np.float32) / 101.0)[None, :]
    g = 96.0 + 50.0 * np.sin(r) * np.cos(c)
    out = np.empty((BAND, SIZE_C, 3), np.uint8)
    for ch, phase_ in enumerate((0.0, 0.7, 1.9)):
        out[..., ch] = np.clip(
            g + 24.0 * np.sin(0.29 * r + 0.13 * c + phase_)
            + rng.normal(0.0, 5.0, (BAND, SIZE_C)).astype(np.float32),
            0, 255,
        ).astype(np.uint8)
    return out


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main() -> None:
    phase = sys.argv[1]
    t0 = time.perf_counter()
    if phase == "gen":
        mm = np.lib.format.open_memmap(
            PIX, mode="w+", dtype=np.uint8, shape=(SIZE, SIZE)
        )
        for b in range(SIZE // BAND):
            mm[b * BAND : (b + 1) * BAND] = band_pixels(b)
        mm.flush()
        print(json.dumps({"phase": "gen", "s": round(time.perf_counter() - t0, 1)}))
        return

    from tpudct.config import CodecConfig
    from tpudct.models import get_pipeline

    p = get_pipeline("hp")
    cfg = CodecConfig()

    if phase == "enc":
        from tpudct.utils.streaming import encode_gray_streamed_bytes

        img = np.load(PIX, mmap_mode="r")
        data, _ = encode_gray_streamed_bytes(p, img, cfg, band_rows=BAND)
        open(TDC, "wb").write(data)
        print(json.dumps({
            "phase": "enc", "s": round(time.perf_counter() - t0, 1),
            "bytes": len(data), "factor": round(SIZE * SIZE / len(data), 2),
            "maxrss_mb": round(rss_mb()),
        }))
        return

    # ---- color twin: a 1-Gpix RGB banded .tdcc (3.2 GB of pixels) ------
    if phase == "genc":
        mm = np.lib.format.open_memmap(
            RGB, mode="w+", dtype=np.uint8, shape=(SIZE_C, SIZE_C, 3)
        )
        for bnd in range(SIZE_C // BAND):
            mm[bnd * BAND : (bnd + 1) * BAND] = band_rgb(bnd)
        mm.flush()
        print(json.dumps({"phase": "genc", "s": round(time.perf_counter() - t0, 1)}))
        return
    if phase == "encc":
        from tpudct.utils.streaming import encode_color_streamed_bytes

        img = np.load(RGB, mmap_mode="r")
        cdata, _ = encode_color_streamed_bytes(p, img, cfg, band_rows=BAND)
        open(TDCC, "wb").write(cdata)
        print(json.dumps({
            "phase": "encc", "s": round(time.perf_counter() - t0, 1),
            "bytes": len(cdata),
            "factor": round(3 * SIZE_C * SIZE_C / len(cdata), 2),
            "maxrss_mb": round(rss_mb()),
        }))
        return
    cdata = open(TDCC, "rb").read()
    if phase == "previewc":
        from tpudct.utils.serialize import preview_color_from_bytes

        pv = preview_color_from_bytes(cdata)
        print(json.dumps({
            "phase": "previewc", "s": round(time.perf_counter() - t0, 1),
            "shape": list(pv.shape), "maxrss_mb": round(rss_mb()),
        }))
        return
    if phase == "roic":
        from tpudct.models.color import decode_color, encode_color_u8
        from tpudct.utils.streaming import decode_color_streamed

        a, b = 16000, 16100
        rec = decode_color_streamed(p, cdata, band_rows=BAND, row_range=(a, b))
        t_roi = time.perf_counter() - t0
        # truth: in-memory encode + F32 decode of the covering band (the
        # streamed ROI pins decode_color for parity with the CLI's
        # in-memory --rows path — NOT the int8 decode, whose output sits
        # in the documented ±1 tie class); bands are independent and the
        # slice is 16-aligned, so the rows agree exactly
        bb = a // BAND
        import jax.numpy as jnp

        planes, meta = encode_color_u8(p, jnp.asarray(band_rgb(bb)), cfg)
        ref = np.asarray(decode_color(p, planes, meta, cfg))
        assert (rec == ref[a - bb * BAND : b - bb * BAND]).all(), "color ROI mismatch"
        print(json.dumps({
            "phase": "roic", "s": round(t_roi, 1), "rows": [a, b],
            "bit_identical_vs_in_memory_band": True,
            "maxrss_mb": round(rss_mb()),
        }))
        return


    data = open(TDC, "rb").read()
    if phase == "preview":
        from tpudct.utils.serialize import preview_from_bytes

        pv = preview_from_bytes(data)
        print(json.dumps({
            "phase": "preview", "s": round(time.perf_counter() - t0, 1),
            "shape": list(pv.shape), "mean": round(float(pv.mean()), 2),
            "maxrss_mb": round(rss_mb()),
        }))
        return

    if phase == "roi":
        from tpudct.models.dispatch import decode_gray_auto, encode_gray_auto
        from tpudct.utils import serialize as ser
        from tpudct.utils.streaming import decode_gray_streamed

        a, b = 32000, 32100
        rec = decode_gray_streamed(p, data, band_rows=BAND, row_range=(a, b))
        t_roi = time.perf_counter() - t0
        # independent truth: re-encode the covering band's pixels
        # in-memory (bands are independent) and decode the same rows
        bb = a // BAND
        px = band_pixels(bb)
        c_mem, _ = encode_gray_auto(p, px, cfg)
        a8 = a % BAND - (a % BAND) % 8
        b8 = -(-(b - bb * BAND) // 8) * 8
        ref = decode_gray_auto(
            p, np.asarray(c_mem)[a8:b8], cfg, (b8 - a8, SIZE)
        )[a % BAND - a8 : b - bb * BAND - a8]
        assert (rec == ref).all(), "ROI mismatch vs in-memory band"
        # the segment slab itself must equal the in-memory encode
        hdr = ser._parse_plane_header(data)
        raw = data[hdr[10] : hdr[10] + hdr[9]]
        segs = list(ser.iter_banded_segments(
            raw, SIZE, SIZE, row_range=(bb * BAND, (bb + 1) * BAND)
        ))
        assert len(segs) == 1 and (segs[0][2] == np.asarray(c_mem, np.int16)).all()
        print(json.dumps({
            "phase": "roi", "s": round(t_roi, 1), "rows": [a, b],
            "segments_decoded": 1, "of": SIZE // BAND,
            "bit_identical_vs_in_memory_band": True,
            "maxrss_mb": round(rss_mb()),
        }))
        return

    if phase == "scale":
        from tpudct.models.dispatch import decode_gray_scaled_auto, encode_gray_auto
        from tpudct.utils.streaming import decode_gray_streamed

        m = 1  # 1/8 scale -> 8192^2
        rec = decode_gray_streamed(p, data, band_rows=BAND, scale_m=m)
        t_sc = time.perf_counter() - t0
        # spot-validate one band's scaled rows against the in-memory
        # scaled decode of that band's slab (same big-offset indexing
        # the streamed path must get right)
        bb = 15
        px = band_pixels(bb)
        c_mem, _ = encode_gray_auto(p, px, cfg)
        ref = decode_gray_scaled_auto(p, np.asarray(c_mem), cfg, (BAND, SIZE), m)
        got = rec[bb * BAND * m // 8 : (bb + 1) * BAND * m // 8]
        assert (got == ref).all(), "scaled band mismatch vs in-memory"
        print(json.dumps({
            "phase": "scale", "s": round(t_sc, 1), "shape": list(rec.shape),
            "band15_bit_identical": True, "maxrss_mb": round(rss_mb()),
        }))
        return

    raise SystemExit(f"unknown phase {phase!r}")


if __name__ == "__main__":
    main()
