"""Rate-aware quantization study: deadzone scaling vs the round-half-away
baseline, measured as BD-rate (round 5, VERDICT r4 #4b).

The codec quantizes with round-half-away (|x|/Q rounded at theta = 0.5,
the reference's rule — main.cu round path).  A DEADZONE quantizer rounds
AC magnitudes at theta < 0.5 instead: coefficients near a bin edge fall
toward zero, which costs distortion but saves rate (the zero bin is the
cheapest rANS symbol and extends zero runs).  Whether that trade BEATS
simply moving along the quality axis is exactly what BD-rate integrates:
each theta produces its own 10-point rate-distortion curve, and the
Bjøntegaard delta of that curve against the theta = 0.5 curve is the
honest win/loss number.  DC keeps theta = 0.5 throughout (DC is
delta-coded and dense — a deadzone there buys ~nothing and costs visible
blocking).

Also swept: ±1 TIE-BREAKING — the codec documents an exact-.5 tie
equivalence class (PARITY "Known deltas"); breaking every tie toward
zero is the theta -> 0.5⁻ limit and bounds what tie freedom alone can
give (ties are ~0.5% of entries, so the ceiling is tiny by counting
alone).

Model: float64 golden codec (tests/golden.py math) + the real rANS
entropy stage for byte counts — adoption into the fused kernels is only
worth doing if this upper-bound study clears the VERDICT bar (<= -5%
photo BD-rate at the default transform).

Run: python benchmarks/deadzone_study.py  (host-only, no TPU)
"""

import json

import numpy as np

from tests.golden import (
    blockify_np, deblockify_np, round_half_away_np,
)
from tpudct.constants import Q, get_transform
from tpudct.ops.quant import q_scale_for_quality


def quantize_deadzone(img, t, q8, theta: float):
    """Blockwise forward transform + deadzone quantization:
    sign(y) * floor(|y|/Q + theta) for AC, round-half-away for DC.
    theta = 0.5 reproduces the codec's quantizer exactly."""
    h, w = img.shape
    xb = blockify_np(img.astype(np.float64)) - 128.0
    yb = np.einsum("ij,bjk,lk->bil", t, xb, t)
    scaled = yb / q8
    c = np.sign(scaled) * np.floor(np.abs(scaled) + theta)
    c[:, 0, 0] = round_half_away_np(scaled[:, 0, 0])
    return deblockify_np(c, h, w)


def quantize_tiebreak_to_zero(img, t, q8):
    """Round-half-away EXCEPT exact .5 ties, which break toward zero —
    the boundary case of the documented ±1 tie class."""
    h, w = img.shape
    xb = blockify_np(img.astype(np.float64)) - 128.0
    yb = np.einsum("ij,bjk,lk->bil", t, xb, t)
    scaled = yb / q8
    mag = np.abs(scaled)
    tie = (mag + 0.5) == np.floor(mag + 0.5)  # |x|/Q is an exact k+0.5
    c = np.sign(scaled) * np.where(tie, np.floor(mag), np.floor(mag + 0.5))
    c[:, 0, 0] = round_half_away_np(scaled[:, 0, 0])
    return deblockify_np(c, h, w), int(tie[:, 1:, :].sum() + tie[:, 0, 1:].sum())


def decode(cmap, t, q8):
    h, w = cmap.shape
    yb = blockify_np(cmap.astype(np.float64)) * q8
    xb = np.einsum("ji,bjk,kl->bil", t, yb, t) + 128.0
    return np.clip(np.trunc(deblockify_np(xb, h, w)), 0, 255)


def curve(img, transform: str, quantizer, qualities):
    from tpudct.utils.entropy import rans_encode

    t = get_transform(transform).t.astype(np.float64)
    rows = []
    for q in qualities:
        q8 = Q.astype(np.float64) * q_scale_for_quality(q)
        c = quantizer(img, t, q8)
        rec = decode(c, t, q8)
        mse = float(((rec - img) ** 2).mean())
        nbytes = len(rans_encode(np.ascontiguousarray(c, np.int16)))
        rows.append((nbytes, 10 * np.log10(255.0**2 / max(mse, 1e-9))))
    return rows


def main() -> None:
    from tpudct.benchmark import bd_rate_pct, photographic_image, structured_image

    qualities = (10, 20, 30, 40, 50, 60, 70, 80, 90, 95)
    for name, img in (("photo", photographic_image()),
                      ("circuit", structured_image())):
        img = np.asarray(img, np.float64)
        base = curve(img, "haweel",
                     lambda i, t, q8: quantize_deadzone(i, t, q8, 0.5),
                     qualities)
        for theta in (0.45, 0.40, 0.35, 0.30):
            rows = curve(
                img, "haweel",
                lambda i, t, q8, th=theta: quantize_deadzone(i, t, q8, th),
                qualities,
            )
            print(json.dumps({
                "image": name, "variant": f"deadzone theta={theta}",
                "bd_rate_pct_vs_round_half_away": round(
                    bd_rate_pct(base, rows), 2
                ),
            }))
        # tie-break-to-zero: the ±1 tie freedom spent on rate
        from tpudct.utils.entropy import rans_encode

        t = get_transform("haweel").t.astype(np.float64)
        tie_rows, tie_counts = [], []
        for q in qualities:
            q8 = Q.astype(np.float64) * q_scale_for_quality(q)
            c, nties = quantize_tiebreak_to_zero(img, t, q8)
            rec = decode(c, t, q8)
            mse = float(((rec - img) ** 2).mean())
            tie_rows.append((
                len(rans_encode(np.ascontiguousarray(c, np.int16))),
                10 * np.log10(255.0**2 / max(mse, 1e-9)),
            ))
            tie_counts.append(nties)
        print(json.dumps({
            "image": name, "variant": "tie-break-to-zero",
            "bd_rate_pct_vs_round_half_away": round(
                bd_rate_pct(base, tie_rows), 2
            ),
            "ac_ties_per_quality": tie_counts,
            "coeffs": int(img.size),
        }))


if __name__ == "__main__":
    main()
