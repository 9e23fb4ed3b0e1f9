"""Cross-validation of the chained-slope timing protocol (VERDICT r3 #7).

Every perf claim in this repo rests on utils/timing.py's two-point slope:
    t_op = (wall(K2-chain) - wall(K1-chain)) / (K2 - K1).
This script corroborates the 8192² headline with two INDEPENDENT readings
of the same chained dispatches:

  1. **Amortized large-K wall**: one jit call running a K=1024 chain,
     total wall divided by K.  No subtraction — the relay's ~24 ms RPC
     floor plus transfer amortizes to <0.03 ms/iter, i.e. the amortized
     number is an UPPER bound that should exceed the slope by about
     floor/K.  Agreement within the relay band means the slope is not
     manufacturing speed out of the subtraction.
  2. **Multi-K linear fit**: best-of walls at K in {8, 24, 72, 216, 648},
     least-squares line wall = a·K + b.  The slope `a` is the protocol's
     estimate from 5 points instead of 2; `b` estimates the per-call
     dispatch floor, which should land near the ~24 ms RPC floor plus the
     result-fetch time; R² near 1 shows per-iteration cost is constant
     (no hidden warm-up or drift the 2-point form would alias).

Run on the real chip from the repo root:  python - < benchmarks/timing_xval.py
Prints one JSON line per reading; the RESULTS appendix carries the
agreement table.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tpudct.benchmark import synthetic_image
    from tpudct.config import CodecConfig
    from tpudct.models import get_pipeline
    from tpudct.utils.timing import _best_wall, _chain, device_time_ms

    size = 8192
    cfg = CodecConfig()
    p = get_pipeline("hp")
    x = jnp.asarray(synthetic_image(size).astype("uint8"))
    op = lambda v: p.roundtrip_u8(v, cfg)[1]

    # shipped protocol: two-point slope at the pinned measurement pair
    slope_ms = device_time_ms(op, x, k_pair=(8, 72), reps=5)
    print(json.dumps({"protocol": "slope(8,72)", "ms": round(slope_ms, 4)}))

    # independent 1: amortized large-K wall (upper bound incl. floor/K)
    k_big = 1024
    wall = _best_wall(_chain(op, k_big), x, reps=3)
    amort_ms = wall / k_big * 1e3
    print(json.dumps({
        "protocol": f"amortized(K={k_big})", "ms": round(amort_ms, 4),
        "wall_s": round(wall, 3),
        "note": "includes dispatch floor / K — upper bound",
    }))

    # independent 2: multi-K linear fit
    ks = [8, 24, 72, 216, 648]
    walls = [_best_wall(_chain(op, k), x, reps=3) for k in ks]
    A = np.vstack([ks, np.ones(len(ks))]).T
    (a, b), res, *_ = np.linalg.lstsq(A, np.asarray(walls), rcond=None)
    pred = A @ np.array([a, b])
    ss_res = float(((np.asarray(walls) - pred) ** 2).sum())
    ss_tot = float(((np.asarray(walls) - np.mean(walls)) ** 2).sum())
    r2 = 1.0 - ss_res / ss_tot if ss_tot > 0 else 1.0
    print(json.dumps({
        "protocol": f"linear-fit(K={ks})", "ms": round(a * 1e3, 4),
        "intercept_ms": round(b * 1e3, 2), "r2": round(r2, 6),
        "walls_s": [round(w, 4) for w in walls],
    }))

    print(json.dumps({
        "agreement": {
            "slope_vs_fit_pct": round(100 * (a * 1e3 / slope_ms - 1), 2),
            "amortized_minus_slope_ms": round(amort_ms - slope_ms, 4),
        }
    }))


if __name__ == "__main__":
    main()
