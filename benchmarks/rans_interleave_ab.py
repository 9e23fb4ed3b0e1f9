"""A/B study: serial (v2/v3) vs 4-way-interleaved (v4) rANS streams.

Round-5 closure of VERDICT r4 #3 ("interleaved rANS: attack the serial
symbol chain").  The interleaved construction (public ryg_rans layout:
symbol i rides state i mod 4, reverse-order encode into one shared byte
stream, forward decode) is implemented and opt-in via
`entropy.rans_encode(..., interleave=4)` — but it is NOT the default,
because on this host it measured SLOWER to decode:

    measured 2026-08 on the 1-core Intel Xeon @2.10GHz CI host
    (median of 7, 2048^2 / 4096^2 DCT-statistics maps, 1 band):
        v4 decode: 0.72-0.80x the serial decoder (array-indexed states);
                   0.85-0.95x with rotating named-register states
        v4 encode: 0.94-1.23x (noise band; the shipped encoder keeps the
                   state array — encode is not chain-bound either way)

Why the textbook win does not appear here: the decode loop is
THROUGHPUT-bound, not state-chain-bound.  gprof + cycle accounting put
the whole decode at ~40-46 cycles/symbol while the rANS state chain
(slot lookup -> freq/start -> multiply -> renormalize) is only ~15
cycles — the rest is magnitude-bit reads, the run/EOB scan branches and
the block scatter, all of which interleaving cannot touch.  Removing the
chain therefore buys nothing, and the four-state bookkeeping (even held
in rotating named registers so register renaming eats the moves) adds
net cost.  Encode is 64-82% SYMBOLIZATION (pass A: zig-zag gather, scan,
histogram, magnitude-bit writes; pass-split instrumentation), so its
rANS pass was never the lever either.

What DID pay, shipped as the round-5 default path (no format change):
  - a windowed 64-bit magnitude-bit reader (FastBits) replacing the
    per-call multi-chunk assembly (~+11% decode),
  - macro-inlined symbolization sink (the per-symbol indirect call),
  - -O3 -march=native for the locally-built .so (+9% rans decode,
    +31% huffman encode).
  Net vs the round-4 coder: decode ~253 -> ~306 MB/s (+21%), encode
  ~111 -> ~126 MB/s (+14%) on the 2048^2 map below.

The v4 knob stays: the construction is sound, streams decode everywhere
(both C decode workers + the pure-Python fallback, fuzz-covered), and a
wide out-of-order host may invert the result — re-run this script there.

Run: python benchmarks/rans_interleave_ab.py  (host-only, no TPU)
"""

import statistics
import time

import numpy as np


def dct_statistics_map(size: int, seed: int = 0) -> np.ndarray:
    """Synthetic quantized-coefficient map with DCT-like positional decay
    (value spread shrinks with the in-block zig-zag distance) — the same
    family the fuzz driver uses to trigger the v3 context layout."""
    rng = np.random.default_rng(seed)
    c = np.zeros((size, size), np.int16)
    bi = (np.arange(size)[:, None] % 8) + (np.arange(size)[None, :] % 8)
    spread = np.maximum(1, 64 >> np.minimum(bi, 6))
    c[:] = rng.integers(-1, 2, (size, size)) * rng.integers(0, spread + 1)
    c[::8, ::8] = rng.integers(-200, 200, (size // 8, size // 8))
    return c


def _bench(fn, reps: int = 7) -> float:
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main() -> None:
    from tpudct.utils import entropy

    if not entropy.rans_available():
        raise SystemExit("native entropy codec unavailable (make -C csrc)")
    for size in (2048, 4096):
        c = dct_statistics_map(size)
        mb = c.size * 2 / 1e6
        rows = {}
        for name, il in (("serial", 0), ("interleaved-4", 4)):
            data = entropy.rans_encode(c, 1, interleave=il)
            assert (entropy.rans_decode(data, size, size) == c).all()
            te = _bench(lambda il=il: entropy.rans_encode(c, 1, interleave=il))
            td = _bench(lambda d=data: entropy.rans_decode(d, size, size))
            rows[name] = (te, td, len(data), data[0])
            print(
                f"{size}^2 {name:14s} v{data[0]}: "
                f"enc {mb / te:6.0f} MB/s  dec {mb / td:6.0f} MB/s  "
                f"{len(data)} bytes"
            )
        s, i4 = rows["serial"], rows["interleaved-4"]
        print(
            f"{size}^2 interleave vs serial: encode {s[0] / i4[0]:.2f}x, "
            f"decode {s[1] / i4[1]:.2f}x, size {i4[2] - s[2]:+d} B"
        )


if __name__ == "__main__":
    main()
