"""Bulk (batch/unbatch) dispatch A/B on the real chip: per-image launches
vs the stacked taller-image path (models/dispatch.py encode/decode
_gray_batch_auto).

The metric here is HOST WALL TIME for the whole job — the thing a bulk
CLI user experiences — not slope device time: the stacked path's entire
point is removing per-image dispatch/transfer overhead (each dispatch
through this environment's relay pays a ~24 ms RPC floor; on any host it
pays launch + transfer latency B times).  Warm-up calls exclude compile.

Run from repo root: python - <benchmarks/bulk_ab.py  (or python benchmarks/bulk_ab.py
from an env without the axon sitecustomize quirk).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from tpudct import CodecConfig, get_pipeline
from tpudct.models.dispatch import (
    decode_gray_auto,
    decode_gray_batch_auto,
    encode_gray_auto,
    encode_gray_batch_auto,
)

B, S = 64, 512
rng = np.random.default_rng(42)
imgs = [rng.integers(0, 256, (S, S), dtype=np.uint8) for _ in range(B)]
p = get_pipeline("hp")
cfg = CodecConfig()

# warm-up: compile both shapes (per-image 512x512 and the stacked chunk)
_ = encode_gray_auto(p, imgs[0], cfg)
enc = encode_gray_batch_auto(p, imgs, cfg)
items = [(c, cfg, hw) for c, hw in enc]
_ = decode_gray_auto(p, *items[0])
_ = decode_gray_batch_auto(p, items)


def wall(fn, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


# Both arms must MATERIALIZE coefficients on the host — `batch` entropy-
# codes them there, so the transfer is part of the job either way.  (A
# non-materializing per-image loop looks fast only because dispatches
# enqueue asynchronously and nothing ever waits.)
t_per = wall(lambda: [np.asarray(encode_gray_auto(p, im, cfg)[0]) for im in imgs])
t_stk = wall(lambda: encode_gray_batch_auto(p, imgs, cfg))
print(f"encode  {B}x{S}^2: per-image {t_per:.3f}s ({B/t_per:.0f} img/s)  "
      f"stacked {t_stk:.3f}s ({B/t_stk:.0f} img/s)  x{t_per/t_stk:.1f}")

d_per = wall(lambda: [decode_gray_auto(p, *it) for it in items])
d_stk = wall(lambda: decode_gray_batch_auto(p, items))
print(f"decode  {B}x{S}^2: per-image {d_per:.3f}s ({B/d_per:.0f} img/s)  "
      f"stacked {d_stk:.3f}s ({B/d_stk:.0f} img/s)  x{d_per/d_stk:.1f}")

# equality spot-check on-chip
got = encode_gray_batch_auto(p, imgs[:4], cfg)
for im, (c, hw) in zip(imgs[:4], got):
    c1, _ = encode_gray_auto(p, im, cfg)
    np.testing.assert_array_equal(np.asarray(c1), c)
print("stacked == per-image on chip: OK")
