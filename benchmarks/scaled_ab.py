"""A/B: fused hp_scaled_decode_u8 kernel vs composed decode_u8 + box_pool_u8.

Run from repo root as  `python - < benchmarks/scaled_ab.py`  (keeps sys.path
sane through the axon sitecustomize).  Chained-slope protocol with a scalar
XOR feedback (out -> parity bit -> coeff map) so iterations stay data-
dependent; the feedback pass (~128 MB coeff-map rewrite) is identical in
both arms, and measured separately for subtraction.
"""
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import numpy as np
import jax
import jax.numpy as jnp

from tpudct import CodecConfig, get_pipeline
from tpudct.kernels import hp_pallas
from tpudct.ops.scaled import box_pool_u8
from tpudct.utils.timing import device_time_ms

H = W = 8192
K_PAIR = (8, 72)

rng = np.random.default_rng(7)
img = jnp.asarray(rng.integers(0, 256, (H, W), dtype=np.uint8))
p = get_pipeline("hp")
cfg = CodecConfig()
c = p.encode_u8(img, cfg)
c.block_until_ready()
print(f"backend={jax.default_backend()}  coeffs {c.shape} {c.dtype}", flush=True)


def feedback(out, cin):
    # a tiny slice keeps the data dependence without adding a full-raster
    # reduction the feedback-only baseline can't mirror (review finding:
    # jnp.sum(out) added an unsubtracted ~64 MiB read to both arms); the
    # pallas output / pool dots cannot be partially dead-code-eliminated
    t = (jnp.sum(out[:8, :128]).astype(jnp.int32) & 1).astype(jnp.int8)
    return cin ^ t


def fused_op(f):
    def op(cin):
        out = hp_pallas.hp_scaled_decode_u8(cin, f, f)
        return feedback(out, cin)
    return op


def composed_op(f):
    def op(cin):
        out = box_pool_u8(p.decode_u8(cin, cfg), f, f)
        return feedback(out, cin)
    return op


def feedback_only(cin):
    # the chain plumbing alone: a tiny slice reduction + the XOR rewrite
    t = (jnp.sum(cin[:8, :128].astype(jnp.int32)) & 1).astype(jnp.int8)
    return cin ^ t


fb = device_time_ms(feedback_only, c, k_pair=K_PAIR)
print(f"feedback-only: {fb:.3f} ms", flush=True)

for f in (2, 8):
    assert hp_pallas.supports_scaled_u8(H, W, f, f)
    a = np.asarray(hp_pallas.hp_scaled_decode_u8(c, f, f))
    b = np.asarray(box_pool_u8(p.decode_u8(c, cfg), f, f))
    exact = np.array_equal(a, b)
    t_f = device_time_ms(fused_op(f), c, k_pair=K_PAIR)
    t_c = device_time_ms(composed_op(f), c, k_pair=K_PAIR)
    print(
        f"f={f}: fused {t_f:.3f} ms  composed {t_c:.3f} ms  "
        f"(minus feedback: {t_f - fb:.3f} vs {t_c - fb:.3f})  "
        f"bitexact={exact}",
        flush=True,
    )
