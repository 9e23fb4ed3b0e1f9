"""Experimental u8-roundtrip kernel variants (round-2 perf push).

Candidates measured against kernels/hp_pallas.hp_roundtrip_u8:
  V1: interleaved — fwd + inv per 128-lane chunk (one loop) instead of
      full-tile fwd then full-tile inv; gives Mosaic's scheduler
      independent MXU (int8 fwd dots / bf16 inv dots) and VPU (round,
      butterfly) work from the SAME loop body to overlap.
  V2: as V1 with the sublane (first) fwd contraction also chunked.

Run from repo root:  python benchmarks/u8_variants.py [size]
"""

import functools
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpudct.benchmark import synthetic_image
from tpudct.kernels import hp_pallas as hp
from tpudct.utils.timing import device_time_ms

LANE = 128


def _k_rt_u8_interleave(x_ref, a_ref, b_ref, s_ref, qdd_ref, w_ref, c_ref, r_ref):
    """Per-chunk fused fwd+inv: round/butterfly (VPU) of chunk t can overlap
    the int8/bf16 dots (MXU) of chunk t+1 in Mosaic's schedule."""
    x = (x_ref[:].astype(jnp.int32) - 128).astype(jnp.int8)
    u = jax.lax.dot(a_ref[:], x, preferred_element_type=jnp.int32)
    u1 = jax.lax.shift_right_arithmetic(u + 64, 7)
    u0 = u - jax.lax.shift_left(u1, 7)
    u1_8, u0_8 = u1.astype(jnp.int8), u0.astype(jnp.int8)
    bt = b_ref[:].T
    ts = b_ref[:].astype(jnp.bfloat16)
    tc = x.shape[1]
    for t in range(tc // LANE):
        sl = slice(t * LANE, (t + 1) * LANE)
        core = (
            jax.lax.dot(u1_8[:, sl], bt, preferred_element_type=jnp.int32) * 128
            + jax.lax.dot(u0_8[:, sl], bt, preferred_element_type=jnp.int32)
        )
        c = hp._round_away(core.astype(jnp.float32) * s_ref[:, sl])
        c_ref[:, sl] = c.astype(jnp.int8)
        m = c * qdd_ref[:]
        v = hp._bf8_sublane(m, w_ref[:])
        v1, v2, v3 = hp._split3_bf16(v)
        d = lambda z: jax.lax.dot(z, ts, preferred_element_type=jnp.float32)
        r_ref[:, sl] = hp._to_u8(d(v1) + d(v2) + d(v3) + hp.LEVEL_SHIFT)


@functools.partial(
    jax.jit, static_argnames=("q_scale", "band_rows", "tile_cols")
)
def rt_u8_v1(image_u8, q_scale: float = 1.0, band_rows: int = 256, tile_cols: int = 2048):
    h, w = image_u8.shape
    br, tc = hp._geometry(h, w, band_rows, tile_cols, row_align=32)
    bdts, bdts_l, scale = hp._consts_int(br, q_scale, None)
    qdd, _, wts = hp._consts_bf(br, q_scale)
    consts = (bdts, bdts_l, scale, qdd, wts)
    return hp._call(
        _k_rt_u8_interleave, h, w, br, tc, consts,
        [jnp.int8, jnp.uint8], False, {0: 1},
    )(image_u8, *consts)


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    assert jax.default_backend() == "tpu"
    x = jnp.asarray(synthetic_image(size).astype(np.uint8))
    KP = (8, 72)

    # correctness vs the shipped kernel first
    c0, r0 = hp.hp_roundtrip_u8(x[:1024, :1024])
    c1, r1 = rt_u8_v1(x[:1024, :1024])
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
    np.testing.assert_array_equal(np.asarray(r0), np.asarray(r1))
    print("V1 correctness vs shipped: OK", flush=True)

    ms = device_time_ms(lambda v: rt_u8_v1(v)[1], x, k_pair=KP, reps=2)
    print(f"V1 interleaved (256,2048): {ms:7.4f} ms", flush=True)
    ms = device_time_ms(lambda v: rt_u8_v1(v, band_rows=128)[1], x, k_pair=KP, reps=2)
    print(f"V1 interleaved (128,2048): {ms:7.4f} ms", flush=True)


if __name__ == "__main__":
    main()
