"""Forward (encode_u8) decomposition + variants at 8192^2.

Round-A found decode_u8 at its overlapped MXU floor (0.29 ms) but
encode_u8 at 0.48 ms vs a ~0.25 ms component floor — the forward is where
the headline's headroom lives.  Isolate: sublane dot / lane dots + round /
level-shift cast chain.

Run from repo root:  python benchmarks/enc_variants.py [which] [size]
  which: a = E1,E2  b = E3,E4  c = geometry
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
KP = (8, 72)


def _shift_i8(x_ref):
    """u8 pixels -> level-shifted i8 via the bias flip: (x ^ 0x80) as i8
    == x - 128 for u8 x (two's complement), one op instead of the
    i32 round-trip."""
    return (x_ref[:] ^ jnp.uint8(0x80)).astype(jnp.int8)


def _k_enc_nosub(x_ref, a_ref, b_ref, s_ref, o_ref):
    """E2: lane dots + round only — sublane contraction REPLACED by a cheap
    elementwise widen (wrong math, right shapes/dtypes: isolates its cost)."""
    x = (x_ref[:].astype(jnp.int32) - 128).astype(jnp.int8)
    u = x.astype(jnp.int32) * 12  # stand-in for dot(bdts, x): same range
    u1 = jax.lax.shift_right_arithmetic(u + 64, 7)
    u0 = u - jax.lax.shift_left(u1, 7)
    u1_8, u0_8 = u1.astype(jnp.int8), u0.astype(jnp.int8)
    bt = b_ref[:].T
    tc = x.shape[1]
    cols = []
    for t in range(tc // LANE):
        sl = slice(t * LANE, (t + 1) * LANE)
        core = (
            jax.lax.dot(u1_8[:, sl], bt, preferred_element_type=jnp.int32) * 128
            + jax.lax.dot(u0_8[:, sl], bt, preferred_element_type=jnp.int32)
        )
        cols.append(hp._round_away(core.astype(jnp.float32) * s_ref[:]).astype(jnp.int8))
    o_ref[:] = jnp.concatenate(cols, axis=1)


def _k_enc_nolane(x_ref, a_ref, b_ref, s_ref, o_ref):
    """E3: sublane dot only — lane dots + digit split REPLACED by a cheap
    narrowing (wrong math: isolates lane-chunk cost)."""
    x = (x_ref[:].astype(jnp.int32) - 128).astype(jnp.int8)
    u = jax.lax.dot(a_ref[:], x, preferred_element_type=jnp.int32)
    tc = x.shape[1]
    cols = []
    for t in range(tc // LANE):
        sl = slice(t * LANE, (t + 1) * LANE)
        cols.append(
            hp._round_away(u[:, sl].astype(jnp.float32) * s_ref[:]).astype(jnp.int8)
        )
    o_ref[:] = jnp.concatenate(cols, axis=1)


def _k_enc_xor(x_ref, a_ref, b_ref, s_ref, o_ref):
    """E4: full encode with the 1-op bias-flip level shift."""
    x = _shift_i8(x_ref)
    o_ref[:] = hp._fwd_tile_int(x, a_ref[:], b_ref[:], s_ref[:]).astype(jnp.int8)


def _mk(kern, br=256, tc=2048):
    @functools.partial(jax.jit, static_argnames=())
    def run(x):
        h, w = x.shape
        consts = hp._consts_int(br, 1.0, None)
        return hp._call(kern, h, w, br, tc, consts, [jnp.int8], False)(x, *consts)

    return run


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "a"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    assert jax.default_backend() == "tpu"
    x = jnp.asarray(synthetic_image(size).astype(np.uint8))

    if which == "a":
        f = _mk(_k_enc_nosub)
        ms = device_time_ms(lambda v: f(v).astype(jnp.uint8), x, k_pair=KP, reps=2)
        print(f"E2 no-sublane (lane only): {ms:7.4f} ms", flush=True)
    elif which == "b":
        f = _mk(_k_enc_nolane)
        ms = device_time_ms(lambda v: f(v).astype(jnp.uint8), x, k_pair=KP, reps=2)
        print(f"E3 sublane only          : {ms:7.4f} ms", flush=True)
        f = _mk(_k_enc_xor)
        # correctness: bias flip must equal the shipped encode exactly
        a = np.asarray(f(x[:512, :2048]))
        b = np.asarray(hp.hp_encode_u8(x[:512, :2048]))
        np.testing.assert_array_equal(a, b)
        print("E4 xor-shift correctness OK", flush=True)
        ms = device_time_ms(lambda v: f(v).astype(jnp.uint8), x, k_pair=KP, reps=2)
        print(f"E4 encode xor-shift      : {ms:7.4f} ms", flush=True)
    elif which == "c":
        for br, tc in ((128, 4096), (128, 8192), (64, 8192), (32, 8192)):
            ms = device_time_ms(
                lambda v, br=br, tc=tc: hp.hp_encode_u8(
                    v, band_rows=br, tile_cols=tc
                ).astype(jnp.uint8),
                x, k_pair=KP, reps=2)
            print(f"E5 encode ({br:4d},{tc:5d})  : {ms:7.4f} ms", flush=True)


if __name__ == "__main__":
    main()
