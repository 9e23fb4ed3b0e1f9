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


def _k_enc_nibble(x_ref, a_ref, b_ref, s_ref, dc_ref, bias_ref, o_ref):
    """E6: input-side nibble split.  With p the u8 pixel, x = p - 128 =
    16*(p>>4 - 8) + (p&15 - 8) + 8: both nibble planes live in [-8, 7], so
    |Ts @ nibble| <= 96 fits int8 DIRECTLY — no i32 digit split between the
    two contractions.  The all-ones correction 8*Ts*J*Ts^T is the constant
    512 at each block's DC (Ts rows sum to (8,0,..,0)), folded in before
    rounding.  Bit-exact vs the shipped digit-split encode.

    Mosaic only legalizes BITWISE ops on i8 vectors (xori/andi; shifts and
    add/sub fail), so the planes are pure masks of the xor-shifted x:
    x = (x & 0xF0) + (x & 0x0F).  The /16 of the high plane rides an i32
    arithmetic shift AFTER its dot; the low plane (values 0..15) gives
    |Ts @ x_lo4| <= 90 on zero-sum AC rows and <= 120 on the all-ones DC
    row, recentred into i8 by subtracting the constant 64 on DC rows
    (added back by the lane dot as 512 at DC, part of bias_ref)."""
    x = _shift_i8(x_ref)
    x_hi16 = x & jnp.int8(-16)  # 0xF0 mask == 16 * floor(x/16), sign kept
    x_lo4 = (x & jnp.int8(0x0F)).astype(jnp.int8)
    a = a_ref[:]
    u_hi = jax.lax.shift_right_arithmetic(
        jax.lax.dot(a, x_hi16, preferred_element_type=jnp.int32), 4
    ).astype(jnp.int8)
    u_lo_raw = jax.lax.dot(a, x_lo4, preferred_element_type=jnp.int32)
    bt = b_ref[:].T
    tc = x.shape[1]
    cols = []
    for t in range(tc // LANE):
        sl = slice(t * LANE, (t + 1) * LANE)
        u_lo = (u_lo_raw[:, sl] - dc_ref[:]).astype(jnp.int8)
        core = (
            jax.lax.dot(u_hi[:, sl], bt, preferred_element_type=jnp.int32) * 16
            + jax.lax.dot(u_lo, bt, preferred_element_type=jnp.int32)
            + bias_ref[:]
        )
        cols.append(hp._round_away(core.astype(jnp.float32) * s_ref[:]).astype(jnp.int8))
    o_ref[:] = jnp.concatenate(cols, axis=1)


def _k_enc_truncless(x_ref, a_ref, b_ref, s_ref, o_ref):
    """E7: shipped formulation, but the round's jnp.trunc dropped — the
    f32->i8 convert already truncates toward zero, so trunc(z+copysign(.5,z))
    then cast == (z+copysign(.5,z)) cast directly; one fewer full-tile VPU
    pass per lane chunk."""
    x = _shift_i8(x_ref)
    u = jax.lax.dot(a_ref[:], x, preferred_element_type=jnp.int32)
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
        z = core.astype(jnp.float32) * s_ref[:]
        cols.append((z + jnp.copysign(jnp.float32(0.5), z)).astype(jnp.int8))
    o_ref[:] = jnp.concatenate(cols, axis=1)


def _k_enc_nibble_truncless(x_ref, a_ref, b_ref, s_ref, dc_ref, bias_ref, o_ref):
    """E8: E6 + E7 combined."""
    x = _shift_i8(x_ref)
    x_hi16 = x & jnp.int8(-16)
    x_lo4 = (x & jnp.int8(0x0F)).astype(jnp.int8)
    a = a_ref[:]
    u_hi = jax.lax.shift_right_arithmetic(
        jax.lax.dot(a, x_hi16, preferred_element_type=jnp.int32), 4
    ).astype(jnp.int8)
    u_lo_raw = jax.lax.dot(a, x_lo4, preferred_element_type=jnp.int32)
    bt = b_ref[:].T
    tc = x.shape[1]
    cols = []
    for t in range(tc // LANE):
        sl = slice(t * LANE, (t + 1) * LANE)
        u_lo = (u_lo_raw[:, sl] - dc_ref[:]).astype(jnp.int8)
        core = (
            jax.lax.dot(u_hi[:, sl], bt, preferred_element_type=jnp.int32) * 16
            + jax.lax.dot(u_lo, bt, preferred_element_type=jnp.int32)
            + bias_ref[:]
        )
        z = core.astype(jnp.float32) * s_ref[:]
        cols.append((z + jnp.copysign(jnp.float32(0.5), z)).astype(jnp.int8))
    o_ref[:] = jnp.concatenate(cols, axis=1)


def _k_enc_k256(x_ref, a_ref, b_ref, s_ref, b2_ref, o_ref):
    """E9: one K=256 lane dot instead of two K=128 digit dots.  Base-32
    digit split (u = 32*u1 + u0, u1 in [-48,48], u0 in [-16,15]) lets the
    combined operand [32*bt; bt] stay int8 (entries <= 64), so
    concat([u1, u0]) @ [32*bt; bt] computes 32*(u1@bt) + u0@bt in a single
    MXU pass — identical MAC count, but the *128/+ i32 VPU combine folds
    into the dot.  Truncless round (E7) included."""
    x = _shift_i8(x_ref)
    u = jax.lax.dot(a_ref[:], x, preferred_element_type=jnp.int32)
    u1 = jax.lax.shift_right_arithmetic(u + 16, 5)
    u0 = u - jax.lax.shift_left(u1, 5)
    u1_8, u0_8 = u1.astype(jnp.int8), u0.astype(jnp.int8)
    b2 = b2_ref[:]
    tc = x.shape[1]
    cols = []
    for t in range(tc // LANE):
        sl = slice(t * LANE, (t + 1) * LANE)
        pair = jnp.concatenate([u1_8[:, sl], u0_8[:, sl]], axis=1)
        core = jax.lax.dot(pair, b2, preferred_element_type=jnp.int32)
        z = core.astype(jnp.float32) * s_ref[:]
        cols.append((z + jnp.copysign(jnp.float32(0.5), z)).astype(jnp.int8))
    o_ref[:] = jnp.concatenate(cols, axis=1)


def _b2_const():
    """(256, LANE) int8: [32*bt; bt] with bt = blockdiag Ts transposed."""
    from tpudct.constants import block_diag_Ts, get_transform

    bt = block_diag_Ts(LANE // 8, get_transform("haweel").ts).T.astype(np.int32)
    return np.concatenate([32 * bt, bt], axis=0).astype(np.int8)


def _dc_bias(br):
    """(br, LANE) i32 pair: (dc, bias) — dc is 64 on each block's DC ROW
    (the low-nibble recentring), bias is 512 at each block's DC ENTRY
    (what the lane dot adds back)."""
    dc = np.zeros((br, LANE), np.int32)
    dc[::8, :] = 64
    b = np.zeros((br, LANE), np.int32)
    b[::8, ::8] = 512
    return dc, b


def _mk(kern, br=256, tc=2048, with_bias=False, extra=()):
    @functools.partial(jax.jit, static_argnames=())
    def run(x):
        h, w = x.shape
        consts = hp._consts_int(br, 1.0, None)
        if with_bias:
            consts = consts + _dc_bias(br)
        consts = consts + tuple(extra)
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
    elif which == "d":
        br, tc = 128, 4096
        small = x[:512, :4096]
        ref = np.asarray(hp.hp_encode_u8(small))
        for name, kern, wb in (
            ("E7 truncless round      ", _k_enc_truncless, False),
            ("E6 nibble-split         ", _k_enc_nibble, True),
            ("E8 nibble+truncless     ", _k_enc_nibble_truncless, True),
        ):
            f = _mk(kern, br, tc, with_bias=wb)
            got = np.asarray(f(small))
            np.testing.assert_array_equal(got, ref)
            print(f"{name.strip()} exact OK", flush=True)
            ms = device_time_ms(lambda v, f=f: f(v).astype(jnp.uint8), x, k_pair=KP, reps=2)
            print(f"{name}: {ms:7.4f} ms", flush=True)
        ms = device_time_ms(
            lambda v: hp.hp_encode_u8(v).astype(jnp.uint8), x, k_pair=KP, reps=2
        )
        print(f"E4 shipped (same session): {ms:7.4f} ms", flush=True)
    elif which == "e":
        br, tc = 128, 4096
        small = x[:512, :4096]
        ref = np.asarray(hp.hp_encode_u8(small))
        f = _mk(_k_enc_k256, br, tc, extra=(_b2_const(),))
        np.testing.assert_array_equal(np.asarray(f(small)), ref)
        print("E9 K=256 single-dot exact OK", flush=True)
        ms = device_time_ms(lambda v: f(v).astype(jnp.uint8), x, k_pair=KP, reps=2)
        print(f"E9 K=256 single lane dot : {ms:7.4f} ms", flush=True)
        ms = device_time_ms(
            lambda v: hp.hp_encode_u8(v).astype(jnp.uint8), x, k_pair=KP, reps=2
        )
        print(f"E4 shipped (same session): {ms:7.4f} ms", flush=True)
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
