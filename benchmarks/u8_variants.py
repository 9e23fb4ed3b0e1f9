"""Experimental u8-roundtrip kernel variants (round-2 perf push).

Findings so far (see RESULTS_v5e.md):
  * decode_u8 (0.293 ms) sits at its 3-bf16-pass MXU floor;
  * encode_u8 (0.480 ms) is bound by the digit-split lane path (measured
    0.503 with the sublane dot REPLACED by elementwise — the i32<->i8
    packing relayouts + 32 small dots ARE the cost);
  * a butterfly-forward variant (lane-first int8 dot + sublane broadcast
    FMA, 1/3 the MXU work) measured WORSE (0.645 encode): without heavy
    MXU work in the same stream the butterfly's VPU cost is exposed.
  * roundtrip (0.904) ≈ encode + decode + 0.13 — nearly serial.

V-INT here interleaves forward and inverse PER 128-LANE CHUNK inside the
roundtrip so the scheduler sees independent MXU (int8 fwd dots of chunk
t+1, bf16 inv dots of chunk t) and VPU (round/butterfly) work in one
window.

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
    """hp._k_rt_u8_bf with the fwd lane chunk loop and the inv chunk loop
    FUSED into one loop: chunk t's inverse (VPU butterfly + 3 bf16 dots)
    sits next to chunk t+1's forward (2 int8 dots) in program order."""
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
        c = hp._round_away(core.astype(jnp.float32) * s_ref[:])
        c_ref[:, sl] = c.astype(jnp.int8)
        m = c * qdd_ref[:]
        v = hp._bf8_sublane(m, w_ref[:])
        v1, v2, v3 = hp._split3_bf16(v)
        d = lambda z: jax.lax.dot(z, ts, preferred_element_type=jnp.float32)
        r_ref[:, sl] = hp._to_u8(d(v1) + d(v2) + d(v3) + hp.LEVEL_SHIFT)


@functools.partial(jax.jit, static_argnames=("q_scale", "band_rows", "tile_cols"))
def rt_u8_vint(image_u8, q_scale: float = 1.0, band_rows: int = 256, tile_cols: int = 2048):
    h, w = image_u8.shape
    br, tc = hp._geometry(h, w, band_rows, tile_cols, row_align=32)
    iconsts = hp._consts_int(br, q_scale, None)
    qdd, _, wts = hp._consts_bf(br, q_scale)
    consts = (*iconsts, qdd, wts)
    return hp._call(
        _k_rt_u8_interleave, h, w, br, tc, consts,
        [jnp.int8, jnp.uint8], False, {0: 1},
    )(image_u8, *consts)


def _k_rt_u8_bf16digits(x_ref, a_ref, b_ref, s_ref, qdd_ref, w_ref, c_ref, r_ref):
    """Lane contraction via exact bf16 digits instead of int8 digits:
    w = 16*w1 + w0 with w1 in [-96, 96] and w0 in [-8, 7] — both
    bf16-exact, so 2 bf16 MXU passes replace the 2 int8 passes WITHOUT the
    i32->i8 1:4 packing relayouts (i32->bf16 is a 1:2 pack).  2x the MXU
    cycles, fewer VPU relayouts — measured head-to-head."""
    x = (x_ref[:].astype(jnp.int32) - 128).astype(jnp.int8)
    u = jax.lax.dot(a_ref[:], x, preferred_element_type=jnp.int32)
    u1 = jax.lax.shift_right_arithmetic(u + 8, 4)   # [-96, 96]
    u0 = u - jax.lax.shift_left(u1, 4)              # [-8, 7]
    u1_b, u0_b = u1.astype(jnp.bfloat16), u0.astype(jnp.bfloat16)
    ts = b_ref[:].astype(jnp.bfloat16)
    bt = ts.T
    tc = x.shape[1]
    cols = []
    for t in range(tc // LANE):
        sl = slice(t * LANE, (t + 1) * LANE)
        core = (
            jax.lax.dot(u1_b[:, sl], bt, preferred_element_type=jnp.float32) * 16.0
            + jax.lax.dot(u0_b[:, sl], bt, preferred_element_type=jnp.float32)
        )
        cols.append(hp._round_away(core * s_ref[:]))
    c = jnp.concatenate(cols, axis=1)
    c_ref[:] = c.astype(jnp.int8)
    r_ref[:] = hp._to_u8(hp._inv_tile_bf(c, qdd_ref[:], b_ref[:], w_ref[:]))


@functools.partial(jax.jit, static_argnames=("q_scale", "band_rows", "tile_cols"))
def rt_u8_vbf(image_u8, q_scale: float = 1.0, band_rows: int = 256, tile_cols: int = 2048):
    h, w = image_u8.shape
    br, tc = hp._geometry(h, w, band_rows, tile_cols, row_align=32)
    iconsts = hp._consts_int(br, q_scale, None)
    qdd, _, wts = hp._consts_bf(br, q_scale)
    consts = (*iconsts, qdd, wts)
    return hp._call(
        _k_rt_u8_bf16digits, h, w, br, tc, consts,
        [jnp.int8, jnp.uint8], False, {0: 1},
    )(image_u8, *consts)


def _k_rt_u8_chunkstore(x_ref, a_ref, b_ref, s_ref, qdd_ref, w_ref, c_ref, r_ref):
    """Shipped kernel with per-chunk output stores instead of
    concatenate-then-store: shorter register lifetimes, same math."""
    x = hp._shift_u8(x_ref[:])
    u = jax.lax.dot(a_ref[:], x, preferred_element_type=jnp.int32)
    u1 = jax.lax.shift_right_arithmetic(u + 64, 7)
    u0 = u - jax.lax.shift_left(u1, 7)
    u1_8, u0_8 = u1.astype(jnp.int8), u0.astype(jnp.int8)
    bt = b_ref[:].T
    tc = x.shape[1]
    cs = []
    for t in range(tc // LANE):
        sl = slice(t * LANE, (t + 1) * LANE)
        core = (
            jax.lax.dot(u1_8[:, sl], bt, preferred_element_type=jnp.int32) * 128
            + jax.lax.dot(u0_8[:, sl], bt, preferred_element_type=jnp.int32)
        )
        c = hp._round_away(core.astype(jnp.float32) * s_ref[:])
        c_ref[:, sl] = c.astype(jnp.int8)
        cs.append(c)
    ts = b_ref[:].astype(jnp.bfloat16)
    for t in range(tc // LANE):
        sl = slice(t * LANE, (t + 1) * LANE)
        m = cs[t] * qdd_ref[:]
        v = hp._bf8_sublane(m, w_ref[:])
        v1, v2, v3 = hp._split3_bf16(v)
        d = lambda z: jax.lax.dot(z, ts, preferred_element_type=jnp.float32)
        r_ref[:, sl] = hp._to_u8(d(v1) + d(v2) + d(v3) + hp.LEVEL_SHIFT)


@functools.partial(jax.jit, static_argnames=("q_scale", "band_rows", "tile_cols"))
def rt_u8_vcs(image_u8, q_scale: float = 1.0, band_rows: int = 256, tile_cols: int = 2048):
    h, w = image_u8.shape
    br, tc = hp._geometry(h, w, band_rows, tile_cols, row_align=32)
    iconsts = hp._consts_int(br, q_scale, None)
    qdd, _, wts = hp._consts_bf(br, q_scale)
    consts = (*iconsts, qdd, wts)
    return hp._call(
        _k_rt_u8_chunkstore, h, w, br, tc, consts,
        [jnp.int8, jnp.uint8], False, {0: 1},
    )(image_u8, *consts)


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    which = sys.argv[2] if len(sys.argv) > 2 else "int"
    assert jax.default_backend() == "tpu"
    x = jnp.asarray(synthetic_image(size).astype(np.uint8))
    KP = (8, 72)

    if which == "int":
        c0, r0 = hp.hp_roundtrip_u8(x[:1024, :2048])
        c1, r1 = rt_u8_vint(x[:1024, :2048])
        np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
        np.testing.assert_array_equal(np.asarray(r0), np.asarray(r1))
        print("V-INT correctness vs shipped: OK", flush=True)
        ms = device_time_ms(lambda v: rt_u8_vint(v)[1], x, k_pair=KP, reps=2)
        print(f"V-INT interleaved (256,2048): {ms:7.4f} ms", flush=True)
    elif which == "bf":
        c0, r0 = hp.hp_roundtrip_u8(x[:1024, :2048])
        c1, r1 = rt_u8_vbf(x[:1024, :2048])
        np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
        np.testing.assert_array_equal(np.asarray(r0), np.asarray(r1))
        print("V-BF correctness vs shipped: OK", flush=True)
        ms = device_time_ms(lambda v: rt_u8_vbf(v)[1], x, k_pair=KP, reps=2)
        print(f"V-BF bf16-digit lane (256,2048): {ms:7.4f} ms", flush=True)
        ms = device_time_ms(lambda v: rt_u8_vbf(v, band_rows=128)[1], x, k_pair=KP, reps=2)
        print(f"V-BF bf16-digit lane (128,2048): {ms:7.4f} ms", flush=True)
    elif which == "abbf":
        # same-session alternating A/B: shipped int8-digit lane vs the
        # bf16-digit lane (no i32->i8 packing, 2x MXU cycles)
        from tpudct.utils.timing import _best_wall, _chain

        K1, K2 = 16, 144
        A = (_chain(lambda v: hp.hp_roundtrip_u8(v)[1], K1),
             _chain(lambda v: hp.hp_roundtrip_u8(v)[1], K2))
        B = (_chain(lambda v: rt_u8_vbf(v)[1], K1),
             _chain(lambda v: rt_u8_vbf(v)[1], K2))
        for f1, f2 in (A, B):
            float(f1(x)); float(f2(x))
        res = {"shipped": [], "bf16digit": []}
        for trial in range(4):
            for name, (f1, f2) in (("shipped", A), ("bf16digit", B)):
                t1 = _best_wall(f1, x, 3)
                t2 = _best_wall(f2, x, 3)
                ms = (t2 - t1) / (K2 - K1) * 1e3
                res[name].append(ms)
                print(f"trial {trial} {name}: {ms:7.4f} ms", flush=True)
        for k, v in res.items():
            print(f"{k}: min {min(v):.4f} med {sorted(v)[1]:.4f}", flush=True)
    elif which == "cs":
        # same-session alternating A/B vs the shipped kernel
        from tpudct.utils.timing import _best_wall, _chain

        c0, r0 = hp.hp_roundtrip_u8(x[:1024, :2048])
        c1, r1 = rt_u8_vcs(x[:1024, :2048])
        np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
        np.testing.assert_array_equal(np.asarray(r0), np.asarray(r1))
        print("V-CS correctness vs shipped: OK", flush=True)
        K1, K2 = 16, 144
        A = (_chain(lambda v: hp.hp_roundtrip_u8(v)[1], K1),
             _chain(lambda v: hp.hp_roundtrip_u8(v)[1], K2))
        B = (_chain(lambda v: rt_u8_vcs(v)[1], K1),
             _chain(lambda v: rt_u8_vcs(v)[1], K2))
        for f1, f2 in (A, B):
            float(f1(x)); float(f2(x))
        res = {"shipped": [], "chunkstore": []}
        for trial in range(4):
            for name, (f1, f2) in (("shipped", A), ("chunkstore", B)):
                t1 = _best_wall(f1, x, 3)
                t2 = _best_wall(f2, x, 3)
                ms = (t2 - t1) / (K2 - K1) * 1e3
                res[name].append(ms)
                print(f"trial {trial} {name}: {ms:7.4f} ms", flush=True)
        for k, v in res.items():
            print(f"{k}: min {min(v):.4f} med {sorted(v)[1]:.4f}", flush=True)


if __name__ == "__main__":
    main()
