"""Color variant study, round 2 (follows benchmarks/color_variants.py).

Round-1 findings at 8192² (same-session): fixed-point integer luma in the
split kernel wins −4.4%; half-res chroma shift is neutral; the direct-form
inverse and every geometry alternative are worse.  Pass-count accounting
then points at the elephant: the compare-form `_to_u8` is ~9 VPU ops per
plane and the merge kernel runs it three times at full resolution — over
half its VPU work.

  V4 merge: truncating add-form rounding — clip(z) + 0.5 -> i32 -> u8.
     For non-negative zp, trunc(zp + 0.5) equals round-half-away(zp)
     everywhere EXCEPT where the f32 addition itself rounds across an
     integer boundary (a just-below-.5 fraction within half an ulp) — the
     same ±1 boundary class as everything else in this codec.  5 ops vs 9.
  V5 = V3 split (fixed-point luma) + V4 merge.
  V6 = V5 + half-res chroma shift (V1): with the rounding chain gone the
     two full-res subtracts may matter again.

Run on the real chip from the repo root:  python - < benchmarks/color_variants2.py
"""

import functools
import json

import numpy as np

SIZE = 8192
K_PAIR = (8, 72)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tpudct.kernels import color_pallas as cp
    from tpudct.utils.color import rgb_from_ycbcr_planes, ycbcr_from_rgb_planes
    from tpudct.utils.timing import device_time_ms

    def _to_u8_trunc(z):
        zp = jnp.minimum(jnp.maximum(z, 0.0), 255.0)
        return (zp + jnp.float32(0.5)).astype(jnp.int32).astype(jnp.uint8)

    def _f32(u8_val):
        return u8_val.astype(jnp.int32).astype(jnp.float32)

    # ---- V4: shipped merge with trunc-form rounding --------------------------
    def _k_merge_v4(y_ref, cb_ref, cr_ref, ur_ref, o_ref):
        y = _f32(y_ref[...])
        ur_bf = ur_ref[...].astype(jnp.bfloat16)

        def up(c_u8):
            c = c_u8.astype(jnp.int32).astype(jnp.bfloat16)
            wide = jax.lax.dot(c, ur_bf, preferred_element_type=jnp.float32)
            h2, w = wide.shape
            return jnp.broadcast_to(wide[:, None, :], (h2, 2, w)).reshape(2 * h2, w)

        r, g, b = rgb_from_ycbcr_planes(y, up(cb_ref[...]), up(cr_ref[...]))
        o_ref[0] = _to_u8_trunc(r)
        o_ref[1] = _to_u8_trunc(g)
        o_ref[2] = _to_u8_trunc(b)

    # ---- V6 merge: V4 + half-res shift ---------------------------------------
    def _k_merge_v6(y_ref, cb_ref, cr_ref, ur_ref, o_ref):
        y = _f32(y_ref[...])
        ur_bf = ur_ref[...].astype(jnp.bfloat16)

        def up_shifted(c_u8):
            c = (c_u8.astype(jnp.int32) - 128).astype(jnp.bfloat16)
            wide = jax.lax.dot(c, ur_bf, preferred_element_type=jnp.float32)
            h2, w = wide.shape
            return jnp.broadcast_to(wide[:, None, :], (h2, 2, w)).reshape(2 * h2, w)

        cbc = up_shifted(cb_ref[...])
        crc = up_shifted(cr_ref[...])
        r = y + (2.0 - 2.0 * 0.299) * crc
        b = y + (2.0 - 2.0 * 0.114) * cbc
        g = (y - 0.299 * r - 0.114 * b) / 0.587
        o_ref[0] = _to_u8_trunc(r)
        o_ref[1] = _to_u8_trunc(g)
        o_ref[2] = _to_u8_trunc(b)

    # ---- V5 split: fixed-point luma + trunc-form chroma rounding -------------
    def _k_split_v5(rgb_ref, pl_ref, pr_ref, y_ref, cb_ref, cr_ref):
        ri, gi, bi = (rgb_ref[i].astype(jnp.int32) for i in range(3))
        y_fx = (19595 * ri + 38470 * gi + 7471 * bi + 32768) >> 16
        y_ref[...] = y_fx.astype(jnp.uint8)
        pr_bf = pr_ref[...].astype(jnp.bfloat16)

        def pool(ch_i32):
            c8 = (ch_i32 - 128).astype(jnp.int8)
            rows = jax.lax.dot(pl_ref[...], c8, preferred_element_type=jnp.int32)
            quad = jax.lax.dot(
                rows.astype(jnp.float32).astype(jnp.bfloat16), pr_bf,
                preferred_element_type=jnp.float32,
            )
            return quad * 0.25 + 128.0

        _yp, cbp, crp = ycbcr_from_rgb_planes(pool(ri), pool(gi), pool(bi))
        cb_ref[...] = _to_u8_trunc(cbp)
        cr_ref[...] = _to_u8_trunc(crp)

    def make_merge(kernel, br=512, tc=256):
        urm = cp._up_mat(tc)

        @jax.jit
        def run(y_u8, cb_u8, cr_u8):
            h, w = y_u8.shape
            grid = (h // br, w // tc)
            full = pl.BlockSpec((br, tc), lambda i, j: (i, j), memory_space=pltpu.VMEM)
            half = pl.BlockSpec((br // 2, tc // 2), lambda i, j: (i, j), memory_space=pltpu.VMEM)
            const = pl.BlockSpec(urm.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM)
            fn = pl.pallas_call(
                kernel, grid=grid,
                in_specs=[full, half, half, const],
                out_specs=pl.BlockSpec((3, br, tc), lambda i, j: (0, i, j), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((3, h, w), jnp.uint8),
            )
            return fn(y_u8, cb_u8, cr_u8, urm)

        return run

    def make_split(kernel, br=512, tc=256):
        plm, prm = cp._pool_mats(br, tc)

        @jax.jit
        def run(rgb):
            _c, h, w = rgb.shape
            grid = (h // br, w // tc)
            full = pl.BlockSpec((br, tc), lambda i, j: (i, j), memory_space=pltpu.VMEM)
            half = pl.BlockSpec((br // 2, tc // 2), lambda i, j: (i, j), memory_space=pltpu.VMEM)
            const = lambda a: pl.BlockSpec(a.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM)
            fn = pl.pallas_call(
                kernel, grid=grid,
                in_specs=[
                    pl.BlockSpec((3, br, tc), lambda i, j: (0, i, j), memory_space=pltpu.VMEM),
                    const(plm), const(prm),
                ],
                out_specs=(full, half, half),
                out_shape=(
                    jax.ShapeDtypeStruct((h, w), jnp.uint8),
                    jax.ShapeDtypeStruct((h // 2, w // 2), jnp.uint8),
                    jax.ShapeDtypeStruct((h // 2, w // 2), jnp.uint8),
                ),
            )
            return fn(rgb, plm, prm)

        return run

    rng = np.random.default_rng(42)
    rgb = jnp.asarray(rng.integers(0, 256, (3, SIZE, SIZE), dtype=np.uint8))

    split_s = lambda x: cp.color_split_420_u8(x)
    merge_s = lambda y, cb, cr: cp.color_merge_420_u8(y, cb, cr)

    # correctness pre-checks on a small image (tie-class bounds)
    small = jnp.asarray(rng.integers(0, 256, (3, 256, 512), dtype=np.uint8))
    y0, cb0, cr0 = split_s(small)
    base = np.asarray(merge_s(y0, cb0, cr0))
    m_v4 = make_merge(_k_merge_v4, br=64, tc=256)
    m_v6 = make_merge(_k_merge_v6, br=64, tc=256)
    s_v5 = make_split(_k_split_v5, br=64, tc=256)
    for name, m in (("V4", m_v4), ("V6", m_v6)):
        out = np.asarray(m(y0, cb0, cr0))
        d = np.abs(out.astype(np.int32) - base.astype(np.int32))
        print(json.dumps({"check": f"{name} vs shipped merge",
                          "max": int(d.max()), "frac": float((d > 0).mean())}))
    y5, cb5, cr5 = s_v5(small)
    dy = np.abs(np.asarray(y5).astype(np.int32) - np.asarray(y0).astype(np.int32))
    dc = np.abs(np.asarray(cb5).astype(np.int32) - np.asarray(cb0).astype(np.int32))
    print(json.dumps({"check": "V5 split vs shipped", "y_max": int(dy.max()),
                      "y_frac": float((dy > 0).mean()), "cb_max": int(dc.max()),
                      "cb_frac": float((dc > 0).mean())}))

    def pair(split_fn, merge_fn):
        def op(x):
            y, cb, cr = split_fn(x)
            return merge_fn(y, cb, cr)
        return op

    variants = {
        "S  shipped": pair(split_s, merge_s),
        "V4 trunc-round merge": pair(split_s, make_merge(_k_merge_v4)),
        "V5 fxp-luma split + V4 merge": pair(make_split(_k_split_v5), make_merge(_k_merge_v4)),
        "V6 V5 + half-res shift merge": pair(make_split(_k_split_v5), make_merge(_k_merge_v6)),
    }
    for name, op in variants.items():
        ms = device_time_ms(op, rgb, k_pair=K_PAIR, reps=4)
        print(json.dumps({"variant": name, "pair_ms": round(ms, 4)}), flush=True)
    ms = device_time_ms(variants["S  shipped"], rgb, k_pair=K_PAIR, reps=4)
    print(json.dumps({"variant": "S  shipped (repeat)", "pair_ms": round(ms, 4)}))


if __name__ == "__main__":
    main()
