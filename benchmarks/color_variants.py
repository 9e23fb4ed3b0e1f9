"""Color split/merge variant study (VERDICT r3 #3) — same-session A/Bs.

The color pair (color_split_420_u8 + color_merge_420_u8) measures 1.94 ms
at 8192² against a 0.98 ms traffic floor (RESULTS roofline row: ~2.0×,
"VPU-compute-bound — the BT.601 matrix is f32 FMA chains on u8 data the
MXU can't help with").  This script gives that closure the gray-grade
treatment: one kernel variant per hypothesis, all measured same-session
with the slope protocol on the (3, 8192, 8192) pair chain
(split -> merge is (3,H,W) u8 -> (3,H,W) u8, so the pair chains directly).

Variants (each targets a counted VPU pass):

  S  shipped pair (baseline)
  V1 merge: level-shift chroma at HALF resolution before the upsample dot
     (up is 0/1-replication, so up(c-128) == up(c)-128 exactly; c-128 in
     [-128,127] is bf16-exact) — saves 2 full-res subtract passes, moves
     them to quarter-res.  Bit-identical by construction.
  V2 merge: direct-form inverse (r = y + a·cr', b = y + b·cb',
     g = y - c1·cb' - c2·cr') instead of deriving g from r and b
     (g = (y - kr·r - kb·b)/kg) — 4 FMA+1 mul fewer full-res passes,
     and r/b no longer sit on g's critical path.  NOT bit-identical
     (different f32 rounding; same ±1 tie class as the pool-order delta).
  V3 split: fixed-point integer luma — y = (19595·r + 38470·g + 7471·b
     + 32768) >> 16 entirely in i32 off the loaded integers, stored u8
     directly.  Replaces 3 i32->f32 casts + 3 FMA + the 5-pass _to_u8
     with 3 mul + 2 add + shift + cast.  ±1 vs the f32 form at ties.
  V4 geometry sweep on the winning pair.

Run on the real chip from the repo root:  python - < benchmarks/color_variants.py
Prints one JSON line per measurement.
"""

import functools
import json

import numpy as np


SIZE = 8192
K_PAIR = (8, 72)


def build_variants():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tpudct.kernels import color_pallas as cp
    from tpudct.utils.color import rgb_from_ycbcr_planes, ycbcr_from_rgb_planes

    _to_u8 = cp._to_u8
    _f32 = cp._f32

    # ---- merge variants -----------------------------------------------------

    def _k_merge_v1(y_ref, cb_ref, cr_ref, ur_ref, o_ref):
        """V1: chroma level shift at half res, folded through the upsample."""
        y = _f32(y_ref[...])
        ur_bf = ur_ref[...].astype(jnp.bfloat16)

        def up_shifted(c_u8):
            # (c - 128) in [-128, 127]: bf16-exact; 0/1 dot exact -> the
            # upsampled SHIFTED plane, no full-res subtract pass
            c = (c_u8.astype(jnp.int32) - 128).astype(jnp.bfloat16)
            wide = jax.lax.dot(c, ur_bf, preferred_element_type=jnp.float32)
            h2, w = wide.shape
            return jnp.broadcast_to(wide[:, None, :], (h2, 2, w)).reshape(2 * h2, w)

        cbc = up_shifted(cb_ref[...])
        crc = up_shifted(cr_ref[...])
        # same algebra as rgb_from_ycbcr_planes, shifts pre-applied
        r = y + (2.0 - 2.0 * 0.299) * crc
        b = y + (2.0 - 2.0 * 0.114) * cbc
        g = (y - 0.299 * r - 0.114 * b) / 0.587
        o_ref[0] = _to_u8(r)
        o_ref[1] = _to_u8(g)
        o_ref[2] = _to_u8(b)

    def _k_merge_v12(y_ref, cb_ref, cr_ref, ur_ref, o_ref):
        """V1+V2: half-res shift + direct-form inverse."""
        y = _f32(y_ref[...])
        ur_bf = ur_ref[...].astype(jnp.bfloat16)

        def up_shifted(c_u8):
            c = (c_u8.astype(jnp.int32) - 128).astype(jnp.bfloat16)
            wide = jax.lax.dot(c, ur_bf, preferred_element_type=jnp.float32)
            h2, w = wide.shape
            return jnp.broadcast_to(wide[:, None, :], (h2, 2, w)).reshape(2 * h2, w)

        cbc = up_shifted(cb_ref[...])
        crc = up_shifted(cr_ref[...])
        kr, kg, kb = 0.299, 0.587, 0.114
        r = y + (2.0 - 2.0 * kr) * crc
        b = y + (2.0 - 2.0 * kb) * cbc
        g = y - (kb * (2.0 - 2.0 * kb) / kg) * cbc - (kr * (2.0 - 2.0 * kr) / kg) * crc
        o_ref[0] = _to_u8(r)
        o_ref[1] = _to_u8(g)
        o_ref[2] = _to_u8(b)

    # ---- split variants -----------------------------------------------------

    def _k_split_v3(rgb_ref, pl_ref, pr_ref, y_ref, cb_ref, cr_ref):
        """V3: fixed-point integer luma; chroma pooling unchanged."""
        ri, gi, bi = (rgb_ref[i].astype(jnp.int32) for i in range(3))
        # y = round(.299r + .587g + .114b) to 16 fractional bits;
        # weights sum to 65536 so y stays in [0, 255] — direct u8 store.
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
        cb_ref[...] = _to_u8(cbp)
        cr_ref[...] = _to_u8(crp)

    # ---- plumbing (mirrors color_pallas geometry/specs) ----------------------

    def make_merge(kernel, br=512, tc=256):
        urm = cp._up_mat(tc)

        @functools.partial(jax.jit, static_argnames=())
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

        @functools.partial(jax.jit, static_argnames=())
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

    return {
        "make_merge": make_merge, "make_split": make_split,
        "_k_merge_v1": _k_merge_v1, "_k_merge_v12": _k_merge_v12,
        "_k_split_v3": _k_split_v3,
    }


def main():
    import jax.numpy as jnp

    from tpudct.kernels import color_pallas as cp
    from tpudct.utils.timing import device_time_ms

    v = build_variants()
    rng = np.random.default_rng(42)
    rgb = jnp.asarray(rng.integers(0, 256, (3, SIZE, SIZE), dtype=np.uint8))

    split_s = lambda x, br=512, tc=256: cp.color_split_420_u8(x, band_rows=br, tile_cols=tc)
    merge_s = lambda y, cb, cr, br=512, tc=256: cp.color_merge_420_u8(y, cb, cr, band_rows=br, tile_cols=tc)

    # correctness cross-checks on a small image first (cheap compiles)
    small = jnp.asarray(rng.integers(0, 256, (3, 256, 512), dtype=np.uint8))
    y0, cb0, cr0 = split_s(small)
    base = np.asarray(merge_s(y0, cb0, cr0))
    m_v1 = v["make_merge"](v["_k_merge_v1"], br=64, tc=256)
    m_v12 = v["make_merge"](v["_k_merge_v12"], br=64, tc=256)
    s_v3 = v["make_split"](v["_k_split_v3"], br=64, tc=256)
    out_v1 = np.asarray(m_v1(y0, cb0, cr0))
    assert np.array_equal(out_v1, base), "V1 must be bit-identical"
    print(json.dumps({"check": "V1 bit-identical", "ok": True}))
    out_v12 = np.asarray(m_v12(y0, cb0, cr0))
    d = np.abs(out_v12.astype(np.int32) - base.astype(np.int32))
    print(json.dumps({
        "check": "V12 tie class", "max": int(d.max()),
        "frac": float((d > 0).mean()),
    }))
    y3, cb3, cr3 = s_v3(small)
    dy = np.abs(np.asarray(y3).astype(np.int32) - np.asarray(y0).astype(np.int32))
    print(json.dumps({
        "check": "V3 luma tie class", "max": int(dy.max()),
        "frac": float((dy > 0).mean()),
    }))
    assert np.array_equal(np.asarray(cb3), np.asarray(cb0))

    # pair chains: (3,H,W) u8 -> (3,H,W) u8
    def pair(split_fn, merge_fn):
        def op(x):
            y, cb, cr = split_fn(x)
            return merge_fn(y, cb, cr)
        return op

    variants = {
        "S  shipped (512,256)": pair(split_s, merge_s),
        "V1 merge half-res shift": pair(
            split_s, v["make_merge"](v["_k_merge_v1"])
        ),
        "V12 + direct-form inverse": pair(
            split_s, v["make_merge"](v["_k_merge_v12"])
        ),
        "V3 split fixed-point luma": pair(
            v["make_split"](v["_k_split_v3"]), merge_s
        ),
        "V123 all": pair(
            v["make_split"](v["_k_split_v3"]),
            v["make_merge"](v["_k_merge_v12"]),
        ),
    }
    # geometry sweep on the shipped kernels
    for br, tc in ((256, 512), (128, 1024), (64, 2048), (256, 256)):
        variants[f"S geometry ({br},{tc})"] = pair(
            lambda x, br=br, tc=tc: cp.color_split_420_u8(x, band_rows=br, tile_cols=tc),
            lambda y, cb, cr, br=br, tc=tc: cp.color_merge_420_u8(y, cb, cr, band_rows=br, tile_cols=tc),
        )

    results = {}
    for name, op in variants.items():
        ms = device_time_ms(op, rgb, k_pair=K_PAIR, reps=4)
        results[name] = ms
        print(json.dumps({"variant": name, "pair_ms": round(ms, 4)}), flush=True)
    # repeat the baseline last to bracket session drift
    ms = device_time_ms(variants["S  shipped (512,256)"], rgb, k_pair=K_PAIR, reps=4)
    print(json.dumps({"variant": "S  shipped (repeat)", "pair_ms": round(ms, 4)}))


if __name__ == "__main__":
    main()
