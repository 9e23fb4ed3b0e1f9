"""Head-to-head device bench of inverse-transform formulations (8192^2).

Explores the replacement for the f32-HIGHEST (12 bf16-emulation-pass) inverse:
  A. butterfly both directions (2 transposes)           [current 'butterfly']
  B. sublane butterfly + exact bf16x3-split lane matmul [hybrid]
  C. exact bf16x3-split matmul both directions (6 passes)
  D. 'high' bf16x3 tier (6 passes, ~0.2 gray error)     [reference point]
  E. 'highest' (12 passes)                              [reference point]

Run on the real TPU from the repo root:
    python benchmarks/inv_formulations.py [size]
(a sys.path bootstrap below makes script-mode work; `python - <<EOF` from
the repo root works too, per CLAUDE.md.)
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

from tpudct.kernels import hp_pallas as hp
from tpudct.benchmark import synthetic_image
from tpudct.utils.timing import device_time_ms

LANE = 128


def _split3(a):
    f32, b16 = jnp.float32, jnp.bfloat16
    a1 = a.astype(b16)
    r1 = a - a1.astype(f32)
    a2 = r1.astype(b16)
    a3 = (r1 - a2.astype(f32)).astype(b16)
    return a1, a2, a3


def _dot_exact_right(m, ts_bf):
    """m @ ts with m f32 (3-way bf16 split, exact) and ts exactly bf16."""
    d = lambda x: jax.lax.dot(x, ts_bf, preferred_element_type=jnp.float32)
    m1, m2, m3 = _split3(m)
    return d(m1) + d(m2) + d(m3)


def _dot_exact_left(ts_bf, m):
    d = lambda x: jax.lax.dot(ts_bf, x, preferred_element_type=jnp.float32)
    m1, m2, m3 = _split3(m)
    return d(m1) + d(m2) + d(m3)


def _inv_tile_c(c, qdd, bdts_bf):
    tc = c.shape[1]
    cols = []
    for t in range(tc // LANE):
        m = c[:, t * LANE : (t + 1) * LANE] * qdd
        u = _dot_exact_left(bdts_bf.T, m)
        cols.append(_dot_exact_right(u, bdts_bf) + 128.0)
    return jnp.concatenate(cols, axis=1) if len(cols) > 1 else cols[0]


def _inv_tile_b(c, qdd, bdts_bf, wts):
    tc = c.shape[1]
    cols = []
    for t in range(tc // LANE):
        m = c[:, t * LANE : (t + 1) * LANE] * qdd
        u = hp._bf8_sublane(m, wts)  # Ts^T @ m over sublanes, broadcast-FMA
        cols.append(_dot_exact_right(u, bdts_bf) + 128.0)
    return jnp.concatenate(cols, axis=1) if len(cols) > 1 else cols[0]


def _k_b(c_ref, s_ref, t_ref, w_ref, o_ref):
    o_ref[:] = _inv_tile_b(c_ref[:], s_ref[:], t_ref[:], w_ref[:])


def _k_c(c_ref, s_ref, t_ref, w_ref, o_ref):
    del w_ref
    o_ref[:] = _inv_tile_c(c_ref[:], s_ref[:], t_ref[:])


@functools.partial(jax.jit, static_argnames=("variant",))
def idct_x(coeffs, variant: str):
    h, w = coeffs.shape
    br, tc = 128, 512
    qdd, _, wts = hp._consts_bf(br, 1.0)
    bdts = hp._block_diag_ts(br // 8).astype(np.float32).astype(jnp.bfloat16)
    kern = {"b": _k_b, "c": _k_c}[variant]
    grid = (h // br, w // tc)
    img = lambda: pl.BlockSpec((br, tc), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    cs = lambda c: pl.BlockSpec(c.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[img(), cs(qdd), cs(bdts), cs(wts)],
        out_specs=img(),
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
        input_output_aliases={0: 0},
    )(coeffs, qdd, jnp.asarray(bdts), wts)


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    img = synthetic_image(size)
    c = hp.hp_dct(jnp.asarray(img))

    # accuracy first, small
    from tests.golden import golden_dct, golden_idct

    simg = synthetic_image(512)
    sc = np.asarray(hp.hp_dct(jnp.asarray(simg)))
    g = golden_idct(sc)
    for v in ("b", "c"):
        r = np.asarray(idct_x(jnp.asarray(sc), v))
        print(f"variant {v}: max err vs f64 golden = {np.abs(r - g).max():.2e}")

    for v in ("b", "c"):
        ms = device_time_ms(lambda x: idct_x(x, v), c, reps=5)
        print(f"idct variant {v}: {ms:.3f} ms")
    for prec in ("highest", "high", "butterfly"):
        ms = device_time_ms(lambda x: hp.hp_idct(x, decode_precision=prec), c, reps=5)
        print(f"idct {prec}: {ms:.3f} ms")


if __name__ == "__main__":
    main()
