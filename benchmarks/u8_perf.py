"""u8 roundtrip perf decomposition at 8192^2 (VERDICT round-2 task 1).

Measures, on the real chip:
  * pure u8 aliased-copy kernel         -> the HBM traffic floor
  * hp_encode_u8 alone                  -> forward cost over its floor
  * hp_decode_u8 alone                  -> inverse cost over its floor
  * hp_roundtrip_u8                     -> the headline composition
  * geometry sweep (band_rows x tile_cols)

Run from repo root:  python benchmarks/u8_perf.py [size]
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


def _copy_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:]


@functools.partial(jax.jit, static_argnames=("br", "tc"))
def u8_copy(x, br=256, tc=2048):
    h, w = x.shape
    return pl.pallas_call(
        _copy_kernel,
        grid=(h // br, w // tc),
        in_specs=[pl.BlockSpec((br, tc), lambda i, j: (i, j), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((br, tc), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w), x.dtype),
        input_output_aliases={0: 0},
    )(x)


def _copy2_kernel(x_ref, o_ref, o2_ref):
    o_ref[:] = x_ref[:]
    o2_ref[:] = x_ref[:].astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("br", "tc"))
def u8_copy2(x, br=256, tc=2048):
    """Roundtrip-shaped traffic: one u8 read, one u8 write (aliased), one
    int8 write — the exact byte pattern of hp_roundtrip_u8 (192 MB at
    8192^2) with zero math."""
    h, w = x.shape
    spec = lambda: pl.BlockSpec((br, tc), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _copy2_kernel,
        grid=(h // br, w // tc),
        in_specs=[spec()],
        out_specs=(spec(), spec()),
        out_shape=(
            jax.ShapeDtypeStruct((h, w), jnp.uint8),
            jax.ShapeDtypeStruct((h, w), jnp.int8),
        ),
        input_output_aliases={0: 0},
    )(x)


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    assert jax.default_backend() == "tpu", "run on the real chip"
    img = synthetic_image(size).astype(np.uint8)
    x = jnp.asarray(img)
    gb = size * size / 1e9

    ms = device_time_ms(lambda v: u8_copy(v), x, reps=3)
    print(f"u8 aliased copy        : {ms:7.4f} ms  ({2*gb/ms*1e3:6.1f} GB/s eff)", flush=True)

    ms = device_time_ms(lambda v: u8_copy2(v)[0], x, reps=3)
    print(f"u8 copy + i8 write     : {ms:7.4f} ms  ({3*gb/ms*1e3:6.1f} GB/s eff)", flush=True)

    ms = device_time_ms(
        lambda v: hp.hp_encode_u8(v).astype(jnp.uint8), x, reps=3
    )
    print(f"hp_encode_u8           : {ms:7.4f} ms", flush=True)

    c8 = hp.hp_encode_u8(x)
    ms = device_time_ms(
        lambda v: hp.hp_decode_u8(v.astype(jnp.int8)).astype(jnp.int8),
        c8, reps=3,
    )
    print(f"hp_decode_u8 (butterfly): {ms:7.4f} ms", flush=True)

    ms = device_time_ms(lambda v: hp.hp_roundtrip_u8(v)[1], x, reps=3)
    print(f"hp_roundtrip_u8        : {ms:7.4f} ms   <- headline", flush=True)

    for br in (128, 256, 512):
        for tc in (1024, 2048, 4096, 8192):
            if tc > size or br > size:
                continue
            ms = device_time_ms(
                lambda v, br=br, tc=tc: hp.hp_roundtrip_u8(
                    v, band_rows=br, tile_cols=tc
                )[1],
                x, reps=3,
            )
            print(f"  roundtrip ({br:4d},{tc:5d}) : {ms:7.4f} ms", flush=True)


if __name__ == "__main__":
    main()
