"""Fused-roundtrip vs split encode->decode composition at 8192² (same-session A/B).

Motivation: after the truncless-round adoption the standalone kernels sum to
~0.68 ms (encode 0.387 + decode 0.293) while the fused roundtrip benches
0.79 — cross-session numbers, so settle it with an alternating same-session
A/B.  The split path moves 256 MB vs the fused 192 MB but its encode gets
the cheaper i8-output rounding and each kernel gets its own scheduling.

Run from repo root:  python benchmarks/rt_split_ab.py [size] [trials]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from tpudct.benchmark import synthetic_image
from tpudct.kernels import hp_pallas as hp
from tpudct.utils.timing import device_time_ms

KP = (8, 72)


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    assert jax.default_backend() == "tpu"
    x = jnp.asarray(synthetic_image(size).astype(np.uint8))

    fused = jax.jit(lambda v: hp.hp_roundtrip_u8(v)[1])
    split = jax.jit(lambda v: hp.hp_decode_u8(hp.hp_encode_u8(v)))

    # correctness: identical reconstructions (gate also asserts this at 512²)
    small = x[:512, :4096]
    np.testing.assert_array_equal(np.asarray(fused(small)), np.asarray(split(small)))
    print("split == fused reconstruction OK", flush=True)

    for t in range(trials):
        ms_f = device_time_ms(fused, x, k_pair=KP, reps=2)
        ms_s = device_time_ms(split, x, k_pair=KP, reps=2)
        print(f"trial {t}: fused {ms_f:7.4f} ms | split {ms_s:7.4f} ms", flush=True)


if __name__ == "__main__":
    main()
