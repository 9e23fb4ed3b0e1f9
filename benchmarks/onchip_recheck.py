"""On-chip re-verification of the round-2 relay-outage changes.

Runs the pending list from RESULTS_v5e.md "Pending on-chip
re-verification": compiled ring decode (column-tiled kernel + barrier
lowering on an n=1 mesh), the f32 color decode timing at 8192² (new
broadcast-reshape upsample forms), and the bench correctness gate
(round_half_away compare form + fast rint narrowing).

Run from the repo root via stdin (CLAUDE.md):  python - < benchmarks/onchip_recheck.py
Prints one JSON line per check; exits nonzero on any failure.
"""

import json
import sys

checks = []


def record(name, **kw):
    row = {"check": name, **kw}
    checks.append(row)
    print(json.dumps(row))


def main() -> int:
    import pathlib

    import jax

    cache = pathlib.Path.home() / ".cache" / "jax-tpudct"
    cache.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))

    import jax.numpy as jnp
    import numpy as np

    assert jax.default_backend() == "tpu", jax.default_backend()

    # ---- 1. correctness gate on the compiled kernels ------------------------
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    from bench import correctness_gate

    from tpudct import CodecConfig, get_pipeline

    gate = correctness_gate(get_pipeline("hp"), CodecConfig(), size=512)
    record("correctness_gate", **gate)

    # ---- 2. compiled ring decode on an n=1 mesh (barrier + tiled kernel) ----
    from tpudct.kernels.hp_pallas import hp_decode_u8, hp_encode_u8
    from tpudct.parallel.mesh import band_mesh
    from tpudct.parallel.ring import ring_decode_gather

    img = np.random.default_rng(3).integers(0, 256, (512, 512), dtype=np.uint8)
    coeffs = hp_encode_u8(jnp.asarray(img))
    mesh = band_mesh(n_devices=1)
    crep, rec = ring_decode_gather(
        jax.device_put(coeffs, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("band", None))),
        mesh,
    )
    ref = hp_decode_u8(coeffs)
    ok_c = bool((np.asarray(crep) == np.asarray(coeffs)).all())
    ok_r = bool((np.asarray(rec) == np.asarray(ref)).all())
    record("ring_decode_compiled_n1", coeffs_equal=ok_c, recon_equal=ok_r)
    if not (ok_c and ok_r):
        return 1

    # a band too tall for even 128-wide tiles must refuse, not mis-compile
    try:
        ring_decode_gather(
            jax.device_put(jnp.zeros((8192, 8192), jnp.int8),
                           jax.sharding.NamedSharding(
                               mesh, jax.sharding.PartitionSpec("band", None))),
            mesh,
        )
        record("ring_vmem_gate", raised=False)
        return 1
    except ValueError as e:
        record("ring_vmem_gate", raised=True, msg=str(e)[:80])

    # ---- 3. f32 color path at 8192² (new upsample lowering) -----------------
    # device_time_ms chains op(op(x)), so every timed op must be
    # type-preserving: time the FULL f32 color roundtrip (encode+decode,
    # which contains the two upsample_420 calls) chained via an f32 view
    # of the u8 reconstruction, and the down∘up resample pair in isolation.
    from tpudct.models.color import roundtrip_color
    from tpudct.utils.timing import device_time_ms

    p = get_pipeline("hp")
    cfg = CodecConfig()
    rgb = jnp.asarray(
        np.random.default_rng(5).integers(0, 256, (8192, 8192, 3))
        .astype(np.float32)
    )
    ms = device_time_ms(
        lambda v: roundtrip_color(p, v, cfg)[2].astype(jnp.float32),
        rgb, k_pair=(4, 20), reps=3,
    )
    record("f32_color_roundtrip_8192", ms=round(ms, 3),
           note="contains 2x upsample_420; was ~342 ms PER upsample as jnp.repeat")

    from tpudct.utils.color import downsample_420, upsample_420

    plane = jnp.asarray(
        np.random.default_rng(6).integers(0, 256, (8192, 8192))
        .astype(np.float32)
    )
    ms_pair = device_time_ms(
        lambda v: upsample_420(downsample_420(v), 8192, 8192),
        plane, k_pair=(8, 72), reps=3,
    )
    record("resample_420_pair_8192", ms=round(ms_pair, 3),
           note="down+up pair per plane; jnp.repeat upsample alone was ~342 ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
