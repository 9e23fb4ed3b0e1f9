"""Pallas ring all-gather over ICI — explicit-collective band reassembly.

The default reassembly path is XLA's `all_gather` (sharding.gather_recon),
which is what production should use.  This module is the hand-rolled
equivalent: a uni-directional ring of `make_async_remote_copy` RDMA hops
(the TPU-native analog of what NCCL ring algorithms do on the reference's
hardware family — the reference itself has no multi-device communication
at all, SURVEY.md §2 row 20).  It exists to demonstrate and test the raw
inter-chip DMA path (SURVEY.md §7 M6 optional item), and as the substrate
for future compute/communication overlap (stream the next band's DCT while
the previous band's reconstruction rides the ring).

Pattern after the public JAX Pallas distributed guide
(docs.jax.dev/en/latest/pallas/tpu/distributed).
"""

from __future__ import annotations

import functools

import jax
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpudct.parallel.mesh import BAND_AXIS, band_spec


def _neighbor_barrier(my_id, num_devices: int):
    """Barrier with both ring neighbors before the first RDMA: without it a
    fast device could push into a neighbor that hasn't entered the kernel
    yet (the race the collective_id/barrier pairing prevents).  Callers skip
    it in interpret mode: get_barrier_semaphore has no interpret lowering
    (and interpret execution is synchronous anyway).  At num_devices == 1
    both neighbors are self — the lowering still compiles and executes,
    which is exactly what the single-chip hardware smoke test exercises."""
    barrier = pltpu.get_barrier_semaphore()
    left = lax.rem(my_id - 1 + num_devices, num_devices)
    right = lax.rem(my_id + 1, num_devices)
    pltpu.semaphore_signal(
        barrier, inc=1, device_id=left, device_id_type=pltpu.DeviceIdType.LOGICAL
    )
    pltpu.semaphore_signal(
        barrier, inc=1, device_id=right, device_id_type=pltpu.DeviceIdType.LOGICAL
    )
    pltpu.semaphore_wait(barrier, 2)


def _ring_all_gather_kernel(
    band_ref, out_ref, local_sem, send_sem, recv_sem,
    *, num_devices: int, band_rows: int, use_barrier: bool
):
    """Each device owns one band; after num_devices-1 hops every device
    holds the full image, bands placed at their true row offsets."""
    my_id = lax.axis_index(BAND_AXIS)

    # Place our own band.  Both refs live in ANY/HBM, so this must be a DMA,
    # not a direct vector store (Mosaic cannot address HBM refs directly).
    local = pltpu.make_async_copy(
        band_ref, out_ref.at[pl.ds(my_id * band_rows, band_rows), :], local_sem
    )
    local.start()
    local.wait()

    if use_barrier:
        _neighbor_barrier(my_id, num_devices)

    def step(i, _):
        # At step i we forward the band that originated i hops to our left;
        # it currently sits in our output at its final position, so send
        # straight from there to the right neighbor's output slot.
        src_device = lax.rem(my_id - i + num_devices, num_devices)
        right = lax.rem(my_id + 1, num_devices)
        copy = pltpu.make_async_remote_copy(
            src_ref=out_ref.at[pl.ds(src_device * band_rows, band_rows), :],
            dst_ref=out_ref.at[pl.ds(src_device * band_rows, band_rows), :],
            send_sem=send_sem,
            recv_sem=recv_sem,
            device_id=right,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        copy.start()
        copy.wait()
        return 0

    lax.fori_loop(0, num_devices - 1, step, 0)


@functools.lru_cache(maxsize=32)
def _ring_fn(mesh, h: int, w: int, dtype, interpret: bool):
    """Build + jit the ring collective once per (mesh, shape, dtype) — a
    fresh closure per call would re-trace and recompile the Pallas kernel
    (20-40 s first compile) on every invocation."""
    n = mesh.shape[BAND_AXIS]
    band_rows = h // n

    kernel = functools.partial(
        _ring_all_gather_kernel, num_devices=n, band_rows=band_rows,
        use_barrier=not interpret,
    )
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((h, w), dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA,  # local placement
            pltpu.SemaphoreType.DMA,  # ring send
            pltpu.SemaphoreType.DMA,  # ring recv
        ],
        compiler_params=pltpu.CompilerParams(collective_id=7),
        interpret=interpret,
    )
    fn = jax.shard_map(
        call,
        mesh=mesh,
        in_specs=band_spec(),
        out_specs=jax.sharding.PartitionSpec(),
        check_vma=False,
    )
    return jax.jit(fn)


def ring_all_gather(x_sharded, mesh, interpret: bool = False):
    """Band-sharded (H, W) array -> fully replicated (H, W) on every device,
    gathered hop-by-hop over the ring (num_devices-1 RDMA steps)."""
    h, w = x_sharded.shape
    return _ring_fn(mesh, h, w, x_sharded.dtype, interpret)(x_sharded)


# ---- compute/communication overlap: decode-while-gathering -------------------


def _ring_decode_kernel(
    coeff_ref, qdd_ref, ts_ref, wts_ref, crep_ref, out_ref,
    band_vmem, res_vmem, local_sem, send_sem, recv_sem, out_sem,
    *, num_devices: int, band_rows: int, tile_cols: int, use_barrier: bool
):
    """Ring all-gather of int8 coefficient bands with the DECODE of each
    already-held band overlapping the in-flight RDMA hop.

    Schedule per device (the overlap promised at the top of this module):
      hop i: START forwarding band (my_id - i) to the right neighbor,
             THEN decode that same band (dequant + inverse + u8, pure
             MXU/VPU work on data already local) while the DMA flies,
             THEN wait the hop.  After n-1 hops one band remains undecoded
             (the one received last) — decode it tail-end.
    Communication cost is identical to :func:`ring_all_gather` on the same
    payload; the decode rides for free underneath it."""
    import jax.numpy as jnp

    from tpudct.kernels.hp_pallas import _inv_tile_bf, _to_u8

    my_id = lax.axis_index(BAND_AXIS)

    def slot(d):
        return pl.ds(d * band_rows, band_rows)

    # Place our own coefficient band into the replicated coefficient output.
    local = pltpu.make_async_copy(coeff_ref, crep_ref.at[slot(my_id), :], local_sem)
    local.start()
    local.wait()

    if use_barrier:
        _neighbor_barrier(my_id, num_devices)

    n_col_tiles = out_ref.shape[1] // tile_cols

    def decode_band(src):
        """crep[src band] (HBM, i8) -> out[src band] (HBM, u8), in
        column tiles so the VMEM working set stays bounded regardless of
        band size (a whole 8192-wide band's f32 intermediates alone
        would blow the 16 MiB scoped-VMEM budget)."""

        def col_tile(j, _):
            cs = pl.ds(j * tile_cols, tile_cols)
            fetch = pltpu.make_async_copy(
                crep_ref.at[slot(src), cs], band_vmem, local_sem
            )
            fetch.start()
            fetch.wait()
            # i8 -> f32 via i32 (matches the hp kernels' int path; qdd is
            # LANE-periodic so any 128-multiple column tile reuses it)
            c = band_vmem[:].astype(jnp.int32).astype(jnp.float32)
            res_vmem[:] = _to_u8(
                _inv_tile_bf(c, qdd_ref[:], ts_ref[:], wts_ref[:])
            )
            put = pltpu.make_async_copy(
                res_vmem, out_ref.at[slot(src), cs], out_sem
            )
            put.start()
            put.wait()
            return 0

        lax.fori_loop(0, n_col_tiles, col_tile, 0)

    def step(i, _):
        src = lax.rem(my_id - i + num_devices, num_devices)
        right = lax.rem(my_id + 1, num_devices)
        copy = pltpu.make_async_remote_copy(
            src_ref=crep_ref.at[slot(src), :],
            dst_ref=crep_ref.at[slot(src), :],
            send_sem=send_sem,
            recv_sem=recv_sem,
            device_id=right,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        copy.start()
        decode_band(src)  # compute overlaps the in-flight RDMA
        copy.wait()
        return 0

    lax.fori_loop(0, num_devices - 1, step, 0)
    # The band received on the final hop is the only one not yet decoded.
    decode_band(lax.rem(my_id + 1, num_devices))


@functools.lru_cache(maxsize=16)
def _ring_decode_builder(
    mesh, h: int, w: int, q_scale: float, transform: str, q_table: str,
    interpret: bool,
):
    import jax.numpy as jnp

    from tpudct.kernels.hp_pallas import _consts_bf

    n = mesh.shape[BAND_AXIS]
    band_rows = h // n
    # Compiled (Mosaic) lowering needs 32-row bands — the i8 staging tile
    # has the int8 sublane minimum, same constraint as every i8 hp kernel
    # (hp_pallas.supports_u8); interpret mode has no sublane constraints,
    # so the CPU-mesh dryrun can keep its tiny 8-row bands.
    row_align = 8 if interpret else 32
    if band_rows * n != h or band_rows % row_align or w % 128:
        raise ValueError(
            f"ring decode needs h split into {n} {row_align}-row-multiple "
            f"bands and w % 128 == 0, got {h}x{w}"
        )
    # Column-tile size: largest 128-multiple divisor of w keeping the
    # per-tile decode working set (~12 B/elem of f32/bf16 intermediates)
    # inside the scoped-VMEM budget.
    max_elems = 512 * 1024
    cands = [
        d for d in range(128, w + 1, 128)
        if w % d == 0 and band_rows * d <= max_elems
    ]
    if not cands:
        raise ValueError(
            f"ring decode band ({band_rows}x{w}) too tall for VMEM even at "
            "128-wide column tiles; shard over more devices or gather with "
            "ring_all_gather and decode via hp_decode_u8"
        )
    tile_cols = max(cands)
    qdd, ts, wts = _consts_bf(band_rows, q_scale, transform, q_table)
    kernel = functools.partial(
        _ring_decode_kernel, num_devices=n, band_rows=band_rows,
        tile_cols=tile_cols, use_barrier=not interpret,
    )
    call = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((h, w), jnp.int8),   # replicated coefficients
            jax.ShapeDtypeStruct((h, w), jnp.uint8),  # replicated reconstruction
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((band_rows, tile_cols), jnp.int8),
            pltpu.VMEM((band_rows, tile_cols), jnp.uint8),
            pltpu.SemaphoreType.DMA,  # local placement / fetches
            pltpu.SemaphoreType.DMA,  # ring send
            pltpu.SemaphoreType.DMA,  # ring recv
            pltpu.SemaphoreType.DMA,  # result put
        ],
        compiler_params=pltpu.CompilerParams(collective_id=8),
        interpret=interpret,
    )

    def wrapped(x):
        return call(x, jnp.asarray(qdd), jnp.asarray(ts), jnp.asarray(wts))

    fn = jax.shard_map(
        wrapped,
        mesh=mesh,
        in_specs=band_spec(),
        out_specs=(
            jax.sharding.PartitionSpec(),
            jax.sharding.PartitionSpec(),
        ),
        check_vma=False,
    )
    return jax.jit(fn)


def ring_decode_gather(coeffs_sharded, mesh, q_scale: float = 1.0,
                       transform: str = "haweel", q_table: str = "luma",
                       interpret: bool = False):
    """Band-sharded (H, W) int8 coefficients -> (replicated int8
    coefficients, replicated uint8 reconstruction), with each device's
    decode work hidden under the ring hops.

    The butterfly decode tier (kernels/hp_pallas._inv_tile_bf) runs
    in-kernel, so results are bitwise identical to hp_decode_u8 on the
    gathered map."""
    h, w = coeffs_sharded.shape
    return _ring_decode_builder(
        mesh, h, w, float(q_scale), transform, q_table, interpret
    )(coeffs_sharded)


# ---- color overlap: 4:2:0 decode + fused merge hidden under the hops --------
#
# The gray ring above hides one plane's decode under its gather; the color
# codec is where per-band compute is actually interesting (two inverse-
# transform passes + chroma upsample + the BT.601 rotation per band), so
# this is the variant that completes the overlap story (VERDICT r4 #7).
# Payload per device: its luma coefficient band (band_rows, W) int8 plus
# the band's CHROMA PACK (band_rows, W/2) int8 — cb band rows stacked on
# cr band rows, exactly the "chroma planes stacked through one codec
# launch" layout the standard color path uses (models/color.py
# decode_color_u8), so the stacked in-kernel decode is the same math.


def chroma_band_pack(cb, cr, n_bands: int):
    """(H/2, W/2) cb + cr planes -> the (H, W/2) per-band stacked pack the
    color ring shards: rows [d·br, d·br + br/2) = cb band d, the lower
    half = cr band d (br = luma band rows = 2·chroma band rows)."""
    import numpy as np

    ch = cb.shape[0]
    if cb.shape != cr.shape or ch % n_bands:
        raise ValueError(f"chroma planes {cb.shape}/{cr.shape} don't split into {n_bands} bands")
    half = ch // n_bands
    return np.concatenate(
        [np.concatenate([cb[d * half : (d + 1) * half],
                         cr[d * half : (d + 1) * half]], axis=0)
         for d in range(n_bands)],
        axis=0,
    )


def _ring_decode_color_kernel(
    y_ref, c_ref, qddl_ref, qddc_ref, ts_ref, wts_ref, ur_ref,
    yrep_ref, crep_ref, rgb_ref,
    ycoef_vmem, yu8_vmem, ccoef_vmem, cu8_vmem, rgb_vmem,
    local_sem, ysend_sem, yrecv_sem, csend_sem, crecv_sem, out_sem,
    *, num_devices: int, band_rows: int, tile_cols: int, use_barrier: bool
):
    """Ring all-gather of int8 luma + chroma-pack coefficient bands with
    each already-held band's FULL color reconstruction (two butterfly
    decodes + the fused 4:2:0 merge) overlapping the in-flight RDMA pair.

    Value chains are verbatim from the standard path — luma/chroma decode
    via kernels.hp_pallas._inv_tile_bf + _to_u8 (the butterfly tier
    hp_decode_u8 runs), merge via kernels.color_pallas._k_merge's exact
    ops (-128 shift at half res, one bf16 replication dot, sublane
    broadcast-reshape, _to_u8_trunc) — so the RGB output is bitwise
    identical to decode_color_u8 of the gathered planes."""
    import jax.numpy as jnp

    from tpudct.kernels.color_pallas import (
        _f32, _rgb_from_shifted, _to_u8_trunc,
    )
    from tpudct.kernels.hp_pallas import _inv_tile_bf, _to_u8

    my_id = lax.axis_index(BAND_AXIS)
    half_rows = band_rows // 2
    half_cols = tile_cols // 2

    def slot(d):
        return pl.ds(d * band_rows, band_rows)

    ly = pltpu.make_async_copy(y_ref, yrep_ref.at[slot(my_id), :], local_sem)
    ly.start()
    ly.wait()
    lc = pltpu.make_async_copy(c_ref, crep_ref.at[slot(my_id), :], local_sem)
    lc.start()
    lc.wait()

    if use_barrier:
        _neighbor_barrier(my_id, num_devices)

    n_col_tiles = rgb_ref.shape[2] // tile_cols
    ur_bf = ur_ref[:].astype(jnp.bfloat16)

    def decode_band(src):
        """One band's luma + chroma decode + merge, in column tiles so the
        VMEM working set stays bounded regardless of band size."""

        def col_tile(j, _):
            cs = pl.ds(j * tile_cols, tile_cols)
            cs2 = pl.ds(j * half_cols, half_cols)
            fy = pltpu.make_async_copy(
                yrep_ref.at[slot(src), cs], ycoef_vmem, local_sem
            )
            fy.start()
            fy.wait()
            yv = ycoef_vmem[:].astype(jnp.int32).astype(jnp.float32)
            yu8_vmem[:] = _to_u8(
                _inv_tile_bf(yv, qddl_ref[:], ts_ref[:], wts_ref[:])
            )
            fc = pltpu.make_async_copy(
                crep_ref.at[slot(src), cs2], ccoef_vmem, local_sem
            )
            fc.start()
            fc.wait()
            # stacked cb|cr decode — one pass, the seam is block-aligned
            cv = ccoef_vmem[:].astype(jnp.int32).astype(jnp.float32)
            cu8_vmem[:] = _to_u8(
                _inv_tile_bf(cv, qddc_ref[:], ts_ref[:], wts_ref[:])
            )

            def up_shifted(c_u8):
                c = (c_u8.astype(jnp.int32) - 128).astype(jnp.bfloat16)
                wide = jax.lax.dot(c, ur_bf, preferred_element_type=jnp.float32)
                h2, wv = wide.shape
                return jnp.broadcast_to(
                    wide[:, None, :], (h2, 2, wv)
                ).reshape(2 * h2, wv)

            r, g, b = _rgb_from_shifted(
                _f32(yu8_vmem[:]),
                up_shifted(cu8_vmem[:half_rows]),
                up_shifted(cu8_vmem[half_rows:]),
            )
            rgb_vmem[0] = _to_u8_trunc(r)
            rgb_vmem[1] = _to_u8_trunc(g)
            rgb_vmem[2] = _to_u8_trunc(b)
            put = pltpu.make_async_copy(
                rgb_vmem, rgb_ref.at[:, slot(src), cs], out_sem
            )
            put.start()
            put.wait()
            return 0

        lax.fori_loop(0, n_col_tiles, col_tile, 0)

    def step(i, _):
        src = lax.rem(my_id - i + num_devices, num_devices)
        right = lax.rem(my_id + 1, num_devices)
        ycopy = pltpu.make_async_remote_copy(
            src_ref=yrep_ref.at[slot(src), :],
            dst_ref=yrep_ref.at[slot(src), :],
            send_sem=ysend_sem, recv_sem=yrecv_sem,
            device_id=right, device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        ccopy = pltpu.make_async_remote_copy(
            src_ref=crep_ref.at[slot(src), :],
            dst_ref=crep_ref.at[slot(src), :],
            send_sem=csend_sem, recv_sem=crecv_sem,
            device_id=right, device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        ycopy.start()
        ccopy.start()
        decode_band(src)  # both planes' decode + merge under the RDMA pair
        ycopy.wait()
        ccopy.wait()
        return 0

    lax.fori_loop(0, num_devices - 1, step, 0)
    decode_band(lax.rem(my_id + 1, num_devices))


@functools.lru_cache(maxsize=16)
def _ring_decode_color_builder(
    mesh, h: int, w: int, q_scale: float, transform: str, interpret: bool
):
    import jax.numpy as jnp

    from tpudct.kernels.color_pallas import _up_mat
    from tpudct.kernels.hp_pallas import _consts_bf

    n = mesh.shape[BAND_AXIS]
    band_rows = h // n
    # Compiled lowering: 32-row i8 staging minimum (like the gray ring)
    # AND an 8-aligned cb/cr seam at band_rows/2 (32 covers it); interpret
    # mode only needs the seam alignment.
    row_align = 16 if interpret else 32
    if band_rows * n != h or band_rows % row_align or w % 256:
        raise ValueError(
            f"color ring decode needs h split into {n} {row_align}-row-"
            f"multiple bands and w % 256 == 0, got {h}x{w}"
        )
    max_elems = 512 * 1024
    cands = [
        d for d in range(256, w + 1, 256)
        if w % d == 0 and band_rows * d <= max_elems
    ]
    if not cands:
        raise ValueError(
            f"color ring band ({band_rows}x{w}) too tall for VMEM even at "
            "256-wide column tiles; shard over more devices"
        )
    tile_cols = max(cands)
    qddl, ts, wts = _consts_bf(band_rows, q_scale, transform, "luma")
    qddc, _ts2, _w2 = _consts_bf(band_rows, q_scale, transform, "chroma")
    urm = _up_mat(tile_cols)
    kernel = functools.partial(
        _ring_decode_color_kernel, num_devices=n, band_rows=band_rows,
        tile_cols=tile_cols, use_barrier=not interpret,
    )
    call = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((h, w), jnp.int8),        # luma coeffs
            jax.ShapeDtypeStruct((h, w // 2), jnp.int8),   # chroma pack
            jax.ShapeDtypeStruct((3, h, w), jnp.uint8),    # RGB
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((band_rows, tile_cols), jnp.int8),
            pltpu.VMEM((band_rows, tile_cols), jnp.uint8),
            pltpu.VMEM((band_rows, tile_cols // 2), jnp.int8),
            pltpu.VMEM((band_rows, tile_cols // 2), jnp.uint8),
            pltpu.VMEM((3, band_rows, tile_cols), jnp.uint8),
            pltpu.SemaphoreType.DMA,  # local placement / fetches
            pltpu.SemaphoreType.DMA,  # luma ring send
            pltpu.SemaphoreType.DMA,  # luma ring recv
            pltpu.SemaphoreType.DMA,  # chroma ring send
            pltpu.SemaphoreType.DMA,  # chroma ring recv
            pltpu.SemaphoreType.DMA,  # rgb put
        ],
        compiler_params=pltpu.CompilerParams(collective_id=9),
        interpret=interpret,
    )

    def wrapped(y, c):
        return call(
            y, c, jnp.asarray(qddl), jnp.asarray(qddc), jnp.asarray(ts),
            jnp.asarray(wts), jnp.asarray(urm),
        )

    fn = jax.shard_map(
        wrapped,
        mesh=mesh,
        in_specs=(band_spec(), band_spec()),
        out_specs=(
            jax.sharding.PartitionSpec(),
            jax.sharding.PartitionSpec(),
            jax.sharding.PartitionSpec(),
        ),
        check_vma=False,
    )
    return jax.jit(fn)


def ring_decode_color_gather(
    y_sharded, cpack_sharded, mesh, q_scale: float = 1.0,
    transform: str = "haweel", interpret: bool = False,
):
    """Band-sharded int8 luma (H, W) + chroma-pack (H, W/2) coefficient
    planes -> (replicated luma coeffs, replicated chroma pack, replicated
    (3, H, W) uint8 RGB), with every band's two butterfly decodes AND the
    fused 4:2:0 merge hidden under the ring hops.

    Build the chroma pack with :func:`chroma_band_pack`.  Bitwise
    identical to decode_color_u8 of the gathered planes (the kernel runs
    the same value chains)."""
    h, w = y_sharded.shape
    if cpack_sharded.shape != (h, w // 2):
        raise ValueError(
            f"chroma pack must be ({h}, {w // 2}) for a ({h}, {w}) luma "
            f"map, got {cpack_sharded.shape}"
        )
    return _ring_decode_color_builder(
        mesh, h, w, float(q_scale), transform, interpret
    )(y_sharded, cpack_sharded)
