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

    if num_devices > 1 and use_barrier:
        # Barrier with both neighbors before the first RDMA: without it a
        # fast device could push into a neighbor that hasn't entered the
        # kernel yet (the race the collective_id/barrier pairing prevents).
        # Skipped in interpret mode: get_barrier_semaphore has no interpret
        # lowering (and interpret execution is synchronous anyway).
        barrier = pltpu.get_barrier_semaphore()
        left = lax.rem(my_id - 1 + num_devices, num_devices)
        right_n = lax.rem(my_id + 1, num_devices)
        pltpu.semaphore_signal(
            barrier, inc=1, device_id=left, device_id_type=pltpu.DeviceIdType.LOGICAL
        )
        pltpu.semaphore_signal(
            barrier, inc=1, device_id=right_n, device_id_type=pltpu.DeviceIdType.LOGICAL
        )
        pltpu.semaphore_wait(barrier, 2)

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
