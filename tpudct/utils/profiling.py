"""Device-time profiling (the deep-dive companion to utils.timing).

The reference's only instrumentation is cudaEvent pairs printed per phase
(SURVEY.md §5).  Here, wall-clock phase timing lives in utils.timing; this
module adds the per-kernel device timeline via jax.profiler for when the
slope numbers need explaining (e.g. attributing the 8192^2 pass between
DMA and MXU passes).  Traces open in TensorBoard / Perfetto.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace around a block:

        with profiling.trace("/tmp/tpudct-trace"):
            roundtrip(x)[1].block_until_ready()
    """
    with jax.profiler.trace(str(log_dir)):
        yield


def annotate(name: str):
    """Named region that shows up on the trace timeline."""
    return jax.profiler.TraceAnnotation(name)
