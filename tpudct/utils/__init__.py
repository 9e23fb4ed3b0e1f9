"""Host-side utilities: image I/O, metrics, timing, serialization."""

from tpudct.utils.imageio import load_jpeg, save_jpeg, encode_jpeg_bytes, native_backend_available
from tpudct.utils.metrics import mse, psnr, peen, compression_factor, quality_report
from tpudct.utils.serialize import save_coefficients, load_coefficients
from tpudct.utils.timing import device_time_ms, PhaseTimer

__all__ = [
    "load_jpeg",
    "save_jpeg",
    "encode_jpeg_bytes",
    "native_backend_available",
    "mse",
    "psnr",
    "peen",
    "compression_factor",
    "quality_report",
    "save_coefficients",
    "load_coefficients",
    "device_time_ms",
    "PhaseTimer",
]
