from fava_tpu.utils._exceptions import (
    InvalidAnalysisError,
    InvalidMeshError,
    NotCallableError,
)
from fava_tpu.utils._types import HID_T, NP_T
from fava_tpu.utils.interrupt import FAVAInterruptHandler, InterruptHandler
from fava_tpu.utils.precision import (
    accum_dtype,
    asdevice,
    complex_dtype,
    compute_dtype,
    set_compute_dtype,
    to_device,
)
from fava_tpu.utils.cache import enable_compilation_cache
from fava_tpu.utils.logging_config import configure as configure_logging
from fava_tpu.utils.timing import reset_timings, timer, timings, trace

__all__ = [
    "HID_T",
    "NP_T",
    "InterruptHandler",
    "FAVAInterruptHandler",
    "InvalidAnalysisError",
    "InvalidMeshError",
    "NotCallableError",
    "accum_dtype",
    "asdevice",
    "complex_dtype",
    "compute_dtype",
    "set_compute_dtype",
    "to_device",
    "timer",
    "timings",
    "trace",
    "reset_timings",
    "enable_compilation_cache",
    "configure_logging",
]
