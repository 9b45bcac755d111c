"""Shared utilities: JSON encoding, logging, profiling counters."""

from ipcgen_tpu.utils.json_utils import NumpyEncoder  # noqa: F401
from ipcgen_tpu.utils.profiling import RateCounter, Timer  # noqa: F401
