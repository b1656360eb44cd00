"""Tracing / profiling / debugging hooks.

The reference's observability is wall-clock meters + CUDA max-memory
(reference: utils/misc.py:134-178) and torch autograd anomaly detection
(reference: engine/train.py:41). TPU-native equivalents:

  * `trace(log_dir)` — context manager around jax.profiler for device traces
    viewable in TensorBoard/XProf;
  * `annotate(name)` — TraceAnnotation for named regions inside steps;
  * `enable_anomaly_detection()` — jax_debug_nans: any NaN produced under jit
    raises at the producing op (the --anomaly_detection flag);
  * `device_memory_stats()` — per-device HBM usage (max_memory_allocated
    analogue).
"""

from __future__ import annotations

import contextlib
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a device trace into log_dir (no-op when log_dir is None)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region annotation that shows up in profiler traces."""
    return jax.profiler.TraceAnnotation(name)


def enable_anomaly_detection(enable: bool = True) -> None:
    """NaN-raising mode (--anomaly_detection; reference: engine/train.py:41)."""
    jax.config.update("jax_debug_nans", enable)


def device_memory_stats() -> Dict[str, Dict[str, int]]:
    """bytes_in_use / peak per device where the backend reports them."""
    out: Dict[str, Dict[str, int]] = {}
    for d in jax.local_devices():
        try:
            stats = d.memory_stats()
        except (AttributeError, jax.errors.JaxRuntimeError):
            stats = None
        if stats:
            out[str(d)] = {
                "bytes_in_use": int(stats.get("bytes_in_use", 0)),
                "peak_bytes_in_use": int(stats.get("peak_bytes_in_use", 0)),
            }
    return out
